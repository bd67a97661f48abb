package graft

import org.scalatest.funsuite.AnyFunSuite

/** Invariant tests for the round-10 statistics + sketch battery
  * (q197–q212). Cross-engine cell parity is the driver's DuckDB gate;
  * these pin the MATHEMATICAL guarantees the oracle can't express:
  * sketch error bounds, one-sided CMS overcount, statistic ranges, and
  * conservation laws (partition counts summing to totals).
  */
class StatsQueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) =
    SparkEntry.queries(name)(spark, dir).collect()

  test("q197 HLL: estimate within 3 standard errors of exact cardinality") {
    val rows = run("q197_hll_sketch")
    assert(rows.length == 2)
    rows.foreach { r =>
      val exact = r.getAs[Long]("n_exact").toDouble
      val est = r.getAs[Double]("hll_estimate")
      // m=256 → RSE ≈ 1.04/√256 = 6.5%; allow 3σ. Small cardinalities
      // sit in the linear-counting regime where the raw estimate reads
      // low — tolerate the documented raw-HLL bias there.
      if (exact > 256 * 2.5)
        assert(math.abs(est - exact) / exact < 0.20,
          s"raw HLL estimate $est too far from exact $exact")
      else {
        // linear-counting regime: the raw estimate saturates near α·m
        // by design; the client-side correction m·ln(m/V) from the
        // emitted v_empty column is what approximates the cardinality
        val v = r.getAs[Long]("v_empty").toDouble
        val lc = 256.0 * math.log(256.0 / v)
        assert(math.abs(lc - exact) / math.max(exact, 1.0) < 0.15,
          s"linear-counting estimate $lc too far from exact $exact")
      }
    }
  }

  test("q198 CMS: estimates are one-sided (est >= exact, overcount >= 0)") {
    val rows = run("q198_countmin_freq")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("cm_estimate") >= r.getAs[Long]("n_exact"))
      assert(r.getAs[Long]("overcount") >= 0L)
    }
  }

  test("q199 Mann-Whitney: U within [0, n0*n1] and tie term nonnegative") {
    run("q199_mannwhitney_u").foreach { r =>
      val n0 = r.getAs[Long]("n0"); val n1 = r.getAs[Long]("n1")
      val u2 = r.getAs[Long]("u0_x2")
      assert(u2 >= 0 && u2 <= 2 * n0 * n1,
        s"2U=$u2 outside [0, ${2 * n0 * n1}]")
      assert(r.getAs[Long]("tie_term") >= 0)
    }
  }

  test("q200 KS: D statistic in [0,1] and consistent with its numerator") {
    run("q200_ks_cohort").foreach { r =>
      val d = r.getAs[Double]("d_stat")
      assert(d >= 0.0 && d <= 1.0)
      val n0 = r.getAs[Long]("n0"); val n1 = r.getAs[Long]("n1")
      assert(math.abs(d - r.getAs[Long]("d_num").toDouble / (n0.toDouble * n1)) < 1e-12)
    }
  }

  test("q201 runs test: run count bounded by sign count") {
    val r = run("q201_runs_test").head
    val np = r.getAs[Long]("n_plus"); val nm = r.getAs[Long]("n_minus")
    val runs = r.getAs[Long]("n_runs")
    assert(runs >= 1 && runs <= np + nm)
  }

  test("q202 Theil-Sen: pair count is n(n-1)/2 over the daily frame") {
    val r = run("q202_theilsen_trend").head
    val nPairs = r.getAs[Long]("n_pairs")
    // reconstruct |days| from the quadratic: n_pairs = d(d-1)/2
    val d = ((1 + math.sqrt(1.0 + 8.0 * nPairs)) / 2).round
    assert(d * (d - 1) / 2 == nPairs, s"n_pairs=$nPairs not triangular")
    assert(!r.getAs[Double]("theilsen_slope_cents_per_day").isNaN)
  }

  test("q203 EWMA: smoothed value lies within the window's rev envelope") {
    val rows = run("q203_ewma_revenue")
    val revs = rows.map(r => (r.getAs[java.sql.Date]("day").toLocalDate,
      r.getAs[Long]("rev"), r.getAs[Double]("ewma_cents")))
    val byDay = revs.map(t => t._1 -> t._2).toMap
    revs.foreach { case (day, _, ewma) =>
      val window = (0 to 20).flatMap(a => byDay.get(day.minusDays(a)))
      assert(ewma >= window.min - 1e-6 && ewma <= window.max + 1e-6,
        s"$day: ewma $ewma outside [${window.min}, ${window.max}]")
    }
  }

  test("q204 dispersion: index positive, chi2 = (n-1)*index") {
    run("q204_poisson_dispersion").foreach { r =>
      val di = r.getAs[Double]("dispersion_index")
      val n = r.getAs[Long]("n_days")
      assert(di >= 0.0)
      assert(math.abs(r.getAs[Double]("chi2_stat") - (n - 1) * di) < 1e-6)
    }
  }

  test("q205 Cramér's V in [0,1]") {
    val r = run("q205_cramers_v").head
    val v = r.getAs[Double]("cramers_v")
    assert(v >= 0.0 && v <= 1.0)
  }

  test("q206 RFM: scores in 1..5 and customer counts conserve") {
    val rows = run("q206_rfm_segments")
    rows.foreach { r =>
      Seq("r_score", "f_score", "m_score").foreach { c =>
        val v = r.getAs[Long](c); assert(v >= 1 && v <= 5) }
    }
    val total = rows.map(_.getAs[Long]("n_customers")).sum
    val nCust = Tables.table(spark, dir, "orders")
      .select("o_custkey").distinct().count()
    assert(total == nCust)
  }

  test("q207 ABC: class revenue shares sum to 1 and A-head dominates") {
    val rows = run("q207_abc_parts")
    val shares = rows.map(r => r.getAs[String]("abc_class") ->
      r.getAs[Double]("rev_share")).toMap
    assert(math.abs(shares.values.sum - 1.0) < 1e-9)
    assert(shares.getOrElse("A", 0.0) >= shares.getOrElse("C", 0.0))
  }

  test("q208 audience overlap: jaccard in [0,1], intersection bounded") {
    run("q208_audience_overlap").foreach { r =>
      val j = r.getAs[Double]("jaccard")
      assert(j >= 0.0 && j <= 1.0)
      assert(r.getAs[Long]("n_common") <=
        math.min(r.getAs[Long]("n_a"), r.getAs[Long]("n_b")))
    }
  }

  test("q209 small-order revenue: only small lineitems counted (spot re-derive)") {
    val rows = run("q209_small_order_revenue")
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("n_small_lineitems") > 0))
  }

  test("q210 returns-heavy: every returned share really exceeds 30%") {
    run("q210_returns_heavy_suppliers").foreach { r =>
      assert(r.getAs[Double]("return_share") > 0.3)
      assert(r.getAs[Long]("ret_q100") <= r.getAs[Long]("tot_q100"))
    }
  }

  test("q211 islands: user counts conserve over the histogram") {
    val total = run("q211_activity_islands")
      .map(_.getAs[Long]("n_users")).sum
    val nUsers = Tables.events(spark, dir)
      .select("user_id").distinct().count()
    assert(total == nUsers)
  }

  test("q213 Kendall tau-b within [-1,1]; pair accounting consistent") {
    val r = run("q213_kendall_tau").head
    val tau = r.getAs[Double]("kendall_tau_b")
    assert(tau >= -1.0 && tau <= 1.0)
    assert(r.getAs[Long]("n_conc") + r.getAs[Long]("n_disc") <=
      r.getAs[Long]("n_pairs"))
  }

  test("q214 Spearman rho within [-1,1]") {
    val rho = run("q214_spearman_rho").head.getAs[Double]("spearman_rho")
    assert(rho >= -1.0 && rho <= 1.0)
  }

  test("q215 Bollinger: every breakout really sits outside its band") {
    run("q215_bollinger_breakouts").foreach { r =>
      val usd = (r.getAs[Long]("rev") / 100L).toDouble
      val dir = r.getAs[String]("direction")
      if (dir == "UP") assert(usd > r.getAs[Double]("band_hi_usd"))
      else assert(usd < r.getAs[Double]("band_lo_usd"))
    }
  }

  test("q216 triplet margin: separated fraction in [0,1] per label") {
    val rows = run("q216_triplet_margin")
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val f = r.getAs[Double]("separated_frac")
      assert(f >= 0.0 && f <= 1.0)
    }
  }

  test("q217 equi-depth: row counts conserve and bounds nest") {
    val rows = run("q217_equidepth_histogram")
    val total = rows.map(_.getAs[Long]("n_rows")).sum
    val nLi = Tables.table(spark, dir, "lineitem").count()
    assert(total == nLi)
    rows.foreach(r =>
      assert(r.getAs[Long]("lo_cents") <= r.getAs[Long]("hi_cents")))
    // consecutive buckets do not overlap
    val sorted = rows.sortBy(_.getAs[Long]("bucket"))
    sorted.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("hi_cents") < b.getAs[Long]("lo_cents"))
      case _ =>
    }
  }

  test("q218 MCV: ranks 1..5 descending frequency within each column") {
    val rows = run("q218_mcv_stats")
    rows.groupBy(_.getAs[String]("column_name")).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getAs[Long]("mcv_rank"))
      byRank.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("freq") >= b.getAs[Long]("freq"))
        case _ =>
      }
    }
  }

  test("q219 z-order buckets conserve order counts") {
    val total = run("q219_zorder_audit").map(_.getAs[Long]("n_orders")).sum
    assert(total == Tables.table(spark, dir, "orders").count())
  }

  test("q220 Bloom: disjoint member/probe split and sane rates") {
    val r = run("q220_bloom_membership").head
    val nCust = Tables.table(spark, dir, "orders")
      .select("o_custkey").distinct().count()
    assert(r.getAs[Long]("n_members") + r.getAs[Long]("n_probes") == nCust)
    assert(r.getAs[Double]("observed_fpr") >= 0.0)
    val m = r.getAs[Double]("model_fpr")
    assert(m >= 0.0 && m <= 1.0)
  }

  test("q221 zone maps: scanned rows never exceed the table") {
    val nLi = Tables.table(spark, dir, "lineitem").count()
    run("q221_zone_map_skipping").foreach { r =>
      assert(r.getAs[Long]("rows_scanned") <= nLi)
      val f = r.getAs[Double]("skip_frac")
      assert(f >= 0.0 && f <= 1.0)
    }
  }

  test("q222 incremental merge equals the direct full aggregate") {
    import org.apache.spark.sql.functions._
    import graft.functions.CoreFunctions.money
    val got = run("q222_incremental_agg_merge")
      .map(r => (r.getAs[String]("l_returnflag"),
        r.getAs[String]("l_linestatus")) ->
        (r.getAs[Double]("sum_qty"), r.getAs[Long]("n_rows"))).toMap
    val direct = Tables.table(spark, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum(money(col("l_quantity"))).cast("double").as("q"),
        count(lit(1)).as("n")).collect()
    direct.foreach { r =>
      val k = (r.getAs[String]("l_returnflag"), r.getAs[String]("l_linestatus"))
      assert(got(k) == ((r.getAs[Double]("q"), r.getAs[Long]("n"))),
        s"merged aggregate diverges from direct at $k")
    }
  }

  test("q223 Mood: above/below counts conserve per type") {
    val perType = Tables.events(spark, dir)
      .groupBy("event_type").count().collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("count"))
      .toMap
    run("q223_mood_median").foreach { r =>
      val et = r.getAs[String]("event_type")
      assert(r.getAs[Long]("n_above") + r.getAs[Long]("n_at_or_below")
        == perType(et))
    }
  }

  test("q224 spread ratios positive and pooled-normalized") {
    val rows = run("q224_levene_spread")
    rows.foreach(r => assert(r.getAs[Double]("mad_cents") >= 0.0))
    // weighted mean of spread_vs_pooled must be 1 by construction
    val wsum = rows.map(r => r.getAs[Double]("spread_vs_pooled") *
      r.getAs[Long]("n")).sum
    val n = rows.map(_.getAs[Long]("n")).sum
    assert(math.abs(wsum / n - 1.0) < 1e-9)
  }

  test("q225 compaction bins conserve rows") {
    val total = run("q225_compaction_plan").map(_.getAs[Long]("bin_rows")).sum
    assert(total == Tables.table(spark, dir, "lineitem").count())
  }

  test("q226 erasure audit: cascade counts positive for the top-10") {
    val rows = run("q226_erasure_audit")
    assert(rows.length == 10)
    rows.foreach(r => assert(r.getAs[Long]("n_lineitems") > 0))
  }

  test("q227 session count is monotone nonincreasing in the gap limit") {
    val rows = run("q227_session_gap_sensitivity")
      .sortBy(_.getAs[Long]("gap_limit_s"))
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("n_sessions") >= b.getAs[Long]("n_sessions"),
          "a larger inactivity gap can only merge sessions")
      case _ =>
    }
  }

  test("q228 FK conformance: coverage within [0,1], child counts exact") {
    val rows = run("q228_fk_conformance")
    assert(rows.length == 6)
    rows.foreach { r =>
      val c = r.getAs[Double]("coverage")
      assert(c >= 0.0 && c <= 1.0)
      assert(r.getAs[Long]("n_orphans") <= r.getAs[Long]("n_child"))
    }
  }

  test("q229 bottleneck suppliers: blocked counts positive, capped at 25 rows") {
    val rows = run("q229_bottleneck_suppliers")
    assert(rows.length <= 25 && rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("n_blocked_orders") > 0))
  }

  test("q230 idle rich customers: every kept customer really has no recent order") {
    // conservation: total n_customers equals an independent recount
    import org.apache.spark.sql.functions._
    val reported = run("q230_idle_rich_customers")
      .map(_.getAs[Long]("n_customers")).sum
    val cust = Tables.table(spark, dir, "customer")
    val bal = col("c_acctbal").cast("decimal(18,2)")
    val stats = cust.filter(bal > 0)
      .agg(sum(bal).as("s"), count(lit(1)).as("n")).collect().head
    val recent = Tables.table(spark, dir, "orders")
      .filter(col("o_orderdate").cast("date") >=
        lit("2000-01-01").cast("date")).select("o_custkey")
    val expect = cust
      .filter(bal * stats.getAs[Long]("n") > stats.getDecimal(0))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .count()
    assert(reported == expect)
  }

  test("q231 latency: min <= mean <= max per priority") {
    run("q231_fulfillment_latency").foreach { r =>
      val m = r.getAs[Double]("mean_days")
      assert(r.getAs[Long]("min_days") <= m && m <= r.getAs[Long]("max_days"))
    }
  }

  test("q232 HHI within [1/n, 1] per nation") {
    run("q232_supplier_hhi").foreach { r =>
      val h = r.getAs[Double]("hhi")
      val n = r.getAs[Long]("n_suppliers").toDouble
      assert(h >= 1.0 / n - 1e-12 && h <= 1.0 + 1e-12,
        s"HHI $h outside [1/$n, 1]")
    }
  }

  test("q233 growth accounting: new-user total and DAU composition conserve") {
    val rows = run("q233_growth_accounting")
    val nUsers = Tables.events(spark, dir)
      .select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n_new")).sum == nUsers,
      "every user is NEW exactly once")
    rows.foreach { r =>
      assert(r.getAs[Long]("dau") == r.getAs[Long]("n_new") +
        r.getAs[Long]("n_retained") + r.getAs[Long]("n_resurrected"))
    }
  }

  test("q234 stickiness: dau <= wau <= mau and ratios in (0,1]") {
    run("q234_stickiness").foreach { r =>
      val (d, w, m) = (r.getAs[Long]("dau"), r.getAs[Long]("wau"),
        r.getAs[Long]("mau"))
      assert(d <= w && w <= m)
      val dw = r.getAs[Double]("dau_over_wau")
      assert(dw > 0.0 && dw <= 1.0)
    }
  }

  test("q235 power-user curve conserves users and activity days") {
    val rows = run("q235_power_user_curve")
    val nUsers = Tables.events(spark, dir)
      .select("user_id").distinct().count()
    val nUserDays = Tables.events(spark, dir)
      .selectExpr("user_id", "cast(ts as date) as day")
      .distinct().count()
    assert(rows.map(_.getAs[Long]("n_users")).sum == nUsers)
    assert(rows.map(r => r.getAs[Long]("days_active") *
      r.getAs[Long]("n_users")).sum == nUserDays)
  }

  test("q236 cohort LTV nondecreasing within each cohort") {
    val rows = run("q236_cohort_ltv")
    rows.groupBy(_.getAs[Long]("cohort_week")).foreach { case (_, rs) =>
      val ordered = rs.sortBy(_.getAs[Long]("week_n"))
      ordered.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Double]("ltv_per_user") <=
            b.getAs[Double]("ltv_per_user") + 1e-9,
            "cumulative LTV cannot decrease")
        case _ =>
      }
      rs.foreach(r => assert(r.getAs[Long]("n_active") <=
        r.getAs[Long]("cohort_size")))
    }
  }

  test("q237 word-length profile: TTR in (0,1], token counts conserve") {
    val rows = run("q237_word_length_profile")
    rows.foreach { r =>
      val ttr = r.getAs[Double]("type_token_ratio")
      assert(ttr > 0.0 && ttr <= 1.0)
      assert(r.getAs[Double]("mean_len") <= r.getAs[Int]("max_len"))
    }
  }

  test("q238 template prefixes: shares in (0,1], descending frequencies") {
    val rows = run("q238_template_prefixes")
    assert(rows.length <= 20 && rows.nonEmpty)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("n_docs_with") >= b.getAs[Long]("n_docs_with"))
      case _ =>
    }
  }

  test("q239 char classes: fractions partition to exactly 1 per source") {
    run("q239_char_class_profile").foreach { r =>
      val total = r.getAs[Double]("alpha_frac") +
        r.getAs[Double]("digit_frac") + r.getAs[Double]("space_frac") +
        r.getAs[Double]("other_frac")
      assert(math.abs(total - 1.0) < 1e-9)
    }
  }

  test("q240 hapax: hapax <= vocab <= tokens") {
    run("q240_hapax_ratio").foreach { r =>
      assert(r.getAs[Long]("hapax") <= r.getAs[Long]("vocab"))
      assert(r.getAs[Long]("vocab") <= r.getAs[Long]("n_tokens"))
    }
  }

  test("q241 skyline: no frontier point dominates another") {
    val rows = run("q241_skyline_customers")
      .map(r => (r.getAs[Long]("bal100"), r.getAs[Long]("n_orders")))
    for (a <- rows; b <- rows if a != b)
      assert(!(a._1 >= b._1 && a._2 >= b._2),
        s"$a dominates $b — not a frontier")
  }

  test("q242 mutual information nonnegative (within fixed-point quantum)") {
    val mi = run("q242_mutual_information").head.getAs[Double]("mi_nats")
    assert(mi >= -1e-6, s"MI $mi negative beyond quantization")
  }

  test("q243 ANOVA: eta2 in [0,1] and SS components nonnegative") {
    val r = run("q243_anova_eta2").head
    val e = r.getAs[Double]("eta2")
    assert(e >= 0.0 && e <= 1.0)
    assert(r.getAs[Double]("ss_between") >= 0.0)
    assert(r.getAs[Double]("ss_within") >= -1e-6)
  }

  test("q244 duplicate invoices: pairs ordered, banded, within window") {
    run("q244_duplicate_invoices").foreach { r =>
      assert(r.getAs[Long]("k1") < r.getAs[Long]("k2"))
      assert(r.getAs[Long]("days_apart") <= 90)
    }
  }

  test("q245 price spread: ratios >= 1 and bounds ordered") {
    val rows = run("q245_price_spread_audit")
    assert(rows.length <= 20 && rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("min_unit") <= r.getAs[Long]("max_unit"))
      assert(r.getAs[Double]("spread_ratio") >= 1.0)
    }
  }

  test("q246 weighted median sits inside the per-priority value range") {
    import org.apache.spark.sql.functions._
    import graft.functions.CoreFunctions.money
    val bounds = Tables.table(spark, dir, "orders")
      .groupBy("o_orderpriority")
      .agg(min((money(col("o_totalprice")) * 100).cast("long")).as("lo"),
        max((money(col("o_totalprice")) * 100).cast("long")).as("hi"))
      .collect()
      .map(r => r.getAs[String]("o_orderpriority") ->
        (r.getAs[Long]("lo"), r.getAs[Long]("hi"))).toMap
    run("q246_weighted_median").foreach { r =>
      val (lo, hi) = bounds(r.getAs[String]("o_orderpriority"))
      val m = r.getAs[Long]("weighted_median_cents")
      assert(m >= lo && m <= hi)
    }
  }

  test("q247 changepoint: split strictly inside the series, SSB >= 0") {
    val r = run("q247_binary_segmentation").head
    assert(r.getAs[Double]("n_left") >= 1.0)
    assert(r.getAs[Double]("n_right") >= 1.0)
    assert(r.getAs[Double]("ss_between_q") >= 0.0)
  }

  test("q248 drawdown: trough never above its peak") {
    val r = run("q248_max_drawdown").head
    assert(r.getAs[Long]("trough_usd") <= r.getAs[Long]("peak_usd"))
    assert(r.getAs[Long]("drawdown_usd") ==
      r.getAs[Long]("peak_usd") - r.getAs[Long]("trough_usd"))
  }

  test("q249 attribution: both models conserve purchases and revenue") {
    val rows = run("q249_revenue_attribution")
    val byModel = rows.groupBy(_.getAs[String]("model"))
    assert(byModel.keySet == Set("first_touch", "last_touch"))
    val totals = byModel.view.mapValues(rs =>
      (rs.map(_.getAs[Long]("n_purchases")).sum,
        rs.map(_.getAs[Double]("revenue")).sum)).toMap
    val (nF, revF) = totals("first_touch")
    val (nL, revL) = totals("last_touch")
    assert(nF == nL, "both models credit every purchase exactly once")
    assert(math.abs(revF - revL) < 1e-6)
  }

  test("q250 backtest: wmape nonnegative, 28-day target window") {
    val r = run("q250_snaive_backtest").head
    assert(r.getAs[Long]("n_days") <= 28)
    assert(r.getAs[Double]("wmape") >= 0.0)
    assert(r.getAs[Double]("mae_usd") >= 0.0)
  }

  test("q251 ABC-XYZ: parts conserve vs the ABC classification") {
    val matrix = run("q251_abc_xyz")
    val abc = run("q207_abc_parts")
    val matrixParts = matrix.map(_.getAs[Long]("n_parts")).sum
    val abcParts = abc.map(_.getAs[Long]("n_parts")).sum
    assert(matrixParts == abcParts,
      "every classified part appears in exactly one matrix cell")
    matrix.foreach { r =>
      assert(Set("A", "B", "C")(r.getAs[String]("abc_class")))
      assert(Set("X", "Y", "Z")(r.getAs[String]("xyz_class")))
    }
  }

  test("q252 newsvendor: order-up-to levels monotone in service level") {
    val rows = run("q252_newsvendor_quantiles")
    rows.groupBy(_.getAs[Long]("l_partkey")).foreach { case (_, rs) =>
      val byLevel = rs.sortBy(_.getAs[Long]("service_pct"))
        .map(_.getAs[Long]("order_up_to_q100"))
      byLevel.sliding(2).foreach {
        case Array(a, b) => assert(a <= b,
          "a higher service level can only raise the stocking point")
        case _ =>
      }
    }
  }

  test("q253 elasticity: correlations within [-1,1] when defined") {
    run("q253_discount_elasticity").foreach { r =>
      if (!r.isNullAt(r.fieldIndex("discount_qty_corr"))) {
        val c = r.getAs[Double]("discount_qty_corr")
        assert(c >= -1.0 - 1e-12 && c <= 1.0 + 1e-12)
      }
    }
  }

  test("q254 repeat intervals: gap counts conserve vs orders minus first-timers") {
    val rows = run("q254_repeat_interval")
    val totalGaps = rows.map(_.getAs[Long]("n_gaps")).sum
    val orders = Tables.table(spark, dir, "orders")
    val expect = orders.count() -
      orders.select("o_custkey").distinct().count()
    assert(totalGaps == expect,
      "every order after a customer's first contributes one gap")
  }

  test("q255 quadrants: part counts conserve vs distinct demanded parts") {
    val total = run("q255_demand_quadrants")
      .map(_.getAs[Long]("n_parts")).sum
    val nParts = Tables.table(spark, dir, "lineitem")
      .select("l_partkey").distinct().count()
    assert(total == nParts)
  }

  test("q256 concurrency: peak at least 1 and bounded by sessions started") {
    run("q256_peak_concurrency").foreach { r =>
      val p = r.getAs[Long]("peak_concurrent")
      assert(p >= 1)
      assert(p <= r.getAs[Long]("n_sessions_started") + 1,
        "cannot exceed sessions opened that day (+1 midnight carry)")
    }
  }

  test("q257 HLL merge: max-merged registers equal the direct build") {
    val rows = run("q257_hll_union")
      .map(r => r.getAs[String]("path") ->
        (r.getAs[Long]("s_num"), r.getAs[Double]("hll_estimate"))).toMap
    assert(rows("merged") == rows("direct"),
      "mergeability must be exact, not approximate")
  }

  test("q258 CMS merge is exact: zero mismatched counters") {
    val r = run("q258_cms_union").head
    assert(r.getAs[Long]("n_mismatched") == 0L)
    assert(r.getAs[Long]("merged_checksum") ==
      r.getAs[Long]("direct_checksum"))
  }

  test("q259 Bloom OR-merge is exact: no asymmetric bits") {
    val r = run("q259_bloom_union").head
    assert(r.getAs[Boolean]("merge_exact"))
    assert(r.getAs[Long]("n_bits_set") > 0)
  }

  test("q260 HLL intersection: inclusion-exclusion arithmetic exact; error bounded out of the linear regime") {
    val r = run("q260_hll_intersection").head
    val est = r.getAs[Double]("est_intersection")
    val exact = r.getAs[Long]("exact_intersection").toDouble
    // the identity est_int = est_a + est_b − est_u holds exactly by
    // construction — pin it
    assert(est == r.getAs[Double]("est_a") + r.getAs[Double]("est_b") -
      r.getAs[Double]("est_union"))
    // accuracy claim only applies above the raw-HLL linear-counting
    // regime (q197's caveat): at test SF the audiences are tiny and
    // raw estimates saturate near α·m, so skip the envelope there
    if (exact > 256 * 2.5)
      assert(math.abs(est - exact) <= 0.30 * exact,
        s"intersection estimate $est too far from exact $exact")
  }

  test("q261 ESS: between 1 and n, efficiency in (0,1]") {
    run("q261_effective_sample_size").foreach { r =>
      val ess = r.getAs[Double]("ess")
      val n = r.getAs[Long]("n_docs").toDouble
      assert(ess >= 1.0 - 1e-9 && ess <= n + 1e-9)
      val eff = r.getAs[Double]("ess_efficiency")
      assert(eff > 0.0 && eff <= 1.0 + 1e-12)
    }
  }

  test("q212 JSD bounded by ln 2") {
    val r = run("q212_jsd_sources").head
    val jsd = r.getAs[Double]("jsd_nats")
    assert(jsd >= -1e-9 && jsd <= math.log(2.0) + 1e-9,
      s"JSD $jsd outside [0, ln2]")
  }
}
