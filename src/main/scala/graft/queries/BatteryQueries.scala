package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.CoreFunctions._

/** Operator-surface batteries beyond the core SURVEY list: pivot,
  * generator/positional explode, null-handling, date arithmetic, and
  * string/fuzzy-matching functions — each with a DuckDB twin so the whole
  * surface stays inside the correctness gate.
  */
object BatteryQueries {

  val all: Seq[EngineQuery] = Seq(

    // Q51 — pivot: per-user event counts spread across fixed type columns.
    EngineQuery("q51_pivot",
      (s, dir) => Tables.events(s, dir)
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("user_id"),
      Some("""SELECT user_id,
             |  CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
             |  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
             |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
             |  CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
             |  CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
             |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin)),

    // Q52 — positional generator: posexplode of tokens with 0-based pos.
    EngineQuery("q52_posexplode",
      (s, dir) => Tables.table(s, dir, "documents")
        .filter(col("doc_id") < 50)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
        .orderBy("doc_id", "pos"),
      Some("""SELECT doc_id, CAST(i AS INT) AS pos, toks[CAST(i + 1 AS INT)] AS tok
             |FROM (SELECT doc_id, string_split(text, ' ') AS toks
             |      FROM documents WHERE doc_id < 50) d,
             |  (SELECT unnest(range(0, 2048)) AS i) pos
             |WHERE i < len(toks)
             |ORDER BY doc_id, pos""".stripMargin)),

    // Q53 — null-handling battery over the outer-join shape: nullif,
    // coalesce chains, null-safe equality.
    EngineQuery("q53_null_battery",
      (s, dir) => {
        val c = Tables.table(s, dir, "customer")
        val o = Tables.table(s, dir, "orders")
        c.join(o, c("c_custkey") === o("o_custkey"), "left")
          .groupBy("c_custkey")
          .agg(count(col("o_orderkey")).as("n_orders"),
            max(col("o_totalprice")).as("max_price"))
          .select(col("c_custkey"),
            nullif(col("n_orders"), lit(0)).as("n_orders_or_null"),
            coalesce(col("max_price"), lit(-1.0)).as("max_price_filled"),
            (nullif(col("n_orders"), lit(0)) <=> lit(null))
              .as("has_no_orders"),
            when(col("n_orders") > 0, col("max_price"))
              .otherwise(lit(null)).isNull.as("null_check"))
          .orderBy("c_custkey")
      },
      Some("""SELECT c_custkey,
             |  nullif(n_orders, 0) AS n_orders_or_null,
             |  coalesce(max_price, -1.0) AS max_price_filled,
             |  (nullif(n_orders, 0) IS NOT DISTINCT FROM NULL) AS has_no_orders,
             |  (CASE WHEN n_orders > 0 THEN max_price ELSE NULL END) IS NULL AS null_check
             |FROM (
             |  SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
             |    MAX(o_totalprice) AS max_price
             |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
             |  GROUP BY 1) t
             |ORDER BY c_custkey""".stripMargin)),

    // Q54 — date arithmetic battery (engine-aligned semantics only:
    // dayofweek is normalized to Sunday=1 in both).
    EngineQuery("q54_date_battery",
      (s, dir) => Tables.table(s, dir, "orders")
        .filter(col("o_orderkey") <= 1000)
        .select(col("o_orderkey"),
          to_date(col("o_orderdate")).as("d"))
        .select(col("o_orderkey"), col("d"),
          date_add(col("d"), 30).as("plus_30d"),
          add_months(col("d"), 3).as("plus_3m"),
          last_day(col("d")).as("month_end"),
          quarter(col("d")).cast("long").as("q"),
          dayofweek(col("d")).cast("long").as("dow_sun1"),
          datediff(lit("2002-01-01").cast("date"), col("d")).cast("long")
            .as("days_to_2002"))
        .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey, d,
             |  d + 30 AS plus_30d,
             |  CAST(d + INTERVAL 3 MONTH AS DATE) AS plus_3m,
             |  last_day(d) AS month_end,
             |  CAST(quarter(d) AS BIGINT) AS q,
             |  CAST(dayofweek(d) + 1 AS BIGINT) AS dow_sun1,
             |  CAST(datediff('day', d, DATE '2002-01-01') AS BIGINT) AS days_to_2002
             |FROM (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d
             |      FROM orders WHERE o_orderkey <= 1000) t
             |ORDER BY o_orderkey""".stripMargin)),

    // Q56 — scalar + correlated subqueries through the SQL path
    // (Catalyst RewritePredicateSubquery/RewriteCorrelatedScalarSubquery):
    // customers spending above the global average, with their per-status
    // order count exceeding that status's average (correlated).
    EngineQuery("q56_subqueries",
      (s, dir) => {
        graft.Catalog.registerAll(s, dir)
        s.sql("""
          |WITH spend AS (
          |  SELECT o_custkey,
          |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
          |  FROM orders GROUP BY o_custkey)
          |SELECT c_custkey, s.total
          |FROM customer JOIN spend s ON s.o_custkey = c_custkey
          |WHERE s.total > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
          |                        / CAST(COUNT(DISTINCT o_custkey) AS DOUBLE)
          |                 FROM orders)
          |  AND EXISTS (SELECT 1 FROM orders o
          |              WHERE o.o_custkey = c_custkey AND o.o_orderstatus = 'F')
          |ORDER BY c_custkey""".stripMargin)
      },
      Some("""WITH spend AS (
             |  SELECT o_custkey,
             |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
             |  FROM orders GROUP BY o_custkey)
             |SELECT c_custkey, s.total
             |FROM customer JOIN spend s ON s.o_custkey = c_custkey
             |WHERE s.total > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             |                        / CAST(COUNT(DISTINCT o_custkey) AS DOUBLE)
             |                 FROM orders)
             |  AND EXISTS (SELECT 1 FROM orders o
             |              WHERE o.o_custkey = c_custkey AND o.o_orderstatus = 'F')
             |ORDER BY c_custkey""".stripMargin)),

    // Q72 — LATERAL correlated subquery (Catalyst's lateral-join /
    // DecorrelateInnerQuery surface, distinct from q56's predicate
    // subqueries): per nation, the top-2 customers by account balance.
    // Identical text runs in both engines; the tie-break on c_custkey
    // makes the LIMIT deterministic. Semantically the same answer as a
    // rank-window top-k (q15) — the point here is the SQL path: Spark
    // plans the decorrelated lateral as a ranked join, not a per-row
    // re-execution.
    EngineQuery("q72_lateral_topk",
      (s, dir) => {
        graft.Catalog.registerAll(s, dir)
        s.sql("""
          |SELECT n.n_name, c.c_custkey, c.c_acctbal
          |FROM nation n, LATERAL (
          |  SELECT c_custkey, c_acctbal FROM customer
          |  WHERE c_nationkey = n.n_nationkey
          |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) c
          |ORDER BY n.n_name, c.c_custkey""".stripMargin)
      },
      Some("""SELECT n.n_name, c.c_custkey, c.c_acctbal
             |FROM nation n, LATERAL (
             |  SELECT c_custkey, c_acctbal FROM customer
             |  WHERE c_nationkey = n.n_nationkey
             |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) c
             |ORDER BY n.n_name, c.c_custkey""".stripMargin)),

    // Q57 — multiset (bag) set operations: INTERSECT ALL / EXCEPT ALL
    // keep duplicate multiplicities.
    EngineQuery("q57_multiset_ops",
      (s, dir) => {
        val cn = Tables.table(s, dir, "customer")
          .select(col("c_nationkey").as("nk"))
        val sn = Tables.table(s, dir, "supplier")
          .select(col("s_nationkey").as("nk"))
        cn.intersectAll(sn).groupBy("nk").agg(count(lit(1)).as("n"))
          .withColumn("op", lit("intersect_all"))
          .unionByName(sn.exceptAll(cn).groupBy("nk")
            .agg(count(lit(1)).as("n")).withColumn("op", lit("except_all")))
          .orderBy("op", "nk")
      },
      Some("""SELECT nk, CAST(COUNT(*) AS BIGINT) AS n, 'intersect_all' AS op FROM (
             |  SELECT c_nationkey AS nk FROM customer
             |  INTERSECT ALL SELECT s_nationkey AS nk FROM supplier) a
             |GROUP BY nk
             |UNION ALL
             |SELECT nk, CAST(COUNT(*) AS BIGINT) AS n, 'except_all' AS op FROM (
             |  SELECT s_nationkey AS nk FROM supplier
             |  EXCEPT ALL SELECT c_nationkey AS nk FROM customer) b
             |GROUP BY nk
             |ORDER BY op, nk""".stripMargin)),

    // Q58 — approximate quantiles as a HASH-GATED rank-error report.
    // ONLY the mergeable GK sketch runs here — exact percentile buffers
    // every group value in one aggregation buffer, which is unbounded
    // memory at the 100 TB design point — so the gate checks the
    // sketch's RANK guarantee instead of its (engine-specific) value:
    // percentile_approx(accuracy=1000) promises rank error ≤ n/1000;
    // we assert the 10×-margin claim that the returned value's rank
    // interval [count(<v), count(≤v)] overlaps [q−0.01, q+0.01], in
    // pure BIGINT arithmetic, and the oracle asserts TRUE. Rank
    // counting is one broadcast of 12 scalars + one aggregate — no
    // per-group value buffering, unlike a value-space bound built from
    // exact percentiles. The q260/q261 approx-vs-exact pattern.
    EngineQuery("q58_approx_quantile",
      (s, dir) => {
        val li = Tables.table(s, dir, "lineitem")
          .select(col("l_returnflag"), col("l_extendedprice"))
        val approx = li.groupBy("l_returnflag")
          .agg(expr("percentile_approx(l_extendedprice, array(0.25, 0.5, 0.75), 1000)")
            .as("approx_quartiles"))
          .select(col("l_returnflag"), posexplode(col("approx_quartiles")))
          .select(col("l_returnflag"),
            ((col("pos") + 1L) * lit(250L)).as("qm"),
            col("col").as("approx_val"))
        val ranks = li.join(broadcast(approx), Seq("l_returnflag"))
          .groupBy(col("l_returnflag"), col("qm"))
          .agg(count(lit(1)).as("n_rows"),
            sum(when(col("l_extendedprice") <= col("approx_val"), 1L)
              .otherwise(0L)).as("cnt_le"),
            sum(when(col("l_extendedprice") < col("approx_val"), 1L)
              .otherwise(0L)).as("cnt_lt"))
        ranks.select(col("l_returnflag"),
            (col("qm").cast("double") / lit(1000.0)).as("quantile"),
            col("n_rows"),
            (col("cnt_le") * lit(1000L) >= (col("qm") - 10L) * col("n_rows") &&
             col("cnt_lt") * lit(1000L) <= (col("qm") + 10L) * col("n_rows"))
              .as("within_rank_bound"))
          .orderBy("l_returnflag", "quantile")
      },
      Some("""SELECT l_returnflag,
             |  CAST(q AS DOUBLE) / 1000.0 AS quantile,
             |  n_rows, TRUE AS within_rank_bound
             |FROM (SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_rows
             |      FROM lineitem GROUP BY 1)
             |CROSS JOIN (SELECT CAST(unnest([250, 500, 750]) AS BIGINT) AS q)
             |ORDER BY l_returnflag, quantile""".stripMargin)),

    // Q60 — as-of (point-in-time) join: each purchase gets the user's
    // most recent preceding click value. Composed as a union + ignore-
    // nulls window (one shuffle on the key; no range-join explosion).
    EngineQuery("q60_asof_join",
      (s, dir) => {
        import graft.operators.AsOfJoin
        val ev = Tables.events(s, dir)
        val purchases = ev.filter(col("event_type") === "purchase")
          .select("user_id", "ts", "event_id", "value")
        val clicks = ev.filter(col("event_type") === "click")
          .select("user_id", "ts", "event_id", "value")
        AsOfJoin.asOf(purchases, clicks, "user_id", "ts",
            valueCols = Seq("value"), tieBreak = Seq("event_id"))
          .select("event_id", "user_id", "ts", "value", "asof_value")
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id, ts, value, asof_value FROM (
             |  SELECT event_id, user_id, ts, side, value,
             |    last_value(rv IGNORE NULLS) OVER (PARTITION BY user_id
             |      ORDER BY ts, side, event_id
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_value
             |  FROM (
             |    SELECT event_id, user_id, ts, 1 AS side, value,
             |      CAST(NULL AS DOUBLE) AS rv
             |    FROM events WHERE event_type = 'purchase'
             |    UNION ALL
             |    SELECT event_id, user_id, ts, 0 AS side,
             |      CAST(NULL AS DOUBLE) AS value, value AS rv
             |    FROM events WHERE event_type = 'click') u) t
             |WHERE side = 1 ORDER BY event_id""".stripMargin)),

    // EXT — exact interpolated percentiles per group (the exact
    // counterpart of q58's sketch): Spark's `percentile` and DuckDB's
    // `quantile_cont` both implement the R-7 definition (index
    // p·(n-1), linear interpolation on the two neighbours), and the
    // computation sorts-then-interpolates — no cross-row float fold, so
    // it is order-independent without fixed-point tricks. One shuffle
    // on the group key; the per-group sort is bounded by the group.
    EngineQuery("q91_exact_percentiles",
      (s, dir) => Tables.table(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          round(expr("percentile(o_totalprice, 0.25)"), 6).as("p25"),
          round(expr("percentile(o_totalprice, 0.5)"), 6).as("p50"),
          round(expr("percentile(o_totalprice, 0.75)"), 6).as("p75"),
          round(expr("percentile(o_totalprice, 0.9)"), 6).as("p90"))
        .orderBy("o_orderstatus"),
      Some("""SELECT o_orderstatus, COUNT(*) AS n,
             |  round(quantile_cont(o_totalprice, 0.25), 6) AS p25,
             |  round(quantile_cont(o_totalprice, 0.5), 6) AS p50,
             |  round(quantile_cont(o_totalprice, 0.75), 6) AS p75,
             |  round(quantile_cont(o_totalprice, 0.9), 6) AS p90
             |FROM orders GROUP BY o_orderstatus
             |ORDER BY o_orderstatus""".stripMargin)),

    // EXT — z-score outlier detection: events whose value sits more
    // than 3 population standard deviations from their type's mean (the
    // data-quality sweep a pipeline runs before trusting a numeric
    // column). Mean/std derive from exact fixed-point sums (the q89
    // discipline — order-independent under shuffling), scaled ×1e3:
    // value ≤ ~1e3 means sv ≤ 1e6 and sv² ≤ 1e12, so Σsv² stays under
    // 2^63 up to ~9e6 rows per type (×1e6 scaling would overflow at
    // sf0.1 already). Beyond that, switch the second moment to a
    // two-pass sum-of-squared-deviations — deviations stay small so
    // the double fold is stable. The |types|-row stats frame
    // broadcasts back and the z-score is a scan-local expression.
    EngineQuery("q93_value_outliers",
      (s, dir) => {
        val sv = Tables.events(s, dir)
          .select(col("event_id"), col("event_type"),
            round(col("value") * 1e3).cast("long").as("sv"))
        val stats = sv.groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum(col("sv")).as("sc"),
            sum(col("sv") * col("sv")).as("ss"))
          .select(col("event_type"),
            (col("sc").cast("double") / col("n")).as("m"),
            sqrt(greatest(lit(0.0),
              col("ss").cast("double") / col("n")
                - pow(col("sc").cast("double") / col("n"), 2))).as("sd"))
        sv.join(broadcast(stats), Seq("event_type"))
          .withColumn("z", (col("sv").cast("double") - col("m")) / col("sd"))
          // sd = 0 (constant or single-row type) makes z NaN, and Spark
          // orders NaN above every number — guard like the streaming
          // twin (StreamingAnomaly) or every such row is an "outlier"
          .filter(col("sd") > 0.0 && abs(col("z")) > 3.0)
          .select(col("event_id"), col("event_type"),
            round(col("sv").cast("double") / 1e3, 6).as("value"),
            round(col("z"), 6).as("z"))
          .orderBy("event_id")
      },
      Some("""WITH sc AS (
             |  SELECT event_id, event_type,
             |    CAST(round(value * 1000.0) AS BIGINT) AS sv
             |  FROM events),
             |st AS (
             |  SELECT event_type,
             |    CAST(SUM(sv) AS DOUBLE) / COUNT(*) AS m,
             |    sqrt(greatest(0.0,
             |      CAST(SUM(sv * sv) AS DOUBLE) / COUNT(*)
             |        - pow(CAST(SUM(sv) AS DOUBLE) / COUNT(*), 2))) AS sd
             |  FROM sc GROUP BY 1)
             |SELECT event_id, sc.event_type,
             |  round(CAST(sv AS DOUBLE) / 1000.0, 6) AS value,
             |  round((CAST(sv AS DOUBLE) - m) / sd, 6) AS z
             |FROM sc JOIN st USING (event_type)
             |WHERE sd > 0.0 AND abs((CAST(sv AS DOUBLE) - m) / sd) > 3.0
             |ORDER BY event_id""".stripMargin)),

    // Q55 — string battery incl. fuzzy matching (levenshtein).
    EngineQuery("q55_string_battery",
      (s, dir) => Tables.table(s, dir, "part")
        .select(col("p_partkey"), col("p_name"),
          translate(col("p_name"), "aeiou", "AEIOU").as("vowels_up"),
          reverse(col("p_name")).as("reversed"),
          repeat(substring(col("p_name"), 1, 2), 3).as("rep2x3"),
          lpad(col("p_brand"), 12, "*").as("brand_padded"),
          instr(col("p_name"), "e").cast("long").as("first_e"),
          levenshtein(col("p_name"), lit("green widget")).cast("long")
            .as("lev_to_green_widget"))
        .orderBy("p_partkey"),
      Some("""SELECT p_partkey, p_name,
             |  translate(p_name, 'aeiou', 'AEIOU') AS vowels_up,
             |  reverse(p_name) AS reversed,
             |  repeat(substr(p_name, 1, 2), 3) AS rep2x3,
             |  lpad(p_brand, 12, '*') AS brand_padded,
             |  CAST(strpos(p_name, 'e') AS BIGINT) AS first_e,
             |  CAST(levenshtein(p_name, 'green widget') AS BIGINT) AS lev_to_green_widget
             |FROM part ORDER BY p_partkey""".stripMargin)),

    // EXT — MAD robust outliers: median / median-absolute-deviation
    // per event type, outlier = |x − med| > 3·1.4826·MAD (the robust
    // counterpart of q93's z-score — immune to the outliers it hunts,
    // the standard robust scale rule; 1.4826 makes MAD consistent with
    // σ under normality). Both medians are `percentile`/`quantile_cont`
    // sort-and-interpolate selections (the q91 parity — no cross-row
    // float fold, order-independent), the |types|-row stats broadcast
    // back, and the outlier predicate is a scan-local comparison of
    // doubles built by the IDENTICAL op sequence in both engines
    // ((3.0·1.4826)·mad, left-assoc in each). Two keyed aggregations +
    // one broadcast join — nothing driver-side, nothing all-pairs.
    EngineQuery("q112_mad_outliers",
      (s, dir) => {
        val ev = Tables.events(s, dir)
          .select(col("event_type"), col("value"))
        val med = ev.groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            expr("percentile(value, 0.5)").as("med"))
        val mad = ev.join(broadcast(med), Seq("event_type"))
          .groupBy("event_type")
          .agg(expr("percentile(abs(value - med), 0.5)").as("mad"))
        ev.join(broadcast(med), Seq("event_type"))
          .join(broadcast(mad), Seq("event_type"))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_events"),
            sum(when(abs(col("value") - col("med")) >
                lit(3.0) * lit(1.4826) * col("mad"), 1L)
              .otherwise(0L)).as("n_outliers"),
            round(max(col("med")), 6).as("med"),
            round(max(col("mad")), 6).as("mad"))
          .select(col("event_type"), col("n_events"), col("med"),
            col("mad"), col("n_outliers"),
            round(col("n_outliers").cast("double") /
              col("n_events").cast("double"), 6).as("outlier_rate"))
          .orderBy("event_type")
      },
      Some("""WITH med AS (
             |  SELECT event_type, COUNT(*) AS n,
             |    quantile_cont(value, 0.5) AS med
             |  FROM events GROUP BY 1),
             |mad AS (
             |  SELECT e.event_type,
             |    quantile_cont(abs(e.value - m.med), 0.5) AS mad
             |  FROM events e JOIN med m USING (event_type) GROUP BY 1)
             |SELECT e.event_type, COUNT(*) AS n_events,
             |  round(MAX(m.med), 6) AS med, round(MAX(d.mad), 6) AS mad,
             |  CAST(SUM(CASE WHEN abs(e.value - m.med) >
             |    3.0 * 1.4826 * d.mad THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_outliers,
             |  round(CAST(SUM(CASE WHEN abs(e.value - m.med) >
             |    3.0 * 1.4826 * d.mad THEN 1 ELSE 0 END) AS DOUBLE)
             |    / CAST(COUNT(*) AS DOUBLE), 6) AS outlier_rate
             |FROM events e JOIN med m USING (event_type)
             |JOIN mad d USING (event_type)
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // EXT — UNPIVOT (melt), q51's inverse: the wide per-type count
    // matrix back to long form. The oracle is the ALGEBRAIC identity —
    // unpivot(pivot(events)) must equal the plain grouped count — so
    // this entry proves the round trip, not just the operator. Zero-
    // count cells (absent combinations) drop out, matching the group-by.
    EngineQuery("q144_unpivot",
      (s, dir) => Tables.events(s, dir)
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .unpivot(Array(col("user_id")),
          Array(col("click"), col("error"), col("purchase"),
            col("signup"), col("view")),
          "event_type", "n_events")
        .filter(col("n_events") > 0)
        .orderBy("user_id", "event_type"),
      Some("""SELECT user_id, event_type,
             |  CAST(COUNT(*) AS BIGINT) AS n_events
             |FROM events
             |WHERE event_type IN ('click', 'error', 'purchase',
             |  'signup', 'view')
             |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // EXT — Hill tail-index estimator: per event_type, the Pareto
    // shape of the top-100 values — the heavy-tail diagnostic behind
    // capacity planning and outlier-threshold choices. The rank-≤-k
    // window compiles to WindowGroupLimitExec in Spark 4 (map-side
    // partial top-k per partition, then per-key top-k — NOT a full
    // per-type sort), so the plan stays scale-safe; everything after
    // the rank filter runs over ≤ k rows per type. ln() terms are
    // nonneg (values sorted descending), so the running sum is
    // monotone and the per-type total is its MAX — an order-
    // independent reduction over an ordered sequential accumulation.
    EngineQuery("q162_hill_tail",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val k = 100
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col("value").desc, col("event_id"))
        val top = Tables.events(s, dir)
          .select(col("event_type"), col("event_id"), col("value"))
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= k)
        val vk = top.filter(col("rnk") === k)
          .select(col("event_type"), col("value").as("v_k"))
        val terms = top.filter(col("rnk") < k)
          .join(vk, "event_type")
          .withColumn("lnr", log(col("value") / col("v_k")))
        val wRun = Window.partitionBy(col("event_type")).orderBy(col("rnk"))
          .rowsBetween(Window.unboundedPreceding, 0)
        val wAll = Window.partitionBy(col("event_type"))
        terms
          .withColumn("run", sum(col("lnr")).over(wRun))
          .withColumn("tot", max(col("run")).over(wAll))
          .filter(col("rnk") === 1)
          // round(6): ln() is libm, not correctly-rounded IEEE — the two
          // engines drift a final ulp; 6 decimals absorbs it (q71 et al.)
          .select(col("event_type"), col("v_k"),
            round(col("tot") / lit((k - 1).toDouble), 6)
              .as("hill_mean_log"),
            round(lit((k - 1).toDouble) / col("tot"), 6).as("tail_alpha"))
          .orderBy("event_type")
      },
      Some("""WITH ranked AS (
             |  SELECT event_type, event_id, value,
             |    row_number() OVER (PARTITION BY event_type
             |      ORDER BY value DESC, event_id) AS rnk
             |  FROM events),
             |top AS (SELECT * FROM ranked WHERE rnk <= 100),
             |vk AS (
             |  SELECT event_type, value AS v_k FROM top WHERE rnk = 100),
             |terms AS (
             |  SELECT t.event_type, t.rnk, vk.v_k,
             |    ln(t.value / vk.v_k) AS lnr
             |  FROM top t JOIN vk ON vk.event_type = t.event_type
             |  WHERE t.rnk < 100),
             |runs AS (
             |  SELECT event_type, rnk, v_k,
             |    SUM(lnr) OVER (PARTITION BY event_type ORDER BY rnk
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |      AS run
             |  FROM terms),
             |tots AS (
             |  SELECT event_type, rnk, v_k,
             |    MAX(run) OVER (PARTITION BY event_type) AS tot
             |  FROM runs)
             |SELECT event_type, v_k,
             |  round(tot / CAST(99.0 AS DOUBLE), 6) AS hill_mean_log,
             |  round(CAST(99.0 AS DOUBLE) / tot, 6) AS tail_alpha
             |FROM tots WHERE rnk = 1
             |ORDER BY event_type""".stripMargin)),

    // EXT — column profiling report: per events column, row/null/
    // distinct counts and the null rate — the schema-health scan a
    // warehouse runs before trusting a new feed. ONE pass over the
    // table (a single multi-aggregate; the per-column rows come from a
    // stack generator over the 1-row aggregate, never a per-column
    // re-scan). Distinct counts are exact because the gate demands it —
    // the sketch variant of this report is the q17b precedent.
    EngineQuery("q176_data_profile",
      (s, dir) => {
        val cols = Seq("event_id", "ts", "user_id", "event_type",
          "value", "props")
        val aggs = count(lit(1)).as("n") +:
          cols.flatMap(c => Seq(
            sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nn_$c"),
            countDistinct(col(c)).as(s"nd_$c")))
        val one = Tables.events(s, dir).agg(aggs.head, aggs.tail: _*)
        val stackArgs = cols.map(c => s"'$c', nn_$c, nd_$c").mkString(", ")
        one.select(col("n"),
            expr(s"stack(${cols.size}, $stackArgs) " +
              "AS (col_name, n_nulls, n_distinct)"))
          .select(col("col_name"), col("n").as("n_rows"), col("n_nulls"),
            col("n_distinct"),
            (col("n_nulls").cast("double") / col("n").cast("double"))
              .as("null_rate"))
          .orderBy("col_name")
      },
      Some("""WITH a AS (
             |  SELECT COUNT(*) AS n,
             |    CAST(SUM(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END)
             |      AS BIGINT) AS nn1, COUNT(DISTINCT event_id) AS nd1,
             |    CAST(SUM(CASE WHEN ts IS NULL THEN 1 ELSE 0 END)
             |      AS BIGINT) AS nn2, COUNT(DISTINCT ts) AS nd2,
             |    CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)
             |      AS BIGINT) AS nn3, COUNT(DISTINCT user_id) AS nd3,
             |    CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END)
             |      AS BIGINT) AS nn4, COUNT(DISTINCT event_type) AS nd4,
             |    CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END)
             |      AS BIGINT) AS nn5, COUNT(DISTINCT value) AS nd5,
             |    CAST(SUM(CASE WHEN props IS NULL THEN 1 ELSE 0 END)
             |      AS BIGINT) AS nn6, COUNT(DISTINCT props) AS nd6
             |  FROM events)
             |SELECT col_name, n AS n_rows, n_nulls, n_distinct,
             |  CAST(n_nulls AS DOUBLE) / CAST(n AS DOUBLE) AS null_rate
             |FROM (
             |  SELECT 'event_id' AS col_name, n, nn1 AS n_nulls,
             |    nd1 AS n_distinct FROM a
             |  UNION ALL SELECT 'ts', n, nn2, nd2 FROM a
             |  UNION ALL SELECT 'user_id', n, nn3, nd3 FROM a
             |  UNION ALL SELECT 'event_type', n, nn4, nd4 FROM a
             |  UNION ALL SELECT 'value', n, nn5, nd5 FROM a
             |  UNION ALL SELECT 'props', n, nn6, nd6 FROM a)
             |ORDER BY col_name""".stripMargin)),

    // EXT — TPC-H Q2 SHAPE: correlated scalar MIN-equality subquery
    // ("the supplier(s) offering each part at its minimum price",
    // adapted to this schema's lineitem prices — no partsupp table).
    // Exercises RewriteCorrelatedScalarSubquery: Catalyst decorrelates
    // the per-part MIN into an aggregate + join, never a per-row
    // re-execution. The compared value is the RAW parquet double (no
    // arithmetic), so cross-engine equality is exact; DISTINCT
    // collapses multi-lineitem ties and (partkey, suppkey) is then a
    // total order.
    EngineQuery("q264_cheapest_supplier",
      (s, dir) => {
        graft.Catalog.registerAll(s, dir)
        s.sql("""
          |SELECT DISTINCT p.p_partkey, p.p_brand, s.s_suppkey, s.s_name,
          |  l.l_extendedprice AS min_price
          |FROM part p, lineitem l, supplier s
          |WHERE l.l_partkey = p.p_partkey AND s.s_suppkey = l.l_suppkey
          |  AND l.l_extendedprice = (
          |    SELECT MIN(l2.l_extendedprice) FROM lineitem l2
          |    WHERE l2.l_partkey = p.p_partkey)
          |ORDER BY p.p_partkey, s.s_suppkey""".stripMargin)
      },
      Some("""SELECT DISTINCT p.p_partkey, p.p_brand, s.s_suppkey, s.s_name,
             |  l.l_extendedprice AS min_price
             |FROM part p, lineitem l, supplier s
             |WHERE l.l_partkey = p.p_partkey AND s.s_suppkey = l.l_suppkey
             |  AND l.l_extendedprice = (
             |    SELECT MIN(l2.l_extendedprice) FROM lineitem l2
             |    WHERE l2.l_partkey = p.p_partkey)
             |ORDER BY p.p_partkey, s.s_suppkey""".stripMargin)),

    // EXT — TPC-H Q17 SHAPE: correlated AVG-threshold subquery
    // ("small-quantity orders revenue"): lineitems below 20% of their
    // part's average quantity, revenue per brand ÷ 7. Quantities are
    // integer-valued doubles, so AVG's sum is exact in fp regardless
    // of accumulation order and the 0.2·avg threshold is the identical
    // double in both engines; revenue sums in DECIMAL then one double
    // division.
    EngineQuery("q265_small_qty_revenue",
      (s, dir) => {
        graft.Catalog.registerAll(s, dir)
        s.sql("""
          |SELECT p.p_brand,
          |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
          |    / 7.0 AS avg_yearly
          |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
          |WHERE l.l_quantity < (
          |  SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
          |  WHERE l2.l_partkey = p.p_partkey)
          |GROUP BY p.p_brand
          |ORDER BY p.p_brand""".stripMargin)
      },
      Some("""SELECT p.p_brand,
             |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             |    / 7.0 AS avg_yearly
             |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
             |WHERE l.l_quantity < (
             |  SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
             |  WHERE l2.l_partkey = p.p_partkey)
             |GROUP BY p.p_brand
             |ORDER BY p.p_brand""".stripMargin)),

    // EXT — TPC-H Q18 SHAPE: IN-subquery over a HAVING aggregate
    // ("large-volume orders"): orders whose lineitems total > 180
    // units, with customer and the order's own quantity sum. The IN
    // rewrites to a semi join; the repeated aggregate is the join-back.
    // Quantity sums are integral doubles → exact BIGINT casts.
    EngineQuery("q266_large_orders",
      (s, dir) => {
        graft.Catalog.registerAll(s, dir)
        s.sql("""
          |SELECT c.c_custkey, o.o_orderkey, o.o_totalprice,
          |  CAST(SUM(l.l_quantity) AS BIGINT) AS sum_qty
          |FROM customer c, orders o, lineitem l
          |WHERE o.o_orderkey IN (
          |    SELECT l_orderkey FROM lineitem
          |    GROUP BY l_orderkey HAVING SUM(l_quantity) > 180)
          |  AND c.c_custkey = o.o_custkey AND o.o_orderkey = l.l_orderkey
          |GROUP BY c.c_custkey, o.o_orderkey, o.o_totalprice
          |ORDER BY o.o_totalprice DESC, o.o_orderkey""".stripMargin)
      },
      Some("""SELECT c.c_custkey, o.o_orderkey, o.o_totalprice,
             |  CAST(SUM(l.l_quantity) AS BIGINT) AS sum_qty
             |FROM customer c, orders o, lineitem l
             |WHERE o.o_orderkey IN (
             |    SELECT l_orderkey FROM lineitem
             |    GROUP BY l_orderkey HAVING SUM(l_quantity) > 180)
             |  AND c.c_custkey = o.o_custkey AND o.o_orderkey = l.l_orderkey
             |GROUP BY c.c_custkey, o.o_orderkey, o.o_totalprice
             |ORDER BY o.o_totalprice DESC, o.o_orderkey""".stripMargin)),

    // EXT — TPC-H Q21 SHAPE: EXISTS + NOT EXISTS on the same fact
    // ("suppliers who kept waiting others"): the supplier shipped >60
    // days after the order date, the order has other suppliers, and NO
    // other supplier was also late — the double-correlated semi/anti
    // composition (lateness adapted to ship-vs-order dates; this
    // schema has no commit/receipt dates). Only the date-add spelling
    // differs between engine texts.
    EngineQuery("q267_waiting_suppliers",
      (s, dir) => {
        graft.Catalog.registerAll(s, dir)
        s.sql("""
          |SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
          |FROM supplier s, lineitem l1, orders o
          |WHERE s.s_suppkey = l1.l_suppkey AND o.o_orderkey = l1.l_orderkey
          |  AND CAST(l1.l_shipdate AS DATE) >
          |      date_add(CAST(o.o_orderdate AS DATE), 60)
          |  AND EXISTS (
          |    SELECT 1 FROM lineitem l2
          |    WHERE l2.l_orderkey = l1.l_orderkey
          |      AND l2.l_suppkey <> l1.l_suppkey)
          |  AND NOT EXISTS (
          |    SELECT 1 FROM lineitem l3
          |    WHERE l3.l_orderkey = l1.l_orderkey
          |      AND l3.l_suppkey <> l1.l_suppkey
          |      AND CAST(l3.l_shipdate AS DATE) >
          |          date_add(CAST(o.o_orderdate AS DATE), 60))
          |GROUP BY s.s_name
          |ORDER BY numwait DESC, s.s_name""".stripMargin)
      },
      Some("""SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
             |FROM supplier s, lineitem l1, orders o
             |WHERE s.s_suppkey = l1.l_suppkey AND o.o_orderkey = l1.l_orderkey
             |  AND CAST(l1.l_shipdate AS DATE) >
             |      CAST(o.o_orderdate AS DATE) + 60
             |  AND EXISTS (
             |    SELECT 1 FROM lineitem l2
             |    WHERE l2.l_orderkey = l1.l_orderkey
             |      AND l2.l_suppkey <> l1.l_suppkey)
             |  AND NOT EXISTS (
             |    SELECT 1 FROM lineitem l3
             |    WHERE l3.l_orderkey = l1.l_orderkey
             |      AND l3.l_suppkey <> l1.l_suppkey
             |      AND CAST(l3.l_shipdate AS DATE) >
             |          CAST(o.o_orderdate AS DATE) + 60)
             |GROUP BY s.s_name
             |ORDER BY numwait DESC, s.s_name""".stripMargin)),

    // EXT — TPC-H Q11 SHAPE: GROUP BY + HAVING against a GLOBAL scalar
    // subquery ("important stock"): parts whose lineitem value share
    // exceeds the all-parts average (cents·|scalar| vs total — pure
    // BIGINT comparison, no division anywhere, so the threshold is
    // exact at any SF). Catalyst must plan the scalar ONCE (a 1-row
    // broadcast into the HAVING filter), not per group.
    EngineQuery("q276_important_parts",
      (s, dir) => {
        graft.Catalog.registerAll(s, dir)
        s.sql(q276Sql)
      },
      Some(q276Sql)),

    // EXT — TPC-H Q15 SHAPE: aggregate view consumed twice — once as
    // the join input, once under MAX — with the WHERE total = (SELECT
    // MAX…) equality ("top supplier"). The CTE must not recompute per
    // row; revenue is exact BIGINT cents so the MAX-equality can never
    // split on float noise; ties (multiple top suppliers) all return,
    // ordered by key.
    EngineQuery("q277_top_supplier",
      (s, dir) => {
        graft.Catalog.registerAll(s, dir)
        s.sql(q277Sql)
      },
      Some(q277Sql)),

    // EXT — TPC-H Q16 SHAPE: NOT IN over an aggregated subquery +
    // COUNT(DISTINCT) ("supplier diversity excluding returns-heavy
    // suppliers"): the NOT IN rewrites to a null-aware anti join
    // against a HAVING-filtered aggregate (the exclusion is RELATIVE —
    // R-count > 1.1x the average via integer cross-multiplication, so
    // the predicate stays meaningful at every SF), then distinct
    // supplier counts per (brand, type). Keys are never null here, so the
    // null-aware path degenerates to a plain anti join — the rewrite
    // itself is what's under test.
    EngineQuery("q278_supplier_diversity",
      (s, dir) => {
        graft.Catalog.registerAll(s, dir)
        s.sql(q278Sql)
      },
      Some(q278Sql)),

    // EXT — TPC-H Q20 SHAPE: nested IN chains (supplier IN (… lineitem
    // … WHERE part IN (…) GROUP BY HAVING)) — two levels of semi-join
    // rewrite with an aggregate between them ("widget bulk
    // suppliers"). Quantities are integral doubles → the HAVING
    // threshold compares exact BIGINTs.
    EngineQuery("q279_widget_bulk_suppliers",
      (s, dir) => {
        graft.Catalog.registerAll(s, dir)
        s.sql(q279Sql)
      },
      Some(q279Sql)),

    // EXT — TPC-H Q22 SHAPE: scalar average threshold + NOT EXISTS
    // ("idle rich accounts by geography"): customers above the
    // positive-balance average with no PENDING ('P') order — every
    // customer in this generator has some order, so status-scoped
    // NOT EXISTS is the Q22-analog anti-condition that stays
    // non-empty at every test SF — rolled up per nation.
    // The average is expressed as cnt·bal > sum — decimal-exact
    // integer-style comparison, no division — so the cohort is
    // identical cross-engine; the NOT EXISTS is the anti-join leg.
    EngineQuery("q280_idle_rich_geography",
      (s, dir) => {
        graft.Catalog.registerAll(s, dir)
        s.sql(q280Sql)
      },
      Some(q280Sql))
  )

  // Q276–Q280 run the IDENTICAL text through spark.sql and DuckDB —
  // the optimizer shapes (scalar-subquery broadcast, CTE reuse,
  // null-aware anti join, nested semi joins, exists decorrelation)
  // are what differ under the hood.
  private lazy val q276Sql =
    """WITH val AS (
      |  SELECT l_partkey,
      |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
      |      AS BIGINT)) AS BIGINT) AS cents
      |  FROM lineitem GROUP BY l_partkey)
      |SELECT v.l_partkey AS p_partkey, p.p_brand, v.cents AS value_cents
      |FROM val v JOIN part p ON p.p_partkey = v.l_partkey
      |GROUP BY v.l_partkey, p.p_brand, v.cents
      |HAVING v.cents * (SELECT CAST(COUNT(*) AS BIGINT) FROM val) >
      |  (SELECT CAST(SUM(cents) AS BIGINT) FROM val)
      |ORDER BY value_cents DESC, p_partkey""".stripMargin

  private lazy val q277Sql =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
      |      AS BIGINT)) AS BIGINT) AS rev_cents
      |  FROM lineitem GROUP BY l_suppkey)
      |SELECT s.s_suppkey, s.s_name, r.rev_cents
      |FROM supplier s JOIN rev r ON r.l_suppkey = s.s_suppkey
      |WHERE r.rev_cents = (SELECT MAX(rev_cents) FROM rev)
      |ORDER BY s.s_suppkey""".stripMargin

  private lazy val q278Sql =
    """SELECT p.p_brand, p.p_type,
      |  CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
      |FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
      |WHERE p.p_size <= 20
      |  AND l.l_suppkey NOT IN (
      |    SELECT l2.l_suppkey FROM lineitem l2
      |    WHERE l2.l_returnflag = 'R'
      |    GROUP BY l2.l_suppkey
      |    HAVING COUNT(*) * (SELECT CAST(COUNT(DISTINCT l3.l_suppkey)
      |        AS BIGINT) FROM lineitem l3 WHERE l3.l_returnflag = 'R')
      |        * 10 >
      |      (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l4
      |       WHERE l4.l_returnflag = 'R') * 11)
      |GROUP BY p.p_brand, p.p_type
      |ORDER BY supplier_cnt DESC, p.p_brand, p.p_type""".stripMargin

  private lazy val q279Sql =
    """SELECT s.s_suppkey, s.s_name
      |FROM supplier s
      |WHERE s.s_suppkey IN (
      |  SELECT l.l_suppkey FROM lineitem l
      |  WHERE l.l_partkey IN (
      |    SELECT p_partkey FROM part WHERE p_name LIKE '%widget%')
      |  GROUP BY l.l_suppkey
      |  HAVING CAST(SUM(l.l_quantity) AS BIGINT) > 1000)
      |ORDER BY s.s_suppkey""".stripMargin

  private lazy val q280Sql =
    """WITH pos AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS cnt,
      |    SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS total
      |  FROM customer WHERE c_acctbal > 0.0)
      |SELECT c.c_nationkey,
      |  CAST(COUNT(*) AS BIGINT) AS numcust,
      |  CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
      |FROM customer c
      |WHERE c.c_nationkey IN (0, 1, 2, 3, 4)
      |  AND CAST(c.c_acctbal AS DECIMAL(18,2)) * (SELECT cnt FROM pos) >
      |    (SELECT total FROM pos)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
      |      AND o.o_orderstatus = 'P')
      |GROUP BY c.c_nationkey
      |ORDER BY c.c_nationkey""".stripMargin
}
