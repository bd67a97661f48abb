#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/verify_local.py [sf_dir] [out_dir] [--skip-spark]
           [--timeout=N]

1. runs `sbt runMain graft.Verify <sf_dir> <out_dir>` (unless --skip-spark)
2. for each query output dir: loads the Spark parquet via DuckDB, runs the
   oracle SQL (from out_dir/oracle_sql.json) over views named after the
   source tables, sorts columns by name + rows by all columns, compares.

--timeout=N interrupts any single ORACLE query after N seconds and
records it as a LOUD per-query SKIP plus a summary count (for big-SF
sweeps where a handful of O(n^2) DuckDB twins would run for hours —
no silent caps: every skipped entry is named in the output).

--shared=DIR materializes the oracle's shared pipeline frames (grams,
minhash signatures, exact-Jaccard verify, dup-cluster labels, the KNN
graph) ONCE into DIR before the sweep, and the twins read them instead
of recomputing per query — the big-SF amortization that gives the
heavy fold/cascade entries a real oracle adjudication. Implies the
Spark step must run with SPARK_GRAFT_ORACLE_SHARED_DIR=DIR (this
script sets it when --skip-spark is absent).
"""
import json, math, os, subprocess, sys, threading, time
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple(
        (x is None, str(type(x)), str(x)) for x in t)), [cols[i] for i in order]


def cmp_cell(a, b):
    if a is None or b is None:
        return a is b
    if isinstance(a, float) or isinstance(b, float):
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            return str(a) == str(b)
        if math.isnan(af) and math.isnan(bf):
            return True
        return af == bf
    return a == b if type(a) == type(b) else str(a) == str(b)


def fetch(con, sql, timeout_s):
    """Run sql to completion; interrupt after timeout_s seconds (0 = no
    timeout). Raises duckdb.InterruptException on timeout."""
    timer, fired = None, [False]
    if timeout_s:
        def _interrupt():
            fired[0] = True
            con.interrupt()
        timer = threading.Timer(timeout_s, _interrupt)
        timer.start()
    try:
        r = con.sql(sql)
        return r.fetchall(), [c for c in r.columns]
    finally:
        if timer:
            timer.cancel()
            if fired[0]:
                # the interrupt may have landed after completion: consume
                # any pending flag so it cannot abort the NEXT query
                try:
                    con.sql("SELECT 1").fetchall()
                except duckdb.InterruptException:
                    pass


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    timeout_s = 0
    shard_i, shard_n = 0, 1
    threads = 0
    memlimit = ""
    resume_logs = []
    only = set()
    shared_dir = ""
    spill_cap = "30GB"
    for a in sys.argv[1:]:
        if a.startswith("--timeout="):
            timeout_s = int(a.split("=", 1)[1])
        if a.startswith("--shared="):
            shared_dir = a.split("=", 1)[1]
        if a.startswith("--spillcap="):
            spill_cap = a.split("=", 1)[1]
        if a.startswith("--shard="):
            shard_i, shard_n = map(int, a.split("=", 1)[1].split("/"))
        if a.startswith("--threads="):
            threads = int(a.split("=", 1)[1])
        if a.startswith("--memlimit="):
            memlimit = a.split("=", 1)[1]
        if a.startswith("--resume="):
            resume_logs.extend(a.split("=", 1)[1].split(","))
        if a.startswith("--only="):
            only.update(a.split("=", 1)[1].split(","))
    gate_equiv = ("--gate-equiv" in sys.argv, "--no-gate-equiv" in sys.argv)
    frames_only = set()
    for a in sys.argv[1:]:
        if a.startswith("--frames="):
            frames_only.update(a.split("=", 1)[1].split(","))
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    out_dir = Path(args[1] if len(args) > 1 else "/tmp/verify_out")
    if "--skip-spark" not in sys.argv:
        env = dict(os.environ)
        if shared_dir:
            env["SPARK_GRAFT_ORACLE_SHARED_DIR"] = shared_dir
        r = subprocess.run(
            ["sbt", "-batch", f"runMain graft.Verify {sf_dir} {out_dir}"],
            cwd="/root/repo", capture_output=True, text=True, timeout=7200,
            env=env)
        sys.stdout.write("\n".join(
            l for l in (r.stdout + r.stderr).splitlines()
            if "[verify]" in l or "error" in l.lower()) + "\n")

    con = duckdb.connect()
    for t in TABLES:
        # driver testdata ships single files; Spark-written probe tables
        # (GenScaleProbe) are directories of part files
        p = Path(sf_dir) / f"{t}.parquet"
        src = f"{p}/*.parquet" if p.is_dir() else str(p)
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

    if threads:
        con.sql(f"SET threads={threads}")
    if memlimit:
        con.sql(f"SET memory_limit='{memlimit}'")
        # cap spill too: an uncapped big-SF oracle can transiently fill
        # the disk and break CONCURRENT Spark shuffle writes (observed
        # twice in the round-12 sf1 sweep)
        # default 30GB: an uncapped spill transiently filled the disk and
        # broke CONCURRENT Spark writes twice in round 12. --spillcap=N
        # raises it for materialization-phase builds that run AFTER the
        # Spark side completed (the concurrency hazard is gone then)
        con.sql("SET temp_directory='/tmp/duckdb_spill'")
        con.sql(f"SET max_temp_directory_size='{spill_cap}'")

    # --resume=<log,...>: skip entries already adjudicated (PASS/FAIL/
    # SKIP) in earlier sweep logs — lets a crashed big-SF sweep continue
    # where it stopped without repeating hours of oracle work. Prior
    # verdicts are CARRIED into this run's tally (r12 ADVICE: a resumed
    # sweep must not print "0 fail" when an earlier shard failed), and a
    # missing resume log is a hard error, not a silent empty carry.
    done = set()
    carried = {"PASS": 0, "FAIL": 0, "SKIP": 0}
    for lg in resume_logs:
        p = Path(lg)
        if not p.is_file():
            print(f"ERROR: --resume log not found: {lg}", file=sys.stderr)
            return 2
        for line in p.read_text().splitlines():
            if line.startswith(("PASS ", "FAIL ", "SKIP ")):
                name = line.split()[1].rstrip(":")
                if name not in done:
                    done.add(name)
                    carried[line.split()[0]] += 1
    if resume_logs:
        print(f"== carried over from resume logs: {carried['PASS']} pass / "
              f"{carried['FAIL']} fail / {carried['SKIP']} skip "
              f"({len(done)} entries) ==")

    # --shared=DIR: materialize the oracle's shared frames ONCE before
    # the sweep (round-12 VERDICT ask #1). The manifest (dumped by
    # graft.Verify when SPARK_GRAFT_ORACLE_SHARED_DIR is set) is
    # dependency-ordered standalone SQL; each frame COPYs to parquet and
    # every downstream twin reads it instead of recomputing the shared
    # pipeline per query. Existing frames are reused (delete the dir to
    # rebuild) so a resumed sweep doesn't repay the builds.
    if shared_dir:
        man_path = out_dir / "oracle_shared.json"
        if not man_path.is_file():
            print("ERROR: --shared given but oracle_shared.json missing "
                  "(run Verify with SPARK_GRAFT_ORACLE_SHARED_DIR set)",
                  file=sys.stderr)
            return 2
        Path(shared_dir).mkdir(parents=True, exist_ok=True)
        # Dataset fingerprint (ADVICE r13): frame reuse without one lets
        # a sweep pointed at a DIFFERENT sf_dir (or a regenerated corpus)
        # silently adjudicate against stale oracle frames. Bind the
        # shared dir to the exact source dataset: resolved sf_dir path +
        # per-table byte sizes and mtimes (dirs: part-file sum + max
        # mtime). Written on first build; any later mismatch is a HARD
        # error — never silently rebuild, the operator must decide
        # whether the old frames or the new corpus is the mistake.
        def _tbl_sig(t):
            p = Path(sf_dir) / f"{t}.parquet"
            if p.is_dir():
                parts = sorted(p.glob("*.parquet"))
                return [t, sum(f.stat().st_size for f in parts),
                        max((int(f.stat().st_mtime) for f in parts),
                            default=0), len(parts)]
            if p.is_file():
                return [t, p.stat().st_size, int(p.stat().st_mtime), 1]
            return [t, 0, 0, 0]
        fingerprint = {"sf_dir": str(Path(sf_dir).resolve()),
                       "tables": [_tbl_sig(t) for t in TABLES]}
        fp_path = Path(shared_dir) / ".dataset_fingerprint.json"
        if fp_path.is_file():
            recorded = json.loads(fp_path.read_text())
            if recorded != fingerprint:
                print(f"ERROR: shared dir {shared_dir} was built from a "
                      f"different dataset.\n  recorded: {recorded}\n  "
                      f"current:  {fingerprint}\nDelete the shared dir to "
                      "rebuild against the current corpus, or point "
                      "--shared at the matching one.", file=sys.stderr)
                return 2
        else:
            fp_path.write_text(json.dumps(fingerprint, indent=1))
        for ent in json.loads(man_path.read_text()):
            tgt = Path(shared_dir) / f"{ent['name']}.parquet"
            # --frames=a,b,c: materialize only the listed frames (for a
            # --only run over a family that reads a frame subset — e.g.
            # the knn family never reads the text frames, whose sf1
            # builds cost tens of minutes). LOUD skip line per frame; a
            # twin that reads an unbuilt frame fails its oracle query
            # visibly, never silently.
            if frames_only and ent['name'] not in frames_only:
                print(f"SHARED {ent['name']}: skipped (--frames)")
                continue
            if tgt.exists():
                print(f"SHARED {ent['name']}: reusing {tgt}")
                continue
            t0 = time.time()
            # atomic build: COPY to a dot-tmp then rename, so a crashed
            # or OOM-killed build can never leave a truncated parquet
            # that a resumed run "reuses" (bitten once: an OOM mid-jac
            # left a 4-byte file and 4 downstream twins read it)
            tmp = Path(shared_dir) / f".{ent['name']}.parquet.tmp"
            if tmp.exists():
                tmp.unlink()
            # a frame's build SQL may be ';;'-separated statements (e.g.
            # the sharded exact-pairs accumulator): execute all but the
            # last, COPY the last
            steps = [s.strip() for s in ent['sql'].split("\n;;\n")]
            for stmt in steps[:-1]:
                con.sql(stmt)
            con.sql(f"COPY ({steps[-1]}) TO '{tmp}' (FORMAT PARQUET)")
            os.replace(tmp, tgt)
            print(f"SHARED {ent['name']}: materialized in "
                  f"{time.time() - t0:.1f}s "
                  f"({tgt.stat().st_size / 1e6:.1f} MB)")
        # Equivalence gate (ADVICE r13): frames whose materialized build
        # is a structurally different algorithm than the inline twin
        # (jac's list-intersect vs join; the sharded exact-pairs
        # accumulator) carry their inline form in
        # oracle_shared_gates.json. Assert EXCEPT-ALL-both-directions
        # emptiness so the equivalence is re-proven on every sweep, not
        # trusted from a one-off manual check. Auto-runs when the corpus
        # is small (the inline forms are intractable at sf1 — that is
        # WHY the mat builds exist); --gate-equiv forces, --no-gate-equiv
        # skips (loudly).
        gates_path = out_dir / "oracle_shared_gates.json"
        docs = Path(sf_dir) / "documents.parquet"
        docs_bytes = (sum(f.stat().st_size for f in docs.glob("*.parquet"))
                      if docs.is_dir() else
                      (docs.stat().st_size if docs.is_file() else 0))
        force_gate, skip_gate = gate_equiv
        run_gates = force_gate or (docs_bytes < 50_000_000 and not skip_gate)
        if gates_path.is_file():
            gates = json.loads(gates_path.read_text())
            if not run_gates:
                print(f"GATE-EQUIV: skipped ({len(gates)} gates; corpus "
                      f"{docs_bytes / 1e6:.0f} MB — inline forms "
                      "intractable at big SF; re-prove at sf0.01)")
            for ent in (gates if run_gates else []):
                name, inline = ent["name"], ent["inline_sql"]
                if not (Path(shared_dir) / f"{name}.parquet").is_file():
                    print(f"GATE-EQUIV {name}: skipped (frame not "
                          "materialized in this run)")
                    continue
                mat = f"SELECT * FROM '{shared_dir}/{name}.parquet'"
                t0 = time.time()
                extra = con.sql(f"SELECT COUNT(*) FROM (({inline}) "
                                f"EXCEPT ALL ({mat}))").fetchone()[0]
                missing = con.sql(f"SELECT COUNT(*) FROM (({mat}) "
                                  f"EXCEPT ALL ({inline}))").fetchone()[0]
                n = con.sql(f"SELECT COUNT(*) FROM ({mat})").fetchone()[0]
                if extra or missing:
                    print(f"GATE-EQUIV {name}: FAIL — inline-only rows: "
                          f"{extra}, mat-only rows: {missing} "
                          f"(mat has {n} rows)", file=sys.stderr)
                    return 2
                print(f"GATE-EQUIV {name}: OK — inline ≡ materialized "
                      f"({n} rows, both EXCEPT ALL empty, "
                      f"{time.time() - t0:.1f}s)")

    oracles = json.loads((out_dir / "oracle_sql.json").read_text())
    n_pass, n_fail, n_skip = carried["PASS"], carried["FAIL"], carried["SKIP"]
    skipped = []
    names = [n for i, n in enumerate(sorted(oracles))
             if i % shard_n == shard_i and n not in done
             and (not only or n in only)]
    # results too large to canon/sort in python compare INSIDE DuckDB:
    # sorted-column count + an order-independent HUGEINT content-hash
    # sum on both sides — the same rows/schema/hash bar, no 85M-tuple
    # python materialization (q26/q31 at sf1 emit 84.9M rows each)
    BIG_ROWS = 2_000_000

    def sql_hash_compare(name, qdir, osql):
        s_cols = [c for c in
                  con.sql(f"SELECT * FROM '{qdir}/*.parquet' LIMIT 0").columns]
        o_cols = [r[0] for r in
                  con.sql(f"DESCRIBE ({osql})").fetchall()]
        if sorted(s_cols) != sorted(o_cols):
            return f"cols spark={sorted(s_cols)} oracle={sorted(o_cols)}"
        hexpr = ", ".join(f'"{c}"' for c in sorted(s_cols))
        agg = (f"SELECT count(*) AS n, "
               f"sum(CAST(hash({hexpr}) AS HUGEINT)) AS h FROM ")
        s_n, s_h = fetch(con, agg + f"'{qdir}/*.parquet'", 0)[0][0]
        o_n, o_h = fetch(con, agg + f"({osql}) t", timeout_s)[0][0]
        if s_n != o_n:
            return f"rows spark={s_n} oracle={o_n}"
        if s_h != o_h:
            return f"content hash spark={s_h} oracle={o_h}"
        print(f"PASS {name} ({s_n} rows, sql-hash mode)")
        return None

    for name in names:
        qdir = out_dir / name
        if not qdir.exists():
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            s_cnt = con.sql(
                f"SELECT count(*) FROM '{qdir}/*.parquet'").fetchone()[0]
            if s_cnt > BIG_ROWS:
                bad_big = sql_hash_compare(name, qdir, oracles[name])
                if bad_big:
                    print(f"FAIL {name}: {bad_big}"); n_fail += 1
                else:
                    n_pass += 1
                continue
            s_raw, s_c = fetch(con, f"SELECT * FROM '{qdir}/*.parquet'", 0)
            s_rows, s_cols = canon(s_raw, s_c)
            o_raw, o_c = fetch(con, oracles[name], timeout_s)
            o_rows, o_cols = canon(o_raw, o_c)
        except duckdb.InterruptException:
            print(f"SKIP {name}: oracle exceeded --timeout={timeout_s}s "
                  f"(DuckDB-side cost, not a parity verdict)")
            n_skip += 1; skipped.append(name); continue
        except Exception as e:
            print(f"FAIL {name}: {str(e)[:300]}"); n_fail += 1; continue
        if s_cols != o_cols:
            print(f"FAIL {name}: cols spark={s_cols} oracle={o_cols}")
            n_fail += 1; continue
        if len(s_rows) != len(o_rows):
            print(f"FAIL {name}: rows spark={len(s_rows)} oracle={len(o_rows)}")
            n_fail += 1; continue
        bad = None
        for i, (sr_, or_) in enumerate(zip(s_rows, o_rows)):
            for j, (a, b) in enumerate(zip(sr_, or_)):
                if not cmp_cell(a, b):
                    bad = (i, s_cols[j], a, b); break
            if bad: break
        if bad:
            print(f"FAIL {name}: row {bad[0]} col {bad[1]}: "
                  f"spark={bad[2]!r} oracle={bad[3]!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(s_rows)} rows)")
            n_pass += 1
    # queries with no oracle: rows-only (shard 0 reports them once)
    for qdir in sorted(out_dir.iterdir()) if shard_i == 0 else []:
        if qdir.is_dir() and qdir.name not in oracles:
            try:
                n = con.sql(f"SELECT count(*) FROM '{qdir}/*.parquet'").fetchone()[0]
                print(f"INFO {qdir.name}: rows-only, {n} rows")
            except Exception as e:
                print(f"FAIL {qdir.name}: rows-only read error {str(e)[:200]}")
                n_fail += 1
    if n_skip:
        print(f"== skipped (oracle timeout {timeout_s}s): "
              f"{', '.join(skipped)} ==")
    print(f"== {n_pass} pass / {n_fail} fail / {n_skip} skip ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
