#!/usr/bin/env python3
"""Scaled-differential compare: engine parquet dump vs DuckDB oracle,
entirely inside DuckDB (EXCEPT ALL both ways) so 10^7-row outputs
diff in C++ instead of the python sorted-row hashing in check.py
(SCALE.md round-6: the hash harness is the bottleneck above 10^6
rows, not the engines).

Usage: python3 tools/bigcheck.py <sfDir> <verifyOutDir> [out.jsonl]

For each <outDir>/<name> directory: runs the oracle SQL from
<outDir>/oracle_sql.json against the sfDir tables, then compares the
engine dump with exact value equality:
  - row counts,
  - sorted column names,
  - |engine EXCEPT ALL oracle| + |oracle EXCEPT ALL engine| == 0
    (bag equality — duplicates count, exact doubles, NULL-safe).
Appends one JSON line per query to out.jsonl (default: stdout only).
"""
import sys, json, os, glob, shutil, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def table_path(sf, t):
    p = os.path.join(sf, f"{t}.parquet")
    if os.path.isdir(p):
        return os.path.join(p, "*.parquet")
    return p


def main():
    sf, out = sys.argv[1], sys.argv[2]
    sink = open(sys.argv[3], "a") if len(sys.argv) > 3 else None
    oracle = json.load(open(os.path.join(out, "oracle_sql.json")))
    con = duckdb.connect()
    con.execute("SET threads TO "
                f"{os.environ.get('BIGCHECK_THREADS', os.cpu_count())}")
    # bound memory and spill to disk instead of dying: an unbounded
    # DuckDB on a 600M-row oracle reached 106 GB RSS and was OOM-killed
    # mid-run (round 12) — with a limit it spills to temp_directory
    con.execute(f"SET memory_limit='{os.environ.get('BIGCHECK_MEM', '40GB')}'")
    # bag-equality never needs row order, and insertion-order
    # preservation is DuckDB's biggest memory amplifier on 600M-row
    # DISTINCT/GROUP BY oracles (the agg_*_nunique compares) — without
    # it the dsp distinct's working set exceeded mem+disk on this host
    con.execute("SET preserve_insertion_order=false")
    # per-PID spill dir: concurrent bigcheck instances sharing one
    # temp_directory collide on DuckDB's fixed duckdb_temp_storage-N
    # file names (round 13: one instance's cleanup aborted another
    # mid-compare). The dir is removed on exit; a crash leaves it for
    # tools/teardown.sh, which clears /tmp/duck_tmp* wholesale.
    tmpdir = f"/tmp/duck_tmp_{os.getpid()}"
    os.makedirs(tmpdir, exist_ok=True)
    con.execute(f"SET temp_directory='{tmpdir}'")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{table_path(sf, t)}'")
    names = sorted(d for d in os.listdir(out)
                   if os.path.isdir(os.path.join(out, d)))
    # resume: skip names already recorded as PASS in the sink (long
    # scaled runs survive an interruption without redoing finished
    # compares); failed/errored names re-run so a fix is re-checked
    done = set()
    if len(sys.argv) > 3 and os.path.exists(sys.argv[3]):
        for ln in open(sys.argv[3]):
            try:
                rec = json.loads(ln)
                if rec.get("status") == "pass":
                    done.add(rec.get("name"))
            except Exception:
                pass
    names = [n for n in names if n not in done]
    # optional 4th arg: comma-separated substrings to include (runs a
    # prioritized slice of a big dump; combine with resume for passes)
    if len(sys.argv) > 4:
        pats = [p for p in sys.argv[4].split(",") if p]
        names = [n for n in names if any(p in n for p in pats)]
    # BIGCHECK_EXCLUDE: comma-separated substrings to SKIP — for
    # known ORACLE-side pathologies at a given scale (e.g. DuckDB's
    # 43-minute global dense_rank on agg_ngroup's 60M heavily-tied
    # rows, SCALE.md round 6) whose rows are already proven in an
    # earlier round's differential. Skips are printed, never silent.
    excl = [p for p in os.environ.get("BIGCHECK_EXCLUDE", "").split(",") if p]
    for n in [n for n in names if any(p in n for p in excl)]:
        print(f"[skip-excluded] {n}")
    names = [n for n in names if not any(p in n for p in excl)]
    fails = 0
    for name in names:
        if name not in oracle:
            print(f"[skip-no-oracle] {name}")
            continue
        t0 = time.time()
        dump = os.path.join(out, name, "*.parquet")
        rec = {"name": name}
        try:
            con.execute(f"CREATE OR REPLACE VIEW __eng AS "
                        f"SELECT * FROM '{dump}'")
            # materialize the oracle ONCE: as a view it was evaluated
            # three times per row (count, then twice inside the
            # EXCEPT ALL diff) — for the 600M-row oracles the doubled
            # subplan in one statement ran every branch concurrently,
            # blew past memory_limit, and flipped DuckDB into external
            # aggregation (~50 GB spill on a query that runs in 91 s
            # spill-free when evaluated singly). Temp tables are
            # buffer-managed, so a large oracle result pages to
            # temp_directory instead of doubling the plan.
            con.execute(
                f"CREATE OR REPLACE TEMP TABLE __ora AS ({oracle[name]})")
            ecols = [r[0] for r in con.execute(
                "DESCRIBE __eng").fetchall()]
            ocols = [r[0] for r in con.execute(
                "DESCRIBE __ora").fetchall()]
            rec["schema_match"] = sorted(ecols) == sorted(ocols)
            e_n = con.execute("SELECT count(*) FROM __eng").fetchone()[0]
            o_n = con.execute("SELECT count(*) FROM __ora").fetchone()[0]
            rec["rows"], rec["oracle_rows"] = e_n, o_n
            rec["rows_match"] = e_n == o_n
            if rec["schema_match"]:
                sel = ", ".join(f'"{c}"' for c in sorted(ecols))
                d = con.execute(
                    f"SELECT count(*) FROM ("
                    f"(SELECT {sel} FROM __eng EXCEPT ALL SELECT {sel} FROM __ora)"
                    f" UNION ALL "
                    f"(SELECT {sel} FROM __ora EXCEPT ALL SELECT {sel} FROM __eng))"
                ).fetchone()[0]
                rec["diff_rows"] = d
                rec["value_match"] = d == 0
            else:
                rec["diff_rows"], rec["value_match"] = None, False
            ok = rec["schema_match"] and rec["rows_match"] and rec["value_match"]
            rec["status"] = "pass" if ok else "FAIL"
            if not ok:
                fails += 1
        except Exception as e:
            rec["status"] = "err"
            rec["err"] = str(e)[:400]
            fails += 1
        try:
            con.execute("DROP TABLE IF EXISTS __ora")
        except Exception:
            pass
        rec["compare_secs"] = round(time.time() - t0, 1)
        line = json.dumps(rec)
        print(line, flush=True)
        if sink:
            sink.write(line + "\n")
            sink.flush()
    print(f"== {len(names)} compared, {fails} FAIL")
    con.close()
    shutil.rmtree(tmpdir, ignore_errors=True)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
