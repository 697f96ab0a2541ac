#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB against the
sfDir parquet tables, and compares: row count, column names (sorted),
and a hash over sorted rows with exact value equality.
"""
import sys, json, glob, os
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(rows, names):
    order = sorted(range(len(names)), key=lambda i: names[i])
    out = []
    for r in rows:
        vals = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                v = repr(v)  # exact double repr
            vals.append(str(v))
        out.append("\x1f".join(vals))
    out.sort()
    return out

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):  # ScaleUp writes directory tables
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_noracle = 0
    for d in sorted(glob.glob(f"{out_dir}/*")):
        name = os.path.basename(d)
        if not os.path.isdir(d):
            continue
        try:
            got = con.execute(f"SELECT * FROM '{d}/*.parquet'")
        except Exception as e:
            n_fail += 1
            print(f"  [FAIL-run ] {name}: no output written ({e})")
            continue
        got_names = [c[0] for c in got.description]
        got_rows = got.fetchall()
        if name not in oracle:
            n_noracle += 1
            print(f"  [rows-only] {name}: {len(got_rows)} rows")
            continue
        try:
            exp = con.execute(oracle[name])
            exp_names = [c[0] for c in exp.description]
            exp_rows = exp.fetchall()
        except Exception as e:
            n_fail += 1
            print(f"  [FAIL-sql ] {name}: oracle errored: {e}")
            continue
        if sorted(got_names) != sorted(exp_names):
            n_fail += 1
            print(f"  [FAIL-cols] {name}: got {sorted(got_names)} want {sorted(exp_names)}")
            continue
        # the driver's compare is TYPE-sensitive (DuckDB SUM(int) ->
        # HUGEINT has bitten twice); surface per-column type diffs that
        # the stringified hash below cannot see. Parquet-roundtrip
        # artifacts (decimal precision, timestamp unit) are normalized.
        def _ty(desc):
            out = {}
            for c in desc:
                t = str(c[1]).upper()
                if t.startswith("DECIMAL"):
                    t = "DECIMAL"
                if t.startswith("TIMESTAMP"):
                    t = "TIMESTAMP"
                out[c[0]] = t
            return out
        gt, et = _ty(got.description), _ty(exp.description)
        tdiff = [f"{c}: got {gt[c]} want {et[c]}" for c in sorted(gt) if gt[c] != et[c]]
        if tdiff:
            n_fail += 1
            print(f"  [FAIL-type] {name}: " + "; ".join(tdiff))
            continue
        if len(got_rows) != len(exp_rows):
            n_fail += 1
            print(f"  [FAIL-rows] {name}: got {len(got_rows)} want {len(exp_rows)}")
            continue
        g, e = canon(got_rows, got_names), canon(exp_rows, exp_names)
        if g != e:
            n_fail += 1
            bad = next(i for i in range(len(g)) if g[i] != e[i])
            print(f"  [FAIL-hash] {name}: first diff row {bad}:")
            print(f"     got  {g[bad][:300]}")
            print(f"     want {e[bad][:300]}")
            continue
        n_pass += 1
        print(f"  [pass     ] {name}: {len(got_rows)} rows")
    # queries that threw in Verify write no output dir — surface them
    # loudly instead of letting the dir-driven loop skip them
    fj = f"{out_dir}/failed.json"
    if os.path.exists(fj):
        for name, err in json.load(open(fj)).items():
            n_fail += 1
            print(f"  [FAIL-run ] {name}: threw in Verify: {err[:200]}")
    print(f"== {n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
