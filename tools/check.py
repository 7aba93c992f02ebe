#!/usr/bin/env python3
"""Local differential harness mirroring the driver's DuckDB-oracle gate.

Dev-tool only (NOT a library dependency of the engine): runs after
`graft.Verify` has dumped per-query parquet + oracle_sql.json, loads both
sides in DuckDB, canonicalizes (sort columns by name, sort rows, exact
value compare) and reports per-query PASS/FAIL.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [name ...]
"""
import json, math, sys, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            if v == 0.0:
                v = 0.0  # normalize -0.0
            return repr(v)
        return repr(v)

    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort()
    return [c for c in sorted(cols)], out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = n_skip = 0
    for name in sorted(oracles):
        if only and name not in only:
            continue
        spark_glob = os.path.join(out_dir, name, "*.parquet")
        if not glob.glob(spark_glob):
            print(f"MISSING  {name} (no spark dump)")
            n_fail += 1
            continue
        got = con.execute(f"SELECT * FROM read_parquet('{spark_glob}')")
        g_cols = [d[0] for d in got.description]
        g_rows = got.fetchall()
        try:
            exp = con.execute(oracles[name])
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}")
            n_fail += 1
            continue
        e_cols = [d[0] for d in exp.description]
        e_rows = exp.fetchall()
        gc, gr = canon(g_rows, g_cols)
        ec, er = canon(e_rows, e_cols)
        if gc != ec:
            print(f"FAIL     {name}: columns {gc} vs {ec}")
            n_fail += 1
        elif gr != er:
            diff = [(a, b) for a, b in zip(gr, er) if a != b]
            print(f"FAIL     {name}: {len(gr)} vs {len(er)} rows; "
                  f"first diffs: {diff[:2]}"
                  + ("" if len(gr) == len(er) else " (row-count mismatch)"))
            if len(gr) != len(er):
                print(f"  spark-only sample: {[r for r in gr if r not in set(er)][:2]}")
                print(f"  oracle-only sample: {[r for r in er if r not in set(gr)][:2]}")
            n_fail += 1
        else:
            print(f"PASS     {name} ({len(gr)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
