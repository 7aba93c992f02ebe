#!/usr/bin/env python3
"""Local differential harness mirroring the driver's DuckDB-oracle gate.

Dev-tool only (NOT a library dependency of the engine): runs after
`graft.Verify` has dumped per-query parquet + oracle_sql.json.

Faithful to the driver's comparator (this matters — round 1 used an
exact-repr compare that silently diverged from the driver and hid real
failures):
  * both sides are loaded into pandas (Spark dump via read_parquet,
    oracle via duckdb .df(), so DuckDB HUGEINT -> float64 narrowing is
    reproduced, not papered over);
  * columns sorted by name, rows sorted pandas-style (this CRASHES on
    array cells exactly like the driver — reported as ERR, queries must
    emit scalar columns only);
  * values compared dtype-sensitively via pandas hashing (int64 500 !=
    float64 500.0, as in the driver).

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [name ...]
"""
import datetime, json, sys, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def load_canon(df):
    # Normalize datetime-ish columns: pandas reads Spark parquet
    # timestamps at ns resolution and DATE columns as objects, while
    # duckdb .df() yields us resolution — the driver's hash is
    # resolution-insensitive (its round-1 results prove a01/q40/st01-03
    # green across exactly this difference), so fold both sides to ns.
    df = df.copy()
    for c in df.columns:
        k = str(df[c].dtype)
        if k.startswith("datetime64"):
            df[c] = df[c].astype("datetime64[ns]")
        elif k == "object":
            vals = df[c].dropna()
            if len(vals) and all(isinstance(v, (datetime.date,
                    datetime.datetime)) for v in vals.head(20)):
                df[c] = pd.to_datetime(df[c]).astype("datetime64[ns]")
    cols = sorted(df.columns)
    df = df[cols].sort_values(cols).reset_index(drop=True)
    return cols, df


def frame_hash(df):
    return pd.util.hash_pandas_object(df, index=False).tolist()


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    dumps = [os.path.basename(p) for p in glob.glob(os.path.join(out_dir, "*"))
             if os.path.isdir(p)]
    n_pass = n_fail = 0
    for name in sorted(set(oracles) | set(dumps)):
        if only and name not in only:
            continue
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"MISSING  {name} (no spark dump)")
            n_fail += 1
            continue
        if name not in oracles:
            # rows-only: the driver still sorts the dump in pandas, so an
            # array-typed column crashes there — reproduce that here.
            try:
                spark = pd.concat([pd.read_parquet(f) for f in files],
                                  ignore_index=True)
                load_canon(spark)
                print(f"ROWSONLY {name} ({len(spark)} rows)")
                n_pass += 1
            except Exception as e:
                print(f"ERR      {name}: comparator crash "
                      f"(driver-identical): {type(e).__name__}: {e}")
                n_fail += 1
            continue
        try:
            spark = pd.concat([pd.read_parquet(f) for f in files],
                              ignore_index=True)
            oracle = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}")
            n_fail += 1
            continue
        try:
            g_cols, g = load_canon(spark)
            e_cols, e = load_canon(oracle)
        except Exception as e:
            print(f"ERR      {name}: comparator crash (driver-identical): "
                  f"{type(e).__name__}: {e}")
            n_fail += 1
            continue
        if g_cols != e_cols:
            print(f"FAIL     {name}: columns {g_cols} vs {e_cols}")
            n_fail += 1
        elif len(g) != len(e):
            print(f"FAIL     {name}: {len(g)} vs {len(e)} rows")
            n_fail += 1
        elif frame_hash(g) != frame_hash(e):
            detail = []
            for c in g_cols:
                if not g[c].equals(e[c]):
                    if str(g[c].dtype) != str(e[c].dtype):
                        detail.append(
                            f"{c}: dtype {g[c].dtype} vs {e[c].dtype}")
                    else:
                        bad = g[c][g[c] != e[c]]
                        i = bad.index[0] if len(bad) else 0
                        detail.append(
                            f"{c}: row {i}: {g[c].iloc[i]!r} vs "
                            f"{e[c].iloc[i]!r}")
            print(f"FAIL     {name}: hash mismatch ({'; '.join(detail[:4])})")
            n_fail += 1
        else:
            print(f"PASS     {name} ({len(g)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
