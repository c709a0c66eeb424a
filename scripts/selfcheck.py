#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 scripts/selfcheck.py <sfDir> <verifyOutDir> [query ...]

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB against the
parquet tables in <sfDir>, sorts columns by name, and hash-compares values.

ORACLE CACHE: DuckDB results are cached under $GRAFT_ORACLE_CACHE
(default /tmp/graft_oracle_cache; set to empty to disable), keyed by
(query name, oracle-SQL hash, sfDir path, table file sizes+mtimes) —
q179's recursive-closure SQL alone costs ~35 min at sf0.1, which made
the second-scale-factor oracle leg too expensive to repeat; a re-run
now only pays for queries whose oracle text or input data changed.
The SPARK side is never cached — it is the thing under test.
"""
import sys, json, glob, os, hashlib
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    # only datetime UNIT is normalized (us vs ns is a pandas artifact);
    # integer width and int-vs-float are kept: the driver's hash compare is
    # dtype-sensitive, so a DuckDB HUGEINT materializing as float64 must
    # FAIL here even when the values are numerically equal.
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

def oracle_cache_path(cache_dir, name, sql, sf_dir):
    """Key covers everything the oracle result depends on: the SQL
    text, the data directory identity, and each table file's
    size+mtime (testdata is read-only, but a restaged twin at the same
    path must invalidate)."""
    h = hashlib.sha256()
    h.update(sql.encode())
    h.update(os.path.realpath(sf_dir).encode())
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            st = os.stat(p)
            h.update(f"{t}:{st.st_size}:{st.st_mtime_ns}".encode())
    return os.path.join(cache_dir, f"{name}-{h.hexdigest()[:20]}.pkl")

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    cache_dir = os.environ.get("GRAFT_ORACLE_CACHE",
                               "/tmp/graft_oracle_cache")
    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
    n_cached = 0
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            spark_df = canon(pd.concat([pd.read_parquet(f) for f in files]))
            cp = (oracle_cache_path(cache_dir, name, oracle[name], sf_dir)
                  if cache_dir else None)
            if cp and os.path.exists(cp):
                duck_df = pd.read_pickle(cp)
                n_cached += 1
            else:
                duck_df = canon(con.execute(oracle[name]).fetchdf())
                if cp:
                    # write-then-rename: a parallel selfcheck shard must
                    # never read a half-written pickle
                    tmp = f"{cp}.tmp.{os.getpid()}"
                    pd.to_pickle(duck_df, tmp)
                    os.replace(tmp, cp)
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL {name}: columns {list(spark_df.columns)} vs {list(duck_df.columns)}")
            n_fail += 1
        elif [str(t) for t in spark_df.dtypes] != [str(t) for t in duck_df.dtypes]:
            diffs = [f"{c}: {s} vs {d}" for c, s, d
                     in zip(spark_df.columns, spark_df.dtypes, duck_df.dtypes)
                     if str(s) != str(d)]
            print(f"FAIL {name}: dtype mismatch ({'; '.join(diffs)})")
            n_fail += 1
        elif len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows {len(spark_df)} vs {len(duck_df)}")
            n_fail += 1
        else:
            try:
                pd.testing.assert_frame_equal(spark_df, duck_df,
                                              check_dtype=False, rtol=1e-9, atol=1e-9)
                print(f"PASS {name} ({len(spark_df)} rows)")
                n_pass += 1
                continue
            except AssertionError as e:
                print(f"FAIL {name}: value mismatch: {str(e)[:300]}")
                n_fail += 1
    if cache_dir and n_cached:
        print(f"(oracle cache: {n_cached} hit(s) from {cache_dir})")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
