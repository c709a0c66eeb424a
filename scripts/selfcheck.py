#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 scripts/selfcheck.py <sfDir> <verifyOutDir> [query ...]
       python3 scripts/selfcheck.py --write-digests <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB against the
parquet tables in <sfDir>, sorts columns by name, and hash-compares values.

ORACLE CACHE: DuckDB results are cached under $GRAFT_ORACLE_CACHE
(default <repo>/.oracle_cache — durable across VM recycles, gitignored;
set to empty to disable), keyed by (query name, oracle-SQL hash, sfDir
path, table file sizes+mtimes, CACHE_VERSION, duckdb + pandas versions)
— q179's recursive-closure SQL alone costs ~35 min at sf0.1, which made
the second-scale-factor oracle leg too expensive to repeat; a re-run
now only pays for queries whose oracle text or input data changed.
The version components (ADVICE r15) make a canon() change or a DuckDB/
pandas upgrade invalidate the cache instead of silently re-serving
results canonicalized under the old rules.

COMMITTED DIGESTS (VERDICT r15 #1): even a durable cache dir dies with
the workspace; scripts/oracle_digests/<sftag>.json (committed) carries,
per query, the full cache key and a sha256 over the CANONICAL
serialization of the oracle result. On a cold cache, a query whose
digest key matches is checked by digesting the SPARK output the same
way: digest-equal -> PASS without ever invoking DuckDB; digest-mismatch
falls through to a real DuckDB run as the adjudicator (the digest is an
exact-match fast path; the tolerance compare stays authoritative).
Regenerate with --write-digests after oracle/data changes (cache-hit
fast when the cache is warm).
"""
import sys, json, glob, os, hashlib, io
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

# Bump whenever canon() (rounding digits, datetime-unit normalization,
# dtype handling) or digest_df()'s serialization changes — the cache
# stores POST-canon frames, so stale canonicalization is invisible
# downstream (ADVICE r15).
CACHE_VERSION = 2

REPO_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DIGEST_DIR = os.path.join(REPO_DIR, "scripts", "oracle_digests")


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


def cache_key(sql, sf_dir):
    """Everything the CACHED FRAME depends on: the SQL text, the data
    directory identity, each table file's size+mtime (testdata is
    read-only, but a restaged twin at the same path must invalidate),
    and the canonicalization environment (CACHE_VERSION + duckdb +
    pandas versions — the pickle stores a post-canon frame)."""
    h = hashlib.sha256()
    h.update(f"v{CACHE_VERSION}:duckdb{duckdb.__version__}:"
             f"pandas{pd.__version__.split('.')[0]}:".encode())
    h.update(sql.encode())
    h.update(os.path.realpath(sf_dir).encode())
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            st = os.stat(p)
            h.update(f"{t}:{st.st_size}:{st.st_mtime_ns}".encode())
    return h.hexdigest()[:20]


def oracle_cache_path(cache_dir, name, sql, sf_dir):
    return os.path.join(cache_dir, f"{name}-{cache_key(sql, sf_dir)}.pkl")


_content_hash_memo = {}


def file_content_key(p):
    """Full-content sha256 (memoized per size+mtime within a run).
    Testdata totals ~17 MB at sf0.1 — hashing is <0.1 s once."""
    st = os.stat(p)
    mk = (p, st.st_size, st.st_mtime_ns)
    v = _content_hash_memo.get(mk)
    if v is None:
        h = hashlib.sha256()
        with open(p, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
        v = h.hexdigest()[:16]
        _content_hash_memo[mk] = v
    return v


def data_key(sql, sf_dir):
    """Key for the COMMITTED digests: like cache_key but the data
    identity is CONTENT (size + sha256 of the bytes), not path/mtime —
    a byte-identical restage on a new machine must still hit the
    committed cold-cache fast path (ADVICE r16: mtime keys silently
    defeated it)."""
    h = hashlib.sha256()
    h.update(f"v{CACHE_VERSION}:duckdb{duckdb.__version__}:"
             f"pandas{pd.__version__.split('.')[0]}:".encode())
    h.update(sql.encode())
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            st = os.stat(p)
            h.update(f"{t}:{st.st_size}:{file_content_key(p)}".encode())
    return h.hexdigest()[:20]


def digest_df(df: pd.DataFrame) -> str:
    """sha256 over an exact serialization of a CANONICAL frame: column
    names + dtypes as a JSON header, then CSV of the values (floats are
    post-round(9) shortest-repr — deterministic for a given value)."""
    h = hashlib.sha256()
    h.update(json.dumps([[c, str(t)] for c, t
                         in zip(df.columns, df.dtypes)]).encode())
    buf = io.StringIO()
    df.to_csv(buf, index=False)
    h.update(buf.getvalue().encode())
    return h.hexdigest()


def digest_file(sf_dir):
    return os.path.join(DIGEST_DIR,
                        os.path.basename(os.path.realpath(sf_dir)) + ".json")


def main():
    write_digests = "--write-digests" in sys.argv
    argv = [a for a in sys.argv[1:] if a != "--write-digests"]
    sf_dir, out_dir = argv[0], argv[1]
    only = set(argv[2:])
    cache_dir = os.environ.get("GRAFT_ORACLE_CACHE",
                               os.path.join(REPO_DIR, ".oracle_cache"))
    if cache_dir:
        os.makedirs(cache_dir, exist_ok=True)
    digests = {}
    dpath = digest_file(sf_dir)
    if os.path.exists(dpath):
        digests = json.load(open(dpath))
    new_digests = {}
    n_cached = n_digest = n_keymiss = 0
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
            key = cache_key(oracle[name], sf_dir)
            cp = (os.path.join(cache_dir, f"{name}-{key}.pkl")
                  if cache_dir else None)
            dent = digests.get(name)
            dkey = data_key(oracle[name], sf_dir) if dent or write_digests \
                else None
            if dent and dent.get("key") != dkey:
                n_keymiss += 1
            if cp and os.path.exists(cp):
                duck_df = pd.read_pickle(cp)
                n_cached += 1
            elif (not write_digests and dent
                  and dent.get("key") == dkey
                  and digest_df(spark_df) == dent.get("digest")):
                # cold cache, committed digest matches the spark output
                # exactly -> PASS without DuckDB (exact match implies
                # the tolerance compare would also pass)
                print(f"PASS {name} ({len(spark_df)} rows) [digest]")
                n_pass += 1
                n_digest += 1
                continue
            else:
                duck_df = canon(con.execute(oracle[name]).fetchdf())
                if cp:
                    # write-then-rename: a parallel selfcheck shard must
                    # never read a half-written pickle
                    tmp = f"{cp}.tmp.{os.getpid()}"
                    pd.to_pickle(duck_df, tmp)
                    os.replace(tmp, cp)
            if write_digests:
                new_digests[name] = {"key": dkey,
                                     "digest": digest_df(duck_df),
                                     "rows": len(duck_df)}
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
    if n_digest:
        print(f"(committed digests: {n_digest} cold-cache PASS(es) "
              f"from {dpath})")
    if n_keymiss:
        print(f"(WARN: {n_keymiss} committed digest key(s) MISMATCHED — "
              f"oracle SQL, data content, or duckdb/pandas/canon env "
              f"changed since --write-digests; those queries fell back "
              f"to cache/DuckDB. Regenerate: selfcheck.py "
              f"--write-digests {sf_dir} {out_dir})")
    if write_digests and not only and not n_fail:
        os.makedirs(DIGEST_DIR, exist_ok=True)
        tmp = f"{dpath}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(new_digests, f, indent=1, sort_keys=True)
            f.write("\n")
        os.replace(tmp, dpath)
        print(f"(wrote {len(new_digests)} digests to {dpath})")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
