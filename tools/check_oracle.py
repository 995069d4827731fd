#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
For each query in oracle_sql.json: run the SQL in DuckDB over the parquet
tables, load the Spark parquet result, sort columns by name, canonicalize
rows, and compare.
"""
import sys, os, json, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    def norm(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return f"{v:.6g}"
        if isinstance(v, (list, tuple)) or "ndarray" in type(v).__name__:
            return "[" + ",".join(norm(x) for x in v) + "]"
        return str(v)
    rows = sorted("|".join(norm(v) for v in row) for row in df.itertuples(index=False, name=None))
    return rows

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    # Cross-check the dump against the FULL registered query set: a query
    # that threw during Verify leaves no parquet dir, and walking only dirs
    # silently under-counts (rounds 5 and 6 both shipped shrunken records
    # this way). _QUERIES.json lists every SparkEntry.queries key;
    # _ERRORS.json carries the exception messages.
    qpath = os.path.join(out_dir, "_QUERIES.json")
    epath = os.path.join(out_dir, "_ERRORS.json")
    apath = os.path.join(out_dir, "_EMPTY_ALLOWED.json")
    registered = set(json.load(open(qpath))) if os.path.exists(qpath) else set()
    empty_ok = set(json.load(open(apath))) if os.path.exists(apath) else set()
    errs = json.load(open(epath)) if os.path.exists(epath) else {}
    dumped = {n for n in os.listdir(out_dir)
              if os.path.isdir(os.path.join(out_dir, n))}
    for name in sorted(registered - dumped):
        msg = errs.get(name, "no parquet dir and no recorded error")
        print(f"{'MISSING':>10} {name}: {msg[:160]}")
        n_fail += 1
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        # A query that fails mid-write leaves a partial dir (exists, no
        # readable parquet) — that must count as ONE failure, not abort the
        # whole compare and lose every other query's result.
        try:
            spark_df = pd.read_parquet(d)
        except Exception as e:
            msg = errs.get(name, str(e))
            print(f"{'READ_ERR':>10} {name}: {msg[:160]}")
            n_fail += 1
            continue
        if name not in oracle:
            status = "ROWS_ONLY" if len(spark_df) > 0 else "EMPTY!"
            print(f"{status:>10} {name} ({len(spark_df)} rows)")
            if status == "EMPTY!":
                n_fail += 1
            else:
                n_pass += 1
            continue
        try:
            duck_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            print(f"{'SQL_ERR':>10} {name}: {e}")
            n_fail += 1
            continue
        a, b = canon(spark_df), canon(duck_df)
        if sorted(spark_df.columns.str.lower()) != sorted(duck_df.columns.str.lower()):
            print(f"{'COLS':>10} {name}: spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}")
            n_fail += 1
        elif a == b:
            # Empty-vs-empty matches prove nothing: fail them unless the
            # query is explicitly allowlisted (SparkEntry.emptyAllowed).
            if len(a) == 0 and name not in empty_ok:
                print(f"{'VACUOUS':>10} {name}: 0 rows on both sides — "
                      "retune the query or allowlist it with a reason")
                n_fail += 1
            else:
                print(f"{'PASS':>10} {name} ({len(a)} rows)")
                n_pass += 1
        else:
            print(f"{'MISMATCH':>10} {name}: spark {len(a)} rows vs duck {len(b)} rows")
            only_a = [r for r in a if r not in set(b)][:3]
            only_b = [r for r in b if r not in set(a)][:3]
            for r in only_a:
                print(f"             spark-only: {r[:160]}")
            for r in only_b:
                print(f"             duck-only:  {r[:160]}")
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
