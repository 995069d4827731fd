#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir>

Runs each oracle_sql.json query in DuckDB over the sf_dir parquet tables,
loads the corresponding Spark parquet result, canonicalizes both (columns
sorted by name, rows sorted by all columns), and compares values exactly.
Reports per-query PASS/FAIL with a diff sample on mismatch.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # lists aren't sortable/hashable -> compare via stable repr
    for c in df.columns:
        if df[c].map(lambda v: isinstance(v, (list, tuple)) or
                     getattr(v, "__len__", None) is not None and
                     not isinstance(v, (str, bytes))).any():
            df[c] = df[c].map(lambda v: json.dumps(list(v), default=str)
                              if v is not None and
                              not isinstance(v, (str, bytes, float, int)) else v)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def main(out_dir: str, sf_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_fail = 0
    for name, sql in sorted(oracles.items()):
        try:
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
            exp = con.execute(sql).fetchdf()
            g, e = canon(got), canon(exp)
            if list(g.columns) != list(e.columns):
                print(f"FAIL {name}: columns {list(g.columns)} != {list(e.columns)}")
                n_fail += 1
                continue
            if len(g) != len(e):
                print(f"FAIL {name}: rows {len(g)} != {len(e)}")
                n_fail += 1
                continue
            # exact compare after canonicalization (dtypes coerced pairwise)
            bad = None
            for c in g.columns:
                gc, ec = g[c], e[c]
                try:
                    eq = (gc.astype("object").where(gc.notna(), None) ==
                          ec.astype("object").where(ec.notna(), None)) | (gc.isna() & ec.isna())
                except Exception:
                    eq = gc.astype(str) == ec.astype(str)
                if not eq.all():
                    bad = c
                    idx = eq[~eq].index[:3]
                    print(f"FAIL {name}: col {c} mismatch at rows {list(idx)}")
                    for i in idx:
                        print(f"   got={gc[i]!r} exp={ec[i]!r}")
                    break
            if bad is None:
                print(f"PASS {name} ({len(g)} rows)")
            else:
                n_fail += 1
        except Exception as ex:
            print(f"ERROR {name}: {ex}")
            n_fail += 1
    print(f"\n{len(oracles) - n_fail}/{len(oracles)} passed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
