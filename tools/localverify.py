#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/localverify.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<query>/ parquet (written by graft.Verify), runs the
matching oracle SQL from oracle_sql.json in DuckDB over the same sfDir tables,
then compares: columns sorted by name, rows sorted by all columns, values
hashed exactly (this mirrors the documented driver behavior).
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="first")
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    import os as _os

    con = duckdb.connect()
    for t in TABLES:
        # fixture tables are single files; StressGen/Spark-written corpora
        # are directories of part files — accept both so the gate can run
        # against target/stress variants too
        p = f"{sf_dir}/{t}.parquet"
        if _os.path.isdir(p):
            p = f"{p}/*.parquet"
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    import os

    # union of written dirs and declared oracles: a query that FAILED in
    # graft.Verify has an oracle key but no dir — that must count as FAIL,
    # not silently disappear from the gate
    dirs = {d for d in os.listdir(out_dir) if os.path.isdir(f"{out_dir}/{d}")}
    names = sorted(dirs | set(oracles))
    n_pass = n_fail = 0
    for name in names:
        if name not in dirs:
            print(f"FAIL {name}: no Spark output written (query failed in Verify)")
            n_fail += 1
            continue
        try:
            spark_df = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            n_fail += 1
            continue
        sql = oracles.get(name)
        if sql is None:
            status = "ROWS-ONLY"
            print(f"{status} {name}: rows={len(spark_df)}")
            continue
        try:
            oracle_rel = con.sql(sql)
            oracle_df = oracle_rel.df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        # dtype-strict schema compare at the DuckDB level (catches BIGINT vs
        # HUGEINT sums and TIMESTAMP vs TIMESTAMP WITH TIME ZONE, which the
        # driver's dtype-sensitive hash flags but a lax pandas compare hides)
        # list-of-pairs (not dict) so duplicate column names can't mask a
        # dtype mismatch; sorted by name to mirror the driver's column sort.
        # Plain integer widths are normalized to one family: the driver's
        # value hash treats INT32 == INT64 (q_window INTEGER-vs-BIGINT was
        # driver-green in r03) but NOT HUGEINT (pandas object/float) nor
        # timestamp flavors (naive/tz/ns all hash differently) — keep those
        # distinct.
        INT_FAMILY = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
                      "UTINYINT", "USMALLINT", "UINTEGER"}

        def norm(t: str) -> str:
            return "INT-FAMILY" if t in INT_FAMILY else t

        spark_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
        spark_types = sorted(zip(spark_rel.columns, (norm(str(t)) for t in spark_rel.types)))
        oracle_types = sorted(zip(oracle_rel.columns, (norm(str(t)) for t in oracle_rel.types)))
        if spark_types != oracle_types:
            # diff by column name (not positionally — a missing column would
            # misalign every later pair): multiset of types per name
            from collections import defaultdict

            by_name = defaultdict(lambda: ([], []))
            for c, t in spark_types:
                by_name[c][0].append(t)
            for c, t in oracle_types:
                by_name[c][1].append(t)
            diff = {c: (s_t, o_t) for c, (s_t, o_t) in sorted(by_name.items()) if s_t != o_t}
            print(f"FAIL {name}: dtype mismatch (spark, oracle): {diff}")
            n_fail += 1
            continue
        a, b = canon(spark_df), canon(oracle_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL {name}: columns {list(a.columns)} != {list(b.columns)}")
            n_fail += 1
            continue
        if len(a) != len(b):
            print(f"FAIL {name}: rows {len(a)} != {len(b)}")
            n_fail += 1
            continue
        try:
            # dtype gate is the DuckDB-level compare above (with the int-width
            # normalization); here int32-vs-int64 frames must still be able to
            # value-compare, so dtype is off but values are exact
            pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
            print(f"PASS {name}: rows={len(a)}")
            n_pass += 1
        except AssertionError as e:
            print(f"FAIL {name}: value mismatch:\n{str(e)[:800]}")
            n_fail += 1
    print(f"\n{n_pass} pass / {n_fail} fail / {len(names)} total")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
