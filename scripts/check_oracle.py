#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate.

Usage: python3 scripts/check_oracle.py [sfDir] [outDir]

Runs DuckDB on each SparkEntry.oracleSql entry (tables registered as views
over the sfDir parquet files) and compares against the parquet dumped by
graft.Verify: columns sorted by name, rows sorted by all columns, values
compared exactly (floats: exact bit compare first, then report max abs diff).
"""
import json
import math
import sys
from collections import Counter

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def main():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    oracle = json.load(open(f"{OUT_DIR}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_fail += 1
            continue
        try:
            got = con.sql(
                f"SELECT * FROM '{OUT_DIR}/{name}/*.parquet'").df()
        except Exception as e:
            print(f"FAIL {name}: spark dump missing: {e}")
            n_fail += 1
            continue
        exp = exp.reindex(sorted(exp.columns), axis=1)
        got = got.reindex(sorted(got.columns), axis=1)
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns differ\n  oracle: {list(exp.columns)}\n  spark:  {list(got.columns)}")
            n_fail += 1
            continue
        if list(exp.dtypes) != list(got.dtypes):
            print(f"FAIL {name}: dtypes differ\n  oracle: {dict(exp.dtypes)}\n  spark:  {dict(got.dtypes)}")
            n_fail += 1
            continue
        if len(exp) != len(got):
            print(f"FAIL {name}: row count differs oracle={len(exp)} spark={len(got)}")
            n_fail += 1
            continue
        exp_rows = [tuple(norm(v) for v in r) for r in exp.itertuples(index=False)]
        got_rows = [tuple(norm(v) for v in r) for r in got.itertuples(index=False)]
        exp_rows.sort(key=repr)
        got_rows.sort(key=repr)
        if exp_rows == got_rows:
            print(f"PASS {name} ({len(exp)} rows)")
            n_pass += 1
        else:
            # Diff as multisets: one shifted value would misalign a
            # positional zip and print spurious pairs.
            exp_c, got_c = Counter(exp_rows), Counter(got_rows)
            only_exp = list((exp_c - got_c).elements())
            only_got = list((got_c - exp_c).elements())
            print(f"FAIL {name}: {len(only_exp)} oracle-only / "
                  f"{len(only_got)} spark-only rows; first:")
            for r in only_exp[:3]:
                print(f"  oracle-only: {r}")
            for r in only_got[:3]:
                print(f"  spark-only:  {r}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
