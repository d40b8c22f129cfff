#!/usr/bin/env python3
"""Local mimic of the driver's t2 DuckDB-oracle gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query dumped by `graft.Verify` into <verifyOutDir>/<name>/ with an
entry in oracle_sql.json: register every parquet table from <sfDir> as a
DuckDB view, run the oracle SQL, and compare against the Spark parquet output
— columns sorted by name, rows sorted by all columns, exact value equality
(the driver hash-compares, so any diff is a fail).
"""
import json
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    for name, sql in sorted(oracles.items()):
        try:
            oracle = con.sql(sql).df()
            spark = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
            o = oracle.reindex(sorted(oracle.columns), axis=1)
            s = spark.reindex(sorted(spark.columns), axis=1)
            if list(o.columns) != list(s.columns):
                raise AssertionError(f"columns differ: oracle={list(o.columns)} spark={list(s.columns)}")
            o = o.sort_values(by=list(o.columns), ignore_index=True)
            s = s.sort_values(by=list(s.columns), ignore_index=True)
            if len(o) != len(s):
                raise AssertionError(f"row counts differ: oracle={len(o)} spark={len(s)}")
            import pandas as pd
            pd.testing.assert_frame_equal(o, s, check_dtype=False, check_exact=True)
            print(f"PASS {name} ({len(o)} rows)")
        except Exception as e:
            failed.append(name)
            msg = str(e).replace("\n", " | ")[:400]
            print(f"FAIL {name}: {msg}")
    print(f"\n{len(oracles) - len(failed)}/{len(oracles)} queries match")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
