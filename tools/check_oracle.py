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
            # Arrow-level dtype check first: the driver hash-compares
            # bit-identically, so a DuckDB type widening (e.g. sum(BIGINT)
            # -> HUGEINT) fails its gate even when values match. Catch it
            # here before the value compare papers over it.
            oa = con.sql(sql).arrow()
            sa = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").arrow()
            od = {f.name: str(f.type) for f in oa.schema}
            sd = {f.name: str(f.type) for f in sa.schema}
            dtype_diff = {k: (od.get(k), sd.get(k))
                          for k in set(od) | set(sd) if od.get(k) != sd.get(k)}
            if dtype_diff:
                raise AssertionError(f"arrow dtypes differ: {dtype_diff}")
            oracle = oa.to_pandas()
            spark = sa.to_pandas()
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
