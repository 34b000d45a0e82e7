"""Local replica of the driver's t2 correctness gate.

Runs every ``queries()`` entry at sf0.01 and compares against its
``oracle_sql()`` via DuckDB: row count, column names, and an
order-insensitive value comparison (columns sorted by name, rows sorted).

Usage: python tools/check_oracle.py [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


class UnhashableOutput(Exception):
    """Raised when a gate query outputs a column the driver's pandas
    hasher cannot hash (list/dict/set → TypeError: unhashable type)."""


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # Driver-strict: the driver's hash is float-exact (no rounding
        # tolerance).  Exact repr here makes local red ⇔ driver red.
        return repr(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, dict, set)):
        # The driver's pandas-based hasher crashes on non-scalar output
        # columns (CORRECTNESS_r02: "TypeError: unhashable type: 'list'").
        # Replicate that failure locally so it never reaches the driver.
        raise UnhashableOutput(
            f"non-scalar output value {type(v).__name__}: project arrays/"
            "maps to to_json/concat_ws in the gate output"
        )
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return repr(v)


def rowset(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon(r[i]) for i in idx) for r in rows)


def main() -> int:
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    only = set(sys.argv[1:])
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.materialize import (  # noqa: E501
                release_checkpoints,
            )

            release_checkpoints(spark)
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"OK?  {name}: rows-only ({len(srows)} rows, {dt:.1f}s) "
                  f"cols={scols}")
            continue
        try:
            orel = con.sql(oracles[name])
            ocols = orel.columns
            orows = orel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failures += 1
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
        if not problems:
            try:
                sset = rowset(scols, srows)
                oset = rowset(ocols, orows)
            except UnhashableOutput as e:
                problems.append(f"driver-unhashable output: {e}")
                sset = oset = None
            if sset is not None and sset != oset:
                diff = [
                    (a, b) for a, b in zip(sset, oset) if a != b
                ][:3]
                problems.append(f"values differ, first diffs: {diff}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failures += 1
        else:
            print(f"PASS {name} ({len(srows)} rows, {dt:.1f}s)")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
