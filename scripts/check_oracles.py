#!/usr/bin/env python
"""Local replica of the driver's correctness gate.

Runs every __spark_entry__.queries() entry on Spark and its
oracle_sql() twin on DuckDB over the same parquet tables, then compares
row count, column names, and an order-insensitive value multiset.
Floats are compared exactly (bit-for-bit after float()) — stricter than
any reasonable driver hash, so passing here is a safe margin.

Usage:
  python scripts/check_oracles.py [--sf DIR] [-q NAME ...] [--tol 0]
"""

from __future__ import annotations

import argparse
import math
import sys
import time
from collections import Counter

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(value, float_round: int | None):
    if value is None:
        return None
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        return round(value, float_round) if float_round is not None else value
    if isinstance(value, (list, tuple)):
        return tuple(canon(v, float_round) for v in value)
    try:
        import datetime

        if isinstance(value, datetime.datetime):
            return value.replace(tzinfo=None).isoformat()
        if isinstance(value, datetime.date):
            return value.isoformat()
    except Exception:
        pass
    try:
        from decimal import Decimal

        if isinstance(value, Decimal):
            return float(value)
    except Exception:
        pass
    return value


def row_multiset(cols: list[str], rows: list[tuple], float_round: int | None) -> Counter:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(canon(r[i], float_round) for i in order) for r in rows)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("-q", "--query", action="append", default=None)
    ap.add_argument("--float-round", type=int, default=None,
                    help="round floats to N digits before compare (default: exact)")
    ap.add_argument("--keep-going", action="store_true")
    args = ap.parse_args()

    import duckdb

    import __spark_entry__ as entrymod
    from spark_etl_cli_spark.session import get_spark

    spark = get_spark(app_name="check_oracles")

    con = duckdb.connect()
    for tbl in TABLES:
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM '{args.sf}/{tbl}.parquet'"
        )

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = args.query or list(queries)
    failures = []
    vacuous = []
    for name in names:
        fn = queries[name]
        t0 = time.time()
        try:
            sdf = fn(spark, args.sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            if not args.keep_going:
                return 1
            continue
        spark_t = time.time() - t0
        if name not in oracles:
            probe = srows[0] if srows else ()
            arr = [
                scols[i]
                for i, v in enumerate(probe)
                if isinstance(v, (list, dict, set))
            ]
            note = f" ARRAY-COLS={arr}" if arr else ""
            print(f"OK*   {name}: rows={len(srows)} cols={scols} "
                  f"({spark_t:.1f}s) [no oracle — rows-only]{note}")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            if not args.keep_going:
                return 1
            continue
        problems = []
        # The driver canonicalizes via pandas sort_values, which cannot
        # hash list/dict cells — any array/map-typed output column is a
        # guaranteed red row there, even if values match. Flag locally.
        probe = srows[0] if srows else ()
        bad_cols = [
            scols[i]
            for i, v in enumerate(probe)
            if isinstance(v, (list, dict, set))
        ]
        if bad_cols:
            problems.append(
                f"array/map-typed output cols {bad_cols} "
                "(driver canonicalizer cannot hash these — stringify)"
            )
        if len(srows) != len(orows):
            problems.append(f"row count {len(srows)} != {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} != {sorted(ocols)}")
        if not problems:
            sm = row_multiset(scols, srows, args.float_round)
            om = row_multiset(ocols, orows, args.float_round)
            if sm != om:
                diff_s = list((sm - om).items())[:3]
                diff_o = list((om - sm).items())[:3]
                problems.append(f"values differ; spark-only={diff_s} oracle-only={diff_o}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            failures.append(name)
            if not args.keep_going:
                return 1
        elif len(srows) == 0:
            # A 0 = 0 multiset match is vacuous: it cannot distinguish a
            # correct plan from one whose filter is always false (r6
            # demerit: q158). Surface it loudly; the query should be
            # retuned so the gate-scale result has rows.
            vacuous.append(name)
            print(f"WARN  {name}: rows=0 on BOTH engines — vacuous oracle "
                  f"pass ({spark_t:.1f}s)")
        else:
            print(f"OK    {name}: rows={len(srows)} ({spark_t:.1f}s)")
    print(f"\n{len(names) - len(failures)}/{len(names)} passed")
    if vacuous:
        print(f"VACUOUS (0-row oracle pairs, retune these): {vacuous}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
