#!/usr/bin/env python
"""Dump .explain("formatted") for named queries to plans/<tag>/<query>_<suffix>.txt.

Usage: python scripts/dump_plans.py --tag r10 --suffix before [-q name ...]
Plan-only: builds each DataFrame and formats its plan; nothing executes.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r10")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("-q", "--query", action="append", required=True)
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from spark_etl_cli_spark.session import get_spark

    queries = entrymod.queries()
    spark = get_spark(app_name="dump_plans")
    out_dir = Path(__file__).resolve().parent.parent / "plans" / args.tag
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in args.query:
        df = queries[name](spark, args.sf)
        txt = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
        (out_dir / f"{name}_{args.suffix}.txt").write_text(txt)
        print(f"wrote {name}_{args.suffix}.txt ({len(txt)} bytes)")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
