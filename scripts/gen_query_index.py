#!/usr/bin/env python
"""Regenerate QUERIES.md — the full query-library index.

One row per registered query: name, defining module:line, oracle
presence, and the first comment/docstring line above the function
(the intent line). Run after adding queries:

  python scripts/gen_query_index.py > QUERIES.md
"""

from __future__ import annotations

import inspect
import re
import sys

sys.path.insert(0, ".")


def intent_line(fn) -> str:
    """First '# --- qNN: ...' banner line above the function, else the
    docstring's first line, else ''. """
    try:
        src_file = inspect.getsourcefile(fn)
        lineno = fn.__code__.co_firstlineno
        lines = open(src_file).read().splitlines()
    except (OSError, TypeError):
        return ""
    # walk up past the decorator call to the banner comment
    for i in range(lineno - 2, max(lineno - 40, -1), -1):
        m = re.match(r"#\s*---\s*q\d+[a-z_]*:\s*(.+?)\s*-*\s*$", lines[i])
        if m:
            return m.group(1).rstrip("- ").strip()
    doc = inspect.getdoc(fn)
    return doc.splitlines()[0] if doc else ""


def main() -> int:
    from spark_etl_cli_spark.plans import all_queries  # noqa: F401
    from spark_etl_cli_spark.plans.registry import ORACLES, QUERIES

    def qnum(name: str) -> int:
        digits = "".join(c for c in name[1:] if c.isdigit() or c == "_")
        try:
            return int(digits.split("_")[0])
        except ValueError:
            return 999

    print("# QUERIES — the full oracle-paired query library")
    print()
    n_q, n_o = len(QUERIES), len(ORACLES)
    cov = "every one" if n_o == n_q else f"{n_o}"
    print(
        f"{n_q} registered queries, {cov} with a full"
        " DuckDB value-hash oracle. Regenerate with"
        " `python scripts/gen_query_index.py > QUERIES.md`."
    )
    print()
    print("| query | defined at | oracle | what it demonstrates |")
    print("|---|---|---|---|")
    for name in sorted(QUERIES, key=lambda n: (qnum(n), n)):
        fn = QUERIES[name]
        mod = fn.__module__.rsplit(".", 1)[-1]
        line = fn.__code__.co_firstlineno
        oracle = "full" if name in ORACLES else "—"
        print(f"| {name} | `plans/{mod}.py:{line}` | {oracle} | {intent_line(fn)} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
