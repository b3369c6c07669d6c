#!/usr/bin/env python
"""Measure the BPE serial/distributed crossover (r10 VERDICT item 6).

Times bpe_train's two execution modes over synthetic word-frequency
tables of increasing size (words drawn from a Zipf-ish synthetic
vocabulary, so pair distributions are realistic), forcing each path
via the serial_symbols_max gate. Prints a table of
(n_words, total_symbols, serial_sec, distributed_sec); the measured
crossover justifies the operator's default threshold (SCALE.md).

Usage: python scripts/bpe_crossover.py [n_words ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    from pyspark.sql import functions as F

    from spark_etl_cli_spark.operators.encoding import bpe_train
    from spark_etl_cli_spark.session import get_spark

    sizes = [int(a) for a in sys.argv[1:]] or [50_000, 200_000, 500_000]
    spark = get_spark(app_name="bpe_crossover")
    print(f"{'n_words':>10} {'symbols':>12} {'serial_s':>9} {'dist_s':>9}")
    for n in sizes:
        # synthetic corpus: one "document" per word, weighted by a
        # Zipf-ish repeat count so merge ranks are non-degenerate.
        # Words are letter 5-9-grams derived from the row id.
        docs = (
            spark.range(n)
            .select(
                F.concat_ws(
                    " ",
                    *[
                        F.substring(
                            F.translate(
                                F.conv(
                                    (F.col("id") * (i * 2654435761 + 97))
                                    % 26**7,
                                    10,
                                    26,
                                ),
                                "0123456789ABCDEFGHIJKLMNOP",
                                "abcdefghijklmnopqrstuvwxyz",
                            ),
                            1,
                            5 + (i % 5),
                        )
                        for i in range(1, 4)
                    ],
                ).alias("text")
            )
        )
        stats = {}
        for mode, gate in (("serial", 1 << 62), ("dist", 0)):
            t0 = time.time()
            out = bpe_train(docs, n_merges=20, serial_symbols_max=gate)
            rows = out.collect()
            stats[mode] = time.time() - t0
            stats[f"{mode}_rows"] = len(rows)
        # total symbols = sum over distinct words of len(word)+1
        from spark_etl_cli_spark.functions.text import tokens

        syms = (
            docs.select(F.explode(tokens(F.lower(F.col("text")))).alias("w"))
            .filter((F.length("w") > 0) & (F.length("w") <= 32))
            .groupBy("w")
            .count()
            .agg(F.sum(F.length("w") + 1))
            .head()[0]
        )
        assert stats["serial_rows"] == stats["dist_rows"]
        print(
            f"{n:>10} {syms:>12} {stats['serial']:>9.2f} {stats['dist']:>9.2f}"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
