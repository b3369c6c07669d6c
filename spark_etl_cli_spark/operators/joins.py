"""Join-acceleration operators: bloom-filter semi-join pruning and
bin-packed pure range joins.

Both address join shapes that hurt at 100 TB:

- **bloom_semi_prune** — the explicit form of runtime row-level
  filtering: build a bloom filter over the (small) key side, broadcast
  it, and drop non-matching fact rows *before* the join's shuffle.
  Spark's own version (``spark.sql.optimizer.runtime.bloomFilter``)
  only triggers inside AQE on shuffle-join shapes it recognizes; this
  operator makes the reduction available anywhere — ahead of an
  aggregation, a sort, or a join the optimizer planned differently.
  Built entirely from public expressions (``xxhash64``, ``bit_or``,
  array probes), since ``bloom_filter_agg`` is not a registered SQL
  function.

- **range_join_binned** — Spark plans a join whose only predicate is
  ``point BETWEEN lo AND hi`` as BroadcastNestedLoopJoin (small right
  side) or a cartesian product (both large): quadratic. Binning maps
  each interval to the fixed-width bins it covers and each point to its
  one bin, turning the join into a hash equi-join on the bin id with
  the BETWEEN kept as a residual filter — the standard interval-join
  decomposition (cf. the reference's interval joins, which always carry
  an equi key: ``etl/src/test/scala/dev/mauch/spark/dfio/ETLTest.scala:143-157``).

The reference itself implements no join operators (everything arrives
via ``sql://`` —
``core/src/main/scala/dev/mauch/spark/dfio/TransformerParser.scala:22-31``);
these are north-star extensions.
"""

from __future__ import annotations

import math
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Broadcast-sanity cap: 2^24 bits = 2 MiB per filter.
_MAX_BITS = 1 << 24


def bloom_params(expected_items: int, fpp: float) -> tuple[int, int]:
    """Standard sizing: bits m = -n ln p / ln2², hashes k = m/n ln2."""
    n = max(expected_items, 1)
    n_bits = int(-n * math.log(fpp) / (math.log(2) ** 2))
    n_bits = max(64, min(_MAX_BITS, n_bits))
    n_bits -= n_bits % 64
    n_hashes = max(1, min(8, round(n_bits / n * math.log(2))))
    return n_bits, n_hashes


def bloom_build(
    keys: DataFrame, key_col: str, n_bits: int, n_hashes: int
) -> DataFrame:
    """Bloom filter over ``keys[key_col]`` as a one-row DataFrame with
    column ``__bf: array<bigint>`` (``n_bits/64`` words).

    One tiny shuffle: k bit positions per key, ``bit_or``-folded per
    64-bit word (at most n_bits/64 groups), densified into one array
    row. Hash family: ``xxhash64(key, i)`` for i in 0..k-1.
    """
    n_words = n_bits // 64
    pos = F.explode(
        F.array(
            *[
                F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(n_bits))
                for i in range(n_hashes)
            ]
        )
    ).alias("__bf_pos")
    words = (
        keys.select(pos)
        .select(
            F.shiftright(F.col("__bf_pos"), 6).cast("int").alias("__w"),
            # variable shift counts need the SQL form; the pyspark
            # shiftleft wrapper only accepts an int literal
            F.expr(
                "shiftleft(1L, CAST(pmod(__bf_pos, 64) AS INT))"
            ).alias("__m"),
        )
        .groupBy("__w")
        .agg(F.bit_or("__m").alias("__m"))
    )
    return words.agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("__w"), F.col("__m")))
        ).alias("__wm")
    ).select(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_words - 1)),
            lambda i: F.coalesce(
                F.element_at(F.col("__wm"), i), F.lit(0).cast("long")
            ),
        ).alias("__bf")
    )


def bloom_might_contain(
    key_expr: str, bf_col: str, n_bits: int, n_hashes: int
) -> Column:
    """True iff every hash bit of ``key_expr`` is set in ``bf_col``.

    ``key_expr`` is a SQL expression string (column name or
    expression); k O(1) array reads per row, all codegen'd.
    """
    checks = []
    for i in range(n_hashes):
        p = f"pmod(xxhash64({key_expr}, {i}), {n_bits})"
        checks.append(
            F.expr(
                f"(element_at({bf_col}, CAST(shiftright({p}, 6) AS INT) + 1)"
                f" & shiftleft(1L, CAST(pmod({p}, 64) AS INT))) != 0"
            )
        )
    return reduce(lambda a, b: a & b, checks)


def bloom_semi_prune(
    fact: DataFrame,
    keys: DataFrame,
    fact_key: str,
    dim_key: str | None = None,
    expected_items: int | None = None,
    fpp: float = 0.01,
) -> DataFrame:
    """Drop fact rows whose key cannot appear in ``keys[dim_key]``.

    No false negatives (every row that would survive a join on the key
    survives pruning) and a bounded false-positive rate — so
    ``bloom_semi_prune(fact, keys) JOIN keys`` returns exactly the rows
    of ``fact JOIN keys`` while shuffling only ~fpp of the non-matching
    volume. The filter travels as a one-row broadcast cross join.

    ``expected_items``: filter-sizing hint. When omitted, one
    ``count()`` job on ``keys`` determines it (fine for a dim table;
    pass explicitly on hot paths).
    """
    dim_key = dim_key or fact_key
    if expected_items is None:
        expected_items = keys.count()
    n_bits, n_hashes = bloom_params(expected_items, fpp)
    bf = bloom_build(keys.select(dim_key), dim_key, n_bits, n_hashes)
    keep = bloom_might_contain(fact_key, "__bf", n_bits, n_hashes)
    return fact.crossJoin(F.broadcast(bf)).filter(keep).drop("__bf")


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: int,
) -> DataFrame:
    """Inner join on ``left.point BETWEEN right.lo AND right.hi``
    (inclusive, numeric columns) as a hash equi-join on bin ids.

    Each right interval is exploded to the ``(hi-lo)/bin_width + 1``
    bins it covers; each left point maps to exactly one bin. The join
    then has an equi key (the bin), so Catalyst plans a shuffled-hash /
    sort-merge / broadcast-hash join instead of a nested loop; the
    BETWEEN survives as a cheap residual filter. Output = left columns
    + right columns.

    Pick ``bin_width`` near the typical interval length: right-side row
    duplication stays ~2x and each left row meets only the intervals
    overlapping its bin. Degenerate inputs (intervals orders of
    magnitude wider than ``bin_width``) multiply the right side
    accordingly — cap or split such intervals upstream. Intervals with
    ``lo > hi`` are dropped (empty by definition). Values must stay
    within 2^52/bin_width so the double-division floor is exact.
    """
    overlap = set(left.columns) & {lo_col, hi_col}
    if overlap:
        raise ValueError(f"left/right column collision: {sorted(overlap)}")
    w = F.lit(bin_width)
    r = right.filter(F.col(lo_col) <= F.col(hi_col)).withColumn(
        "__bin",
        F.explode(
            F.sequence(F.floor(F.col(lo_col) / w), F.floor(F.col(hi_col) / w))
        ),
    )
    l_binned = left.withColumn("__bin", F.floor(F.col(point_col) / w))
    return (
        l_binned.join(r, on="__bin")
        .filter(
            (F.col(point_col) >= F.col(lo_col))
            & (F.col(point_col) <= F.col(hi_col))
        )
        .drop("__bin")
    )
