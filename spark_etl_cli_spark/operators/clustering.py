"""Deterministic fixed-iteration Lloyd k-means over embedding columns.

The classic Spark clustering shape: centroids are tiny (k x dim
doubles) and live on the driver; each Lloyd round is one distributed
assignment pass (distance to k broadcast centroid literals — pure
``zip_with``/``aggregate`` fold, no UDF) plus one per-(cluster, dim)
aggregation. Rows never shuffle by vector — only (cluster, dim,
micro-sum) triples cross the wire, k*dim rows total.

Cross-engine determinism (the reason this k-means can be
oracle-verified at all, unlike Spark ML's):

- init is data-deterministic (the k lowest-id vectors), not seeded RNG;
- squared distances are sequential left folds over doubles — same op
  order in DuckDB's ``list_sum(list_transform(...))``;
- ties in the argmin break to the lowest cluster id on both engines;
- centroid updates sum *integer micro-units* (``floor(x * 1000000)``),
  so the cross-row aggregation is exact regardless of row order; the
  only float steps (two divisions) are correctly rounded and mirrored.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MICRO = 1000000


def _dist2(vec_col: Column, centroid: list[float]) -> Column:
    diffs = F.zip_with(vec_col, F.lit(centroid), lambda x, y: (x - y) * (x - y))
    return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)


def _assign(vec_col: Column, cents: dict[int, list[float]]) -> Column:
    """Argmin cluster id, ties to the lowest id (CASE scans ascending)."""
    ordered = sorted(cents.items())
    dists = [(cl, _dist2(vec_col, cv)) for cl, cv in ordered]
    mn = F.least(*[d for _, d in dists]) if len(dists) > 1 else dists[0][1]
    expr = None
    for cl, d in dists:
        expr = F.when(d == mn, F.lit(cl)) if expr is None else expr.when(
            d == mn, F.lit(cl)
        )
    return expr


def kmeans_lloyd(
    df: DataFrame,
    *,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Run ``iters`` Lloyd rounds; return per-(cluster, dim) statistics
    of the final update: cluster_id, dim, n_points, sum_micros,
    mean_micro. Empty clusters drop out (both engines agree)."""
    pts = df.select(
        F.col(id_col).alias("__id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__v"),
    )
    # Seed = the k lowest-id vectors (LIMIT after sort, so any id
    # domain works — filter(id < k) would under-seed when ids don't
    # start near 0; mirrored by ORDER BY id LIMIT k in kmeans_sql).
    init = pts.orderBy("__id").limit(k).select("__id", "__v").collect()
    cents: dict[int, list[float]] = {int(r["__id"]): list(r["__v"]) for r in init}
    if not cents:
        raise ValueError("kmeans_lloyd: input has no vectors to seed from")

    def update(assigned: DataFrame) -> DataFrame:
        return (
            assigned.select("cl", F.posexplode("__v").alias("d", "x"))
            .groupBy("cl", "d")
            .agg(
                F.sum(F.floor(F.col("x") * MICRO).cast("bigint"))
                .cast("bigint")
                .alias("s"),
                F.count(F.lit(1)).cast("bigint").alias("n"),
            )
        )

    for it in range(iters):
        assigned = pts.withColumn("cl", _assign(F.col("__v"), cents))
        m = update(assigned)
        if it == iters - 1:
            return m.select(
                F.col("cl").cast("int").alias("cluster_id"),
                F.col("d").cast("int").alias("dim"),
                F.col("n").alias("n_points"),
                F.col("s").alias("sum_micros"),
                (F.col("s").cast("double") / F.col("n").cast("double")).alias(
                    "mean_micro"
                ),
            )
        new_cents: dict[int, dict[int, float]] = {}
        for row in m.collect():
            new_cents.setdefault(int(row["cl"]), {})[int(row["d"])] = (
                row["s"] / row["n"] / float(MICRO)
            )
        cents = {
            cl: [dims[d] for d in sorted(dims)]
            for cl, dims in new_cents.items()
        }
    raise AssertionError("iters must be >= 1")


def kmeans_sql(
    table_expr: str,
    *,
    k: int = 8,
    iters: int = 2,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB twin of :func:`kmeans_lloyd` (same fold order, same
    integer micro-unit updates, same argmin tie-break)."""

    def dist(v: str, cv: str) -> str:
        return (
            f"list_sum(list_transform(range(1, {dim + 1}), "
            f"i -> ({v}[i] - {cv}[i]) * ({v}[i] - {cv}[i])))"
        )

    def assign(csrc: str, name: str) -> str:
        return f"""
    {name} AS (
      SELECT {id_col}, v, cl FROM (
        SELECT x.*, ROW_NUMBER() OVER (
                 PARTITION BY {id_col} ORDER BY dist, cl) AS rn
        FROM (SELECT p.{id_col}, p.v, c.cl, {dist("p.v", "c.cv")} AS dist
              FROM pts p CROSS JOIN {csrc} c) x)
      WHERE rn = 1)"""

    def update(asrc: str, name: str) -> str:
        return f"""
    {name} AS (
      SELECT cl, i - 1 AS d,
             CAST(SUM(CAST(floor(v[i] * {MICRO}) AS BIGINT)) AS BIGINT) AS s,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM {asrc}, UNNEST(generate_series(1, {dim})) AS g(i)
      GROUP BY 1, 2)"""

    ctes = [
        f"""pts AS (
      SELECT {id_col}, list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS v
      FROM {table_expr})""",
        f"""c0 AS (SELECT {id_col} AS cl, v AS cv FROM pts
               ORDER BY {id_col} LIMIT {k})""",
    ]
    for it in range(iters):
        csrc = f"c{it}"
        ctes.append(assign(csrc, f"a{it + 1}").strip())
        ctes.append(update(f"a{it + 1}", f"m{it + 1}").strip())
        if it < iters - 1:
            ctes.append(
                f"""c{it + 1} AS (
      SELECT cl, list(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / {MICRO}.0
                      ORDER BY d) AS cv
      FROM m{it + 1} GROUP BY cl)""".strip()
            )
    sep = ",\n    "
    return f"""
    WITH {sep.join(ctes)}
    SELECT CAST(cl AS INT) AS cluster_id, CAST(d AS INT) AS dim,
           n AS n_points, s AS sum_micros,
           CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean_micro
    FROM m{iters}
    """
