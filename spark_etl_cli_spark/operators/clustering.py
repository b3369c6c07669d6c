"""Deterministic fixed-iteration Lloyd k-means over embedding columns.

The classic Spark clustering shape: centroids are tiny (k x dim
doubles) and live on the driver; each Lloyd round is ONE Arrow stage
(assignment against the k centroids + per-batch partial micro-unit
update sums — guide §4.2) plus a k*dim-row final aggregation. Rows
never shuffle by vector — only (cluster, dim, micro-sum) partials
cross the wire. ``_dist2``/``_assign`` keep the JVM-expression twin of
the assignment for the bit-equality regression test.

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


def _assign_update_arrow(pts: DataFrame, cents: dict[int, list[float]]) -> DataFrame:
    """One Lloyd round — assignment + per-batch partial update — in ONE
    Arrow stage, then a k*dim-row final aggregation.

    The vectorized twin of ``_assign`` + the posexplode/groupBy update
    (guide §4.2: Spark does not codegen higher-order-function bodies, so
    the k×dim distance folds cost an interpreter dispatch per element —
    the dominant term of the assignment pass — and the 64× posexplode
    multiplies the exchange input). Bit-identical by construction:

    - distances accumulate in the exact element order of the JVM left
      fold — per dimension one IEEE subtract, multiply, add, no FMA;
    - the argmin scans cluster ids ascending and keeps the FIRST
      minimum, matching ``_assign``'s CASE scan (NaN distances raise:
      the operator's inputs are finite by contract, and silently
      diverging from the CASE semantics would be worse than failing);
    - update partials are exact integer micro-unit sums
      (``floor(x * 1e6)`` per element), so per-batch partial summation
      is order-independent and the final k*dim-row ``groupBy`` merge is
      exact.

    Only ``__v`` crosses the Python boundary (the assignment needs no
    id); each batch yields at most k*dim partial rows, so the exchange
    carries partials, not points."""
    ordered = sorted(cents.items())
    keys = [cl for cl, _ in ordered]
    cmat = [cv for _, cv in ordered]

    def _batches(it):
        import numpy as np
        import pyarrow as pa

        c = np.array(cmat, dtype=np.float64)  # (k, dim)
        kk, dim = c.shape
        key_arr = np.array(keys, dtype=np.int64)
        for batch in it:
            n = batch.num_rows
            if n == 0:
                continue
            col = batch.column(0)
            if col.null_count:
                raise ValueError("kmeans_lloyd: NULL vectors unsupported")
            offs = col.offsets.to_numpy()
            if not (np.diff(offs) == dim).all():
                raise ValueError(
                    f"kmeans_lloyd: ragged vectors (expected dim={dim})"
                )
            v = (
                col.values.to_numpy(zero_copy_only=False)[offs[0]: offs[-1]]
                .astype(np.float64, copy=False)
                .reshape(n, dim)
            )
            dist = np.zeros((n, kk))
            for d in range(dim):
                diff = v[:, d, None] - c[None, :, d]
                dist += diff * diff
            if np.isnan(dist).any():
                raise ValueError(
                    "kmeans_lloyd: NaN distance (non-finite input vector)"
                )
            asn = np.argmin(dist, axis=1)  # first min = lowest cluster id
            micros = np.floor(v * float(MICRO)).astype(np.int64)
            cls_out, d_out, s_out, n_out = [], [], [], []
            for ci in np.unique(asn):
                mask = asn == ci
                cls_out.append(np.full(dim, key_arr[ci], dtype=np.int64))
                d_out.append(np.arange(dim, dtype=np.int32))
                s_out.append(micros[mask].sum(axis=0, dtype=np.int64))
                n_out.append(
                    np.full(dim, int(mask.sum()), dtype=np.int64)
                )
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.concatenate(cls_out)),
                    pa.array(np.concatenate(d_out)),
                    pa.array(np.concatenate(s_out)),
                    pa.array(np.concatenate(n_out)),
                ],
                ["cl", "d", "s", "n"],
            )

    return (
        pts.select("__v")
        .mapInArrow(_batches, "cl bigint, d int, s bigint, n bigint")
        .groupBy("cl", "d")
        .agg(
            F.sum("s").cast("bigint").alias("s"),
            F.sum("n").cast("bigint").alias("n"),
        )
    )


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

    for it in range(iters):
        m = _assign_update_arrow(pts, cents)
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
