"""Distributed graph analytics: weighted PageRank.

Connected components (the dedup workhorse) lives in
``operators/dedup.py``; this module adds the other iterative-graph
staple, PageRank, in the shape that survives 100 TB edge lists:

- edges stay DISTRIBUTED; each iteration is one ``join`` (edge ⋈ rank
  on ``src`` — broadcastable while |V| ≪ |E|, which is the common case
  for web/domain graphs) plus one ``groupBy(dst)`` shuffle;
- the rank vector is O(|V|) rows, never driver-collected;
- per-vertex incoming contributions are summed by a SORTED left fold
  (``array_sort`` + ``aggregate``) instead of ``sum()`` so the result
  is bit-deterministic regardless of partitioning — the property that
  lets a DuckDB oracle verify the whole computation hash-for-hash
  (same pattern as the LSH plans, plans/vectorops.py).

For production-depth runs (tens of iterations) interpose
``localCheckpoint()`` every few rounds exactly as
``connected_components`` does (operators/dedup.py) to keep lineage
O(1); the fixed-3-iteration query shape doesn't need it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "w",
) -> DataFrame:
    """Weighted PageRank over ``(src, dst, w)`` edges, fixed iterations.

    Classic simplified formulation (dangling mass not redistributed):

        r_{t+1}(v) = (1-d)/N + d * Σ_{(u,v) ∈ E} (w_uv / out_u) * r_t(u)

    Returns ``(vertex, pagerank)`` for every vertex appearing as a
    source or destination. ``N`` (vertex count) is the only
    driver-side scalar.
    """
    edges = edges.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("dst"),
        F.col(weight_col).cast("double").alias("w"),
    )
    outs = edges.groupBy("src").agg(F.sum("w").alias("wout"))
    # verts feeds the count() below AND one join per iteration; the
    # distinct leaves it hash-partitioned on v, which every per-round
    # left join reuses once the result is checkpointed (otherwise the
    # edge-build subtree re-executes per iteration).
    verts = (
        edges.select(F.col("src").alias("v"))
        .union(edges.select(F.col("dst").alias("v")))
        .distinct()
        .localCheckpoint()
    )
    n = verts.count()
    if n == 0:
        return verts.withColumn("pagerank", F.lit(0.0)).withColumnRenamed(
            "v", "vertex"
        )
    base = (1.0 - damping) / n

    # transition probability per edge: (w / out-strength of src) —
    # referenced once per iteration, so materialize it ONCE pre-hashed
    # on src: each round's contribution join then reuses the stored
    # partitioning and only the rank side (|V| rows) moves.
    trans = (
        edges.join(outs, "src")
        .select("src", "dst", (F.col("w") / F.col("wout")).alias("p"))
        .repartition("src")
        .localCheckpoint()
    )

    ranks = verts.select("v", F.lit(1.0 / n).alias("r"))
    for _ in range(iterations):
        contribs = (
            trans.join(
                ranks.select(F.col("v").alias("src"), "r"), "src"
            )
            .select("src", "dst", (F.col("p") * F.col("r")).alias("c"))
            .groupBy("dst")
            .agg(
                F.aggregate(
                    F.array_sort(F.collect_list(F.struct("src", "c"))),
                    F.lit(0.0),
                    lambda acc, x: acc + x["c"],
                ).alias("s")
            )
        )
        ranks = verts.join(
            contribs.select(F.col("dst").alias("v"), "s"), "v", "left"
        ).select(
            "v",
            (
                F.lit(base) + F.lit(damping) * F.coalesce("s", F.lit(0.0))
            ).alias("r"),
        )
    return ranks.select(F.col("v").alias("vertex"), F.col("r").alias("pagerank"))


def triangle_count(
    edges: DataFrame,
    u_col: str = "u",
    v_col: str = "v",
    broadcast_edge_limit: int = 2_000_000,
    edges_per_task: int = 250_000,
) -> DataFrame:
    """Exact global triangle count over undirected edges.

    The input is canonicalized here (min/max-normalized, self-loops
    dropped, then ``distinct``) so multigraph/duplicate rows can't
    inflate wedge or triangle counts — the public ``triangles://``
    transform accepts arbitrary frames, so uniqueness is enforced,
    not assumed. Uses the standard degree-orientation trick: every edge
    is directed from its lower-(degree, id) endpoint to the higher, so
    each triangle is counted exactly once and — the scale property —
    out-degrees are bounded by O(sqrt(|E|)) on any graph, which caps
    the wedge join's fan-out even with power-law hubs (a hub of degree
    10^6 contributes wedges only toward HIGHER-degree vertices, of
    which there are few).

    Plan shape: the edge list is ``localCheckpoint``ed (it feeds
    several plan branches: two degree scans, the adjacency build, the
    closure pass; without materialization the whole edge-build
    subtree — often a heavy groupBy/distinct — recomputes per branch),
    and the oriented list is checkpointed again after the degree
    joins. The WEDGE COUNT never materializes wedges: it is the pure
    degree aggregate Σ_x indeg(x)·outdeg(x) over the oriented list.
    Triangles come from ADJACENCY INTERSECTION: for each oriented
    edge (s, t), ``|out(s) ∩ out(t)|`` common out-neighbors each close
    one triangle, counted in-row with ``array_intersect`` over sorted
    out-lists — degree orientation bounds every out-list by
    O(sqrt(|E|)), so the per-row intersect is capped even on
    power-law hubs and the (often 25×-|E|-sized) wedge set never
    exists. The checkpoint makes ``count()`` on the oriented list
    nearly free, so the operator takes an ADAPTIVE join decision
    driver-side: when |E| ≤ ``broadcast_edge_limit`` both adjacency
    joins broadcast the (vertex, out-list) relation, making the
    closure pass ONE map-side stage; past the limit it degrades to
    shuffle joins on the endpoint keys. At cluster scale substitute a
    persisted table for the checkpoints.

    Returns one row: (n_edges, n_wedges, n_triangles).
    """
    e = (
        edges.select(
            F.least(F.col(u_col), F.col(v_col)).alias("u"),
            F.greatest(F.col(u_col), F.col(v_col)).alias("v"),
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    deg = (
        e.select(F.col("u").alias("x"))
        .union(e.select(F.col("v").alias("x")))
        .groupBy("x")
        .agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    )
    with_deg = (
        e.join(deg.select(F.col("x").alias("u"), F.col("d").alias("du")), "u")
        .join(deg.select(F.col("x").alias("v"), F.col("d").alias("dv")), "v")
    )
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = with_deg.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
    ).localCheckpoint()
    n_e = oriented.count()  # materialized → cheap; drives the join gate
    small = n_e <= broadcast_edge_limit

    # triangles by ADJACENCY INTERSECTION: for oriented edge (s, t),
    # every common out-neighbor closes exactly one triangle, and the
    # degree orientation bounds |out(x)| by O(sqrt(|E|)) so the in-row
    # array_intersect is capped even on power-law hubs. Two joins of
    # the edge list against the (vertex, sorted out-list) relation —
    # broadcast under the same adaptive gate as before, shuffle-join
    # fallback past it — replace the wedge-materializing join pair.
    #
    # n_wedges rides the SAME aggregate: |{(e1, e2): e1.dst = e2.src}|
    # = Σ over oriented edges (s, t) of outdeg(t), and outdeg(t) is
    # exactly |__at| of the adjacency row the closure pass already
    # joined on dst (0 where the left join found none). The previous
    # formulation computed it as Σ_x indeg(x)·outdeg(x) through a
    # separate odeg⋈ideg join + its own aggregate + a driver head() —
    # one full job with two exchanges, removed outright (guide §2.4).
    # The wedge set itself (19.5M rows at sf0.1) still never
    # materializes.
    # Past the broadcast gate the adjacency stages carry ARRAY payloads
    # whose decompressed size is many times their shuffle bytes, so
    # AQE's byte-based coalescing (64 MB advisory) packs them into a
    # handful of fat partitions whose per-task hash state then thrashes
    # execution memory — measured r11 on the 30x anchor corpus
    # (22.6M edges): 233 s at 32 cores vs 42 s at 8 (more concurrent
    # tasks = less memory each = spill churn); 16 MB advisory or the
    # explicit sizing below brings 32 cores to ~30 s (SCALE.md). The
    # partition count is derived from the MEASURED edge count (already
    # materialized for the gate) — scale-adaptive, not tuned to a core
    # count: ~edges_per_task edges per task bounds per-task array
    # state regardless of cluster width (guide §2.5, §5).
    if small:
        grouped = oriented
    else:
        n_parts = max(
            oriented.sparkSession.sparkContext.defaultParallelism,
            n_e // edges_per_task + 1,
        )
        grouped = oriented.repartition(n_parts, "src")
    adj = grouped.groupBy(F.col("src").alias("x")).agg(
        F.sort_array(F.collect_list("dst")).alias("adj")
    )
    a_s = adj.select(F.col("x").alias("src"), F.col("adj").alias("__as"))
    a_t = adj.select(F.col("x").alias("dst"), F.col("adj").alias("__at"))
    if small:
        left = oriented
    else:
        # both closure joins get explicitly-sized exchanges on their
        # join keys (user-specified partitioning is exempt from AQE
        # coalescing), so per-task array state stays bounded
        left = oriented.repartition(n_parts, "src")
        a_t = a_t.repartition(n_parts, "dst")
    closed = (
        left.join(F.broadcast(a_s) if small else a_s, "src")
        .join(
            F.broadcast(a_t)
            if small
            else a_t,
            "dst",
            "left",
        )
        .agg(
            F.coalesce(
                F.sum(
                    F.when(F.col("__at").isNull(), 0).otherwise(
                        F.size("__at")
                    )
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("n_wedges"),
            F.coalesce(
                F.sum(
                    F.when(F.col("__at").isNull(), 0).otherwise(
                        F.size(F.array_intersect("__as", "__at"))
                    )
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("n_triangles"),
        )
    )
    return closed.select(
        F.lit(n_e).cast("bigint").alias("n_edges"),
        "n_wedges",
        "n_triangles",
    )


def min_label_propagation(
    edges: DataFrame,
    rounds: int = 3,
    src_col: str = "u",
    dst_col: str = "v",
) -> DataFrame:
    """``rounds`` synchronous sweeps of min-label propagation over an
    undirected graph — each node's label becomes the minimum of its
    own and its neighbors' previous-round labels, seeded with the node
    id. Returns ``(x, lbl)`` per node.

    After r rounds every node holds the minimum id within r hops, so
    connected regions of diameter <= r are fully merged — the bounded-
    depth workhorse behind community seeding and near-dup cluster
    growth when a full connected-components fixpoint (q47's
    alternating-star loop) is more iterations than the data needs.

    Scale shape: one symmetric edge list reused every round (cached by
    lineage, shuffled on the SAME key each time so AQE reuses the
    exchange layout), per round one shuffle-join + one map-side-
    combined min agg; labels are ids (longs), never strings. State per
    round is |V| rows — no per-node adjacency materialization. The
    deterministic fixseed (label = id) makes the result replayable in
    any engine, which is what the DuckDB oracles key on.
    """
    # The symmetric edge list feeds every round's join PLUS the label
    # seed: without materialization the whole upstream edge build (for
    # q171 a lineitem groupBy + explode + distinct) re-executes once
    # per reference — rounds+1 times. Checkpoint it ONCE, pre-hashed on
    # the join key, so each round's join reuses the stored partitioning
    # instead of re-shuffling the edge side (guide §2.4: two operations
    # keyed the same way share one exchange).
    sym = (
        edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        )
        .unionByName(
            edges.select(
                F.col(dst_col).alias("src"), F.col(src_col).alias("dst")
            )
        )
        .repartition("src")
        .localCheckpoint()
    )
    labels = (
        sym.select(F.col("src").alias("x"))
        .distinct()
        .withColumn("lbl", F.col("x"))
    )
    for _ in range(rounds):
        neigh = (
            sym.join(labels, sym["src"] == labels["x"])
            .groupBy(F.col("dst").alias("x"))
            .agg(F.min("lbl").alias("__nmin"))
        )
        labels = (
            labels.join(neigh, "x", "left")
            .select(
                "x",
                F.least(
                    F.col("lbl"), F.coalesce("__nmin", F.col("lbl"))
                ).alias("lbl"),
            )
            .localCheckpoint(eager=False)
        )
    return labels
