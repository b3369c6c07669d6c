#!/usr/bin/env python
"""Generate a replicated (sf0.1 x N) dataset for the 8-vs-32-core
scaling anchor (r10 VERDICT item 7). NOT test data — a measurement
corpus: the driver's sf0.1 bench cannot show parallel speedup because
every query there is fixed-cost bound; this builds the smallest corpus
where data work dominates so the heavy operators' scaling is
demonstrable (SCALE.md records the results).

Replication is SELF-SIMILARITY-FREE by construction — a naive
union-with-id-offset would create cross-replica near-duplicates
(every planted dup pair would recur in all N² replica pairs, making
pair queries superlinearly heavier and the scaling read useless):

- all join/graph keys (orderkey, partkey, custkey, doc_id, user_id,
  vec_id, event_id) are offset per replica -> graphs/joins become N
  disjoint copies;
- document TEXT is char-rotated per replica (a deterministic
  substitution cipher on [a-z]) -> shingle vocabularies are disjoint
  across replicas, so no cross-replica candidate pairs;
- EMBEDDINGS are circularly shifted by replica index -> norms and
  within-replica geometry preserved, cross-replica cosines scrambled.

Usage: python scripts/gen_scale_anchor.py [N] [out_dir]
       (default N=10, out_dir=/tmp/scale_anchor_sf1)
"""

from __future__ import annotations

import string
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SRC = "/root/testdata/sf0.1"

# per-table bigint key columns to offset per replica
KEY_COLS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey", "c_nationkey"],
    "supplier": ["s_suppkey", "s_nationkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
# keep the small dims single-copy (broadcast sides; replicating them
# would break FK ranges for nothing)
SINGLE_COPY = {"region", "nation"}


def main() -> int:
    from pyspark.sql import functions as F

    from spark_etl_cli_spark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale_anchor_sf1")
    out.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name="gen_scale_anchor")
    alpha = string.ascii_lowercase
    ALPHA = string.ascii_uppercase
    for p in sorted(Path(SRC).glob("*.parquet")):
        tbl = p.stem
        df = spark.read.parquet(str(p))
        if tbl in SINGLE_COPY:
            df.write.mode("overwrite").parquet(str(out / p.name))
            print(f"{tbl}: single copy")
            continue
        # offsets use a fixed stride far above any source key
        stride = 1 << 33
        legs = []
        for k in range(n):
            leg = df
            for c in KEY_COLS.get(tbl, []):
                if c in leg.columns:
                    leg = leg.withColumn(
                        c, (F.col(c) + F.lit(k * stride)).cast("long")
                    )
            if tbl == "documents" and k > 0:
                rot = alpha[k % 26 :] + alpha[: k % 26]
                rot_u = ALPHA[k % 26 :] + ALPHA[: k % 26]
                leg = leg.withColumn(
                    "text", F.translate("text", alpha + ALPHA, rot + rot_u)
                )
            if tbl == "embeddings" and k > 0:
                leg = leg.withColumn(
                    "embedding",
                    F.concat(
                        F.expr(
                            f"slice(embedding, {k % 8 + 1},"
                            " size(embedding))"
                        ),
                        F.expr(f"slice(embedding, 1, {k % 8})"),
                    ),
                )
            legs.append(leg)
        big = legs[0]
        for leg in legs[1:]:
            big = big.unionByName(leg)
        if tbl == "events":
            # the streaming source reads sf_dir with
            # pathGlobFilter=events.parquet, which matches leaf FILE
            # names — write one file and give it that exact name
            tmp = out / "_tmp_events"
            big.coalesce(1).write.mode("overwrite").parquet(str(tmp))
            import shutil

            part = next(tmp.glob("part-*.parquet"))
            dest = out / p.name
            if dest.is_dir():
                shutil.rmtree(dest)
            elif dest.exists():
                dest.unlink()
            shutil.move(str(part), str(dest))
            shutil.rmtree(tmp)
        else:
            big.repartition(32).write.mode("overwrite").parquet(
                str(out / p.name)
            )
        print(f"{tbl}: x{n} -> {out / p.name}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
