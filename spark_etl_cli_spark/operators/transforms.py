"""Transform URI registrations: identity, sql, sql-file, flatten,
flatten-explode, diff.

Transform semantics mirror the reference's transformer registry
(``core/.../TransformerParser.scala:17-144``,
``diff/.../DiffTransformerParser.scala:9-62``): each scheme maps to a
``(spark, df) -> df`` function; the pipeline registers the input view as
``input`` before invoking, so ``sql://`` can reference it.
"""

from __future__ import annotations

import urllib.parse

from pyspark.sql import DataFrame, SparkSession

from spark_etl_cli_spark.operators.diff import apply_diff_handling, diff
from spark_etl_cli_spark.operators.schema_tools import flatten, flatten_explode
from spark_etl_cli_spark.pipeline import TransformFn
from spark_etl_cli_spark.registry import register_transform
from spark_etl_cli_spark.uri import ParsedUri


@register_transform("identity")
def identity_transform(p: ParsedUri) -> TransformFn:
    return lambda spark, df: df


@register_transform("sql")
def sql_transform(p: ParsedUri) -> TransformFn:
    # URI "path" carries URL-encoded SQL (reference TransformerParser.scala:24).
    # SQL rarely survives urlparse's netloc/path split, so use the full
    # percent-decoded text after 'sql://'; also accept ?query=.
    sql = p.params.get("query") or p.rest
    if not p.params.get("query") and "?query=" in sql:
        sql = sql.split("?query=", 1)[0]
    sql = urllib.parse.unquote(sql) if "%" in sql else sql

    def run(spark: SparkSession, df: DataFrame) -> DataFrame:
        return spark.sql(sql)

    return run


@register_transform("sql-file")
def sql_file_transform(p: ParsedUri) -> TransformFn:
    path = p.path

    def run(spark: SparkSession, df: DataFrame) -> DataFrame:
        with open(path) as fh:
            return spark.sql(fh.read())

    return run


@register_transform("flatten")
def flatten_transform(p: ParsedUri) -> TransformFn:
    return lambda spark, df: flatten(df)


@register_transform("flatten-explode")
def flatten_explode_transform(p: ParsedUri) -> TransformFn:
    return lambda spark, df: flatten_explode(df)


def _csv_param(p: ParsedUri, key: str, default: str = "") -> list[str]:
    return [c for c in p.params.get(key, default).split(",") if c]


@register_transform("dedup")
def dedup_transform(p: ParsedUri) -> TransformFn:
    """``in+out+dedup://?mode=exact|minhash|simhash|jaccard|semdedup|incremental|substring&text-col=text&id-col=doc_id``.

    North-star operator surface (SURVEY.md §2d): ``exact`` keeps one row
    per normalized text; the other modes emit candidate near-dup pairs.
    ``mode=substring`` (alias ``tier=substring``) is the suffix-array-
    style tier — cross-doc shared spans of >= ``k`` tokens
    (operators/substring.py) — with ``emit=spans`` (default, maximal
    shared spans), ``emit=decisions`` (per-doc dup_of vs any earlier
    doc sharing >= ``min-span`` tokens), or ``emit=scrub`` (remove
    exactly the duplicated ranges, earliest occurrence kept);
    ``key=text|hash`` picks bit-exact window keys or the 8-byte-hash
    100 TB shuffle with span-grain verification.
    """
    mode = p.params.get("mode", "exact")
    if "mode" not in p.params and p.params.get("tier") == "substring":
        mode = "substring"  # dedup://?tier=substring shorthand
    text_col = p.params.get("text-col", "text")
    id_col = p.params.get("id-col", "doc_id")

    def run(spark: SparkSession, df: DataFrame) -> DataFrame:
        from spark_etl_cli_spark.operators import dedup as D

        if mode == "exact":
            return D.dedup_exact(df, text_col, id_col)
        if mode == "minhash":
            return D.minhash_lsh_pairs(
                df,
                text_col,
                id_col,
                num_hashes=int(p.params.get("num-hashes", "32")),
                bands=int(p.params.get("bands", "8")),
            )
        if mode == "jaccard":
            return D.shingle_pairs_jaccard(
                df,
                text_col,
                id_col,
                threshold=float(p.params.get("threshold", "0.5")),
            )
        if mode == "simhash":
            return D.simhash(df, text_col, id_col)
        if mode == "semdedup":
            from spark_etl_cli_spark.operators.similarity import semantic_dedup

            return semantic_dedup(
                df,
                threshold=float(p.params.get("threshold", "0.95")),
                id_col=p.params.get("id-col", "vec_id"),
                vec_col=p.params.get("vec-col", "embedding"),
                n_clusters=int(p.params.get("clusters", "16")),
            )
        if mode == "incremental":
            return _incremental_dedup_run(p, spark, df, text_col, id_col)
        if mode == "substring":
            from spark_etl_cli_spark.operators import substring as S

            k = int(p.params.get("k", "8"))
            key = p.params.get("key", "text")
            max_df_s = p.params.get("max-df")
            max_df = int(max_df_s) if max_df_s else None
            min_span = int(p.params.get("min-span", str(k + 4)))
            emit = p.params.get("emit", "spans")
            if emit == "spans":
                return S.substring_dup_spans(
                    df, text_col, id_col, k=k, key=key, max_df=max_df
                )
            if emit == "decisions":
                return S.substring_dedup(
                    df, text_col, id_col,
                    k=k, min_span=min_span, key=key, max_df=max_df,
                )
            if emit == "scrub":
                return S.substring_scrub(
                    df, text_col, id_col,
                    k=k, min_span=min_span, key=key, max_df=max_df,
                )
            raise ValueError(
                f"dedup substring: emit must be spans|decisions|scrub,"
                f" got {emit!r}"
            )
        raise ValueError(f"unknown dedup mode {mode!r}")

    return run


def _incremental_state(
    spark: SparkSession,
    path: str | None,
    *,
    first_batch: bool = False,
    require_state: bool = False,
):
    """Load a persisted dedup state table (delta preferred, plain
    parquet accepted); None when absent — the first batch.

    A ``state=`` that resolves to NOTHING is ambiguous: the genuine
    first batch of a loop looks identical to a typo'd path, and the
    latter silently dedups every batch only against itself. So when
    the path is set but absent this warns loudly by default,
    ``first_batch=True`` (URI: ``first-batch=true``) declares the
    miss expected and silences it, and ``require_state=True`` (URI:
    ``require-state=true``) escalates to ``ValueError`` for steady-
    state pipelines where the state table must already exist.
    """
    import os
    import warnings

    if not path:
        return None
    if os.path.isdir(os.path.join(path, "_delta_log")):
        from spark_etl_cli_spark.sources.delta_lite import read_delta_lite

        return read_delta_lite(spark, path)
    if os.path.exists(path):
        return spark.read.parquet(path)
    if require_state:
        raise ValueError(
            f"incremental dedup: require-state=true but state path "
            f"{path!r} resolves to no delta table or parquet file. "
            "Fix the path, or drop require-state for the first batch."
        )
    if not first_batch:
        warnings.warn(
            f"incremental dedup: state={path!r} resolves to NOTHING — "
            "treating this as the first batch (dedup against the batch "
            "alone). If this IS the first batch, pass first-batch=true "
            "to silence this; if not, the path is wrong and every "
            "survivor decision will ignore the existing corpus "
            "(require-state=true makes that an error).",
            stacklevel=2,
        )
    return None


def _incremental_dedup_run(
    p: ParsedUri, spark: SparkSession, df: DataFrame, text_col: str,
    id_col: str,
) -> DataFrame:
    """``dedup://?mode=incremental&tier=minhash|exact|cosine&state=<path>``
    — the batch-vs-persisted-corpus loop (operators/dedup.py
    ``incremental_*`` family, examples/incremental_dedup.sh) as a
    pipeline surface. Output = the input rows + the decision columns
    (``dup_of`` NULL = survivor, plus ``est_jaccard``/``cosine_sim``)
    + the probe column (``signature``/``fp``) so ONE pipeline can sink
    survivors and append the state table:

        --transform "docs+dec+dedup://?mode=incremental&state=$STATE"
        --transform "dec+surv+sql://SELECT * FROM dec WHERE dup_of IS NULL"
        --transform "dec+sig+sql://SELECT doc_id AS id, signature FROM dec"
        --sink "surv+delta://$CORPUS?mode=append"
        --sink "sig+delta://$STATE?mode=append"

    ``state`` is a delta table (or plain parquet) of prior batches'
    probe rows; absent = first batch. Decisions equal a full recompute
    when batches arrive id-ordered and EVERY batch's probe rows are
    appended (tests/test_round9_queries.py pins the contract).

    Guardrails: the arrival-order contract (every state id < every
    batch id) is VALIDATED per batch — two single-column aggregations
    — and violations raise with the ``assign-ids://`` remedy
    (``validate-ids=false`` opts out). A ``state=`` that resolves to
    nothing warns loudly (first batch and typo'd path are otherwise
    indistinguishable); ``first-batch=true`` declares it expected,
    ``require-state=true`` makes it an error.
    """
    tier = p.params.get("tier", "minhash")
    state = _incremental_state(
        spark,
        p.params.get("state"),
        first_batch=p.params.get("first-batch", "").lower() == "true",
        require_state=p.params.get("require-state", "").lower() == "true",
    )
    validate_ids = p.params.get("validate-ids", "true").lower() != "false"
    from pyspark.sql import functions as F

    from spark_etl_cli_spark.operators.dedup import check_monotone_ids

    if tier == "minhash":
        from spark_etl_cli_spark.operators.dedup import (
            incremental_minhash_dedup,
            minhash_signatures,
        )

        if validate_ids:
            check_monotone_ids(
                df.select(F.col(id_col).alias("id")), state
            )
        sigs = minhash_signatures(
            df,
            text_col,
            id_col,
            num_hashes=int(p.params.get("num-hashes", "32")),
            shingle_k=int(p.params.get("shingle-k", "3")),
            hash_family=p.params.get("hash-family", "fast"),
        )
        dec = incremental_minhash_dedup(
            sigs,
            state,
            num_hashes=int(p.params.get("num-hashes", "32")),
            bands=int(p.params.get("bands", "8")),
            threshold=float(p.params.get("threshold", "0.5")),
        )
        probe = sigs.join(dec, "id").withColumnRenamed("id", id_col)
        # LEFT: rows with no shingles (empty text) still flow through,
        # as trivial survivors with NULL probe columns
        return df.join(probe, id_col, "left")
    if tier == "exact":
        from spark_etl_cli_spark.functions.text import fingerprint
        from spark_etl_cli_spark.operators.dedup import (
            incremental_exact_dedup,
        )

        if validate_ids:
            check_monotone_ids(
                df.select(F.col(id_col).alias("id")), state
            )
        fps = df.select(
            F.col(id_col).alias("id"),
            fingerprint(F.col(text_col)).alias("fp"),
        )
        dec = incremental_exact_dedup(fps, state)
        probe = fps.join(dec, "id").withColumnRenamed("id", id_col)
        return df.join(probe, id_col, "left")
    if tier == "cosine":
        from spark_etl_cli_spark.operators.similarity import (
            incremental_cosine_dedup,
        )

        vid = p.params.get("id-col", "vec_id") if id_col == "doc_id" else id_col
        if validate_ids:
            check_monotone_ids(df, state, id_col=vid)
        dec = incremental_cosine_dedup(
            df,
            state,
            threshold=float(p.params.get("threshold", "0.3")),
            id_col=vid,
            vec_col=p.params.get("vec-col", "embedding"),
            num_planes=int(p.params.get("planes", "16")),
            bands=int(p.params.get("bands", "4")),
        )
        return df.join(dec.withColumnRenamed("id", vid), vid, "left")
    raise ValueError(f"unknown incremental dedup tier {tier!r}")


@register_transform("cdc-apply")
def cdc_apply_transform(p: ParsedUri) -> TransformFn:
    """``in+out+cdc-apply://?key=id&sequence=version[&type-col=_change_type
    &delete-values=delete&ignore-values=update_preimage]``.

    Materialize the current snapshot implied by a change log: latest
    change per key wins, keys whose latest change is a delete vanish
    (operators/cdc.py). Pair with ``delta-stream://?readChangeFeed=true``
    or any CDC-shaped frame.
    """
    keys = _csv_param(p, "key")
    seq = _csv_param(p, "sequence")
    if not keys or not seq:
        raise ValueError("cdc-apply:// needs ?key=<cols>&sequence=<cols>")
    type_col = p.params.get("type-col", "_change_type")
    deletes = tuple(_csv_param(p, "delete-values", "delete"))
    ignores = tuple(_csv_param(p, "ignore-values", "update_preimage"))

    def run(spark: SparkSession, df: DataFrame) -> DataFrame:
        from spark_etl_cli_spark.operators.cdc import apply_changes_snapshot

        return apply_changes_snapshot(
            df,
            keys,
            seq,
            change_type_col=type_col if type_col in df.columns else None,
            delete_values=deletes,
            ignore_values=ignores,
        )

    return run


@register_transform("asof")
def asof_transform(p: ParsedUri) -> TransformFn:
    """``in+out+asof://rightView?key=sym&left-ts=ts&right-ts=ts``.

    Nearest-prior join of the input view against another registered view
    (single-shuffle union+window plan, operators/asof.py).
    """
    other_view = p.path.lstrip("/") or p.authority
    keys = _csv_param(p, "key")
    left_ts = p.params.get("left-ts", "ts")
    right_ts = p.params.get("right-ts", "ts")
    payload = _csv_param(p, "payload") or None

    def run(spark: SparkSession, df: DataFrame) -> DataFrame:
        from spark_etl_cli_spark.operators.asof import asof_join

        return asof_join(df, spark.table(other_view), keys, left_ts, right_ts, payload)

    return run


@register_transform("text-metrics")
def text_metrics_transform(p: ParsedUri) -> TransformFn:
    """``in+out+text-metrics://?text-col=text`` — append token_count,
    quality_score, lang_id, and fingerprint columns (all codegen'd)."""
    text_col = p.params.get("text-col", "text")

    def run(spark: SparkSession, df: DataFrame) -> DataFrame:
        from pyspark.sql import functions as F

        from spark_etl_cli_spark.functions import text as X

        c = F.col(text_col)
        return df.withColumns(
            {
                "token_count": X.token_count(c),
                "quality_score": X.quality_score(c),
                "lang_id": X.lang_id(c),
                "fingerprint": X.fingerprint(c),
            }
        )

    return run


@register_transform("similarity")
def similarity_transform(p: ParsedUri) -> TransformFn:
    """``in+out+similarity://queriesView?k=10&mode=brute|lsh&id-col=vec_id&vec-col=embedding``.

    Top-k cosine neighbors of each row in ``queriesView`` against the
    input view as corpus.
    """
    queries_view = p.path.lstrip("/") or p.authority
    k = int(p.params.get("k", "10"))
    mode = p.params.get("mode", "brute")
    id_col = p.params.get("id-col", "vec_id")
    vec_col = p.params.get("vec-col", "embedding")

    def run(spark: SparkSession, df: DataFrame) -> DataFrame:
        from spark_etl_cli_spark.operators import similarity as S

        q = spark.table(queries_view)
        if mode == "brute":
            return S.brute_force_topk(df, q, k, id_col, vec_col)
        if mode == "lsh":
            return S.lsh_topk(df, q, k, id_col, vec_col)
        raise ValueError(f"unknown similarity mode {mode!r}")

    return run


@register_transform("repartition")
def repartition_transform(p: ParsedUri) -> TransformFn:
    """``in+out+repartition://?n=64&by=a,b`` — explicit data-layout
    control: hash-partition on columns (co-locates later joins/aggs on
    the same keys) and/or set the partition count."""
    n = p.params.get("n")
    by = _csv_param(p, "by")

    def run(spark: SparkSession, df: DataFrame) -> DataFrame:
        from pyspark.sql import functions as F

        cols = [F.col(c) for c in by]
        if n and cols:
            return df.repartition(int(n), *cols)
        if cols:
            return df.repartition(*cols)
        if n:
            return df.repartition(int(n))
        return df.repartition()

    return run


@register_transform("coalesce")
def coalesce_transform(p: ParsedUri) -> TransformFn:
    """``in+out+coalesce://?n=8`` — shrink partition count without a
    shuffle (output-file control)."""
    n = int(p.params.get("n", "1"))
    return lambda spark, df: df.coalesce(n)


@register_transform("cache")
def cache_transform(p: ParsedUri) -> TransformFn:
    """``in+out+cache://[?storage=MEMORY_AND_DISK]`` — persist a view
    consumed by multiple later transforms/sinks so it computes once."""
    level_name = p.params.get("storage", "MEMORY_AND_DISK")

    def run(spark: SparkSession, df: DataFrame) -> DataFrame:
        from pyspark import StorageLevel

        level = getattr(StorageLevel, level_name)
        return df.persist(level)

    return run


@register_transform("diff")
def diff_transform(p: ParsedUri) -> TransformFn:
    """``in+out+diff://otherView?id=a,b&ignore=c&handleDifferences=filter|fail``.

    Compares the input view against another registered view (right side),
    like the reference (``DiffTransformerParser.scala:35``).
    """
    other_view = p.path.lstrip("/") or p.authority
    id_cols = [c for c in p.params.get("id", "").split(",") if c]
    ignore = [c for c in p.params.get("ignore", "").split(",") if c]
    handle = p.params.get("handleDifferences")

    def run(spark: SparkSession, df: DataFrame) -> DataFrame:
        right = spark.table(other_view)
        return apply_diff_handling(diff(df, right, id_cols, ignore), handle)

    return run


@register_transform("components")
def components_transform(p: ParsedUri) -> TransformFn:
    """``in+out+components://?src=id_a&dst=id_b&max-iter=25&algo=minlabel|star``.

    Connected components over an edge-list view (e.g. the pair output
    of ``dedup://?mode=minhash``): emits (id, component) so dedup can
    keep one survivor per *group*, not just per pair. ``algo=minlabel``
    (default) converges in diameter-many 1-shuffle rounds — right for
    shallow dup clusters; ``algo=star`` (large-star/small-star) takes
    O(log²) heavier rounds — right for deep or unknown-diameter graphs.
    """
    src = p.params.get("src", "id_a")
    dst = p.params.get("dst", "id_b")
    max_iter = int(p.params.get("max-iter", "25"))
    algo = p.params.get("algo", "minlabel")

    def run(spark: SparkSession, df: DataFrame) -> DataFrame:
        from spark_etl_cli_spark.operators import dedup as D

        if algo == "star":
            return D.connected_components_star(df, src, dst, max_iter)
        if algo == "minlabel":
            return D.connected_components(df, src, dst, max_iter)
        raise ValueError(f"unknown components algo {algo!r}")

    return run


@register_transform("sample")
def sample_transform(p: ParsedUri) -> TransformFn:
    """``in+out+sample://?rate=10&id-col=doc_id[&by=source&rates=src0:5,src1:10]``.

    Deterministic hash sampling: keep rows whose md5-bucket (of the id
    column, mod 100) falls below the rate. Reproducible across runs,
    engines, and repartitioning — unlike Bernoulli ``df.sample``.
    Optional ``by``/``rates`` give per-stratum rates (fallback
    ``rate`` for unlisted strata).
    """
    rate = int(p.params.get("rate", "10"))
    id_col = p.params.get("id-col", "doc_id")
    by = p.params.get("by")
    rates = dict(
        kv.split(":", 1) for kv in p.params.get("rates", "").split(",") if ":" in kv
    )

    def run(spark: SparkSession, df: DataFrame) -> DataFrame:
        from pyspark.sql import functions as F

        bucket = (
            F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
            .cast("bigint")
            % 100
        )
        limit = F.lit(rate)
        if by and rates:
            expr = F.lit(rate)
            for stratum, r in rates.items():
                expr = F.when(F.col(by) == stratum, F.lit(int(r))).otherwise(expr)
            limit = expr
        return df.filter(bucket < limit)

    return run


@register_transform("quality-filter")
def quality_filter_transform(p: ParsedUri) -> TransformFn:
    """``in+out+quality-filter://?text-col=text&min-tokens=5&max-tokens=1000&max-punct=0.3&min-stopword=0.01``.

    Gopher/C4-style document gates (the filter twin of the q49 funnel):
    keeps rows passing all thresholds; all gates codegen'd.
    """
    text_col = p.params.get("text-col", "text")
    min_tok = int(p.params.get("min-tokens", "5"))
    max_tok = int(p.params.get("max-tokens", "1000"))
    max_punct = float(p.params.get("max-punct", "0.3"))
    min_sw = float(p.params.get("min-stopword", "0.01"))

    def run(spark: SparkSession, df: DataFrame) -> DataFrame:
        from pyspark.sql import functions as F

        from spark_etl_cli_spark.functions import text as X

        c = F.col(text_col)
        return df.filter(
            X.token_count(c).between(min_tok, max_tok)
            & (X.punct_ratio(c) <= max_punct)
            & (X.stopword_ratio(c) >= min_sw)
        )

    return run


@register_transform("pii-scrub")
def pii_scrub_transform(p: ParsedUri) -> TransformFn:
    """``in+out+pii-scrub://?text-col=text`` — replace e-mail/phone
    patterns with [EMAIL]/[PHONE] markers in place."""
    text_col = p.params.get("text-col", "text")

    def run(spark: SparkSession, df: DataFrame) -> DataFrame:
        from pyspark.sql import functions as F

        from spark_etl_cli_spark.plans.corpusops import _EMAIL_RE, _PHONE_RE

        scrubbed = F.regexp_replace(
            F.regexp_replace(F.col(text_col), _EMAIL_RE, "[EMAIL]"),
            _PHONE_RE,
            "[PHONE]",
        )
        return df.withColumn(text_col, scrubbed)

    return run


@register_transform("sessionize")
def sessionize_transform(p: ParsedUri) -> TransformFn:
    """``in+out+sessionize://?key=user_id&ts-col=ts&gap=600[&order=event_id]``.

    Gap-based batch sessionization: appends a ``session_id`` column
    (``<key>-<n>`` per key). One window shuffle on the key.
    """
    key = p.params.get("key", "user_id")
    ts_col = p.params.get("ts-col", "ts")
    gap = int(p.params.get("gap", "600"))
    order = [c for c in p.params.get("order", "").split(",") if c]

    def run(spark: SparkSession, df: DataFrame) -> DataFrame:
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        ob = [F.col(ts_col), *[F.col(c) for c in order]]
        w = Window.partitionBy(key).orderBy(*ob)
        brk = F.when(
            F.lag(ts_col).over(w).isNull()
            | (
                F.col(ts_col).cast("long")
                >= F.lag(F.col(ts_col).cast("long")).over(w) + gap
            ),
            1,
        ).otherwise(0)
        grp = F.sum(brk).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return df.withColumn(
            "session_id", F.concat_ws("-", F.col(key).cast("string"), grp)
        )

    return run


@register_transform("chunk")
def chunk_transform(p: ParsedUri) -> TransformFn:
    """``in+out+chunk://?chunk-tokens=64&stride=48&text-col=text&id-col=doc_id``.

    Overlapping context-window chunks (operators/chunking.py) — per-row
    explode, no shuffle.
    """
    text_col = p.params.get("text-col", "text")
    id_col = p.params.get("id-col", "doc_id")
    chunk_tokens = int(p.params.get("chunk-tokens", "64"))
    stride = int(p.params.get("stride", "48"))

    def run(spark: SparkSession, df: DataFrame) -> DataFrame:
        from spark_etl_cli_spark.operators.chunking import chunk_documents

        return chunk_documents(df, text_col, id_col, chunk_tokens, stride)

    return run


@register_transform("pack")
def pack_transform(p: ParsedUri) -> TransformFn:
    """``in+out+pack://?seq-tokens=2048&partition-col=source&text-col=text&id-col=doc_id``.

    Greedy sequence packing: appends (ntok, seq_id) so a downstream
    groupBy(partition-col, seq_id) materializes training sequences.
    """
    text_col = p.params.get("text-col", "text")
    id_col = p.params.get("id-col", "doc_id")
    partition_col = p.params.get("partition-col", "source")
    seq_tokens = int(p.params.get("seq-tokens", "2048"))

    def run(spark: SparkSession, df: DataFrame) -> DataFrame:
        from spark_etl_cli_spark.operators.chunking import pack_sequences

        return pack_sequences(df, text_col, id_col, partition_col, seq_tokens)

    return run


@register_transform("merge")
def merge_transform(p: ParsedUri) -> TransformFn:
    """``base+out+merge://changesView?keys=id&seq-col=ts&op-col=op&delete-op=D``.

    SCD1 changelog MERGE: the input view is the snapshot, the URI path
    names the changelog view; per key the highest-seq change wins and
    tombstone ops delete (operators/maintenance.py — one shuffle,
    union+window, no base-vs-changes join).
    """
    changes_view = p.path.lstrip("/") or p.authority
    keys = _csv_param(p, "keys")
    seq_cols = _csv_param(p, "seq-col", "ts")
    op_col = p.params.get("op-col")
    delete_op = p.params.get("delete-op", "D")

    def run(spark: SparkSession, df: DataFrame) -> DataFrame:
        from spark_etl_cli_spark.operators.maintenance import merge_changelog

        return merge_changelog(
            df, spark.table(changes_view), keys, seq_cols, op_col, delete_op
        )

    return run


@register_transform("gapfill")
def gapfill_transform(p: ParsedUri) -> TransformFn:
    """``in+out+gapfill://?keys=k&date-col=day&value-cols=total``.

    Densify per-key daily series (sequence+explode spine) and
    forward-fill ``<col>_filled`` values (operators/maintenance.py).
    """
    keys = _csv_param(p, "keys")
    date_col = p.params.get("date-col", "day")
    value_cols = _csv_param(p, "value-cols")

    def run(spark: SparkSession, df: DataFrame) -> DataFrame:
        from spark_etl_cli_spark.operators.maintenance import gap_fill

        return gap_fill(df, keys, date_col, value_cols)

    return run


@register_transform("expect")
def expect_transform(p: ParsedUri) -> TransformFn:
    """``in+out+expect://?not-null=a,b&unique=a,b;c&accepted=col:v1|v2&positive=c&fk=col->view.parent&mode=audit``.

    Declarative data-quality checks -> (check, violations) audit rows
    (operators/maintenance.py). ``mode=fail`` raises if any check has
    violations (the reference's diff ``handleDifferences=fail`` pattern,
    DiffTransformerParser.scala:47-60, applied to constraints).
    """
    not_null = _csv_param(p, "not-null")
    unique = [
        [c for c in group.split(",") if c]
        for group in p.params.get("unique", "").split(";")
        if group
    ]
    accepted: dict[str, list[str]] = {}
    for spec in p.params.get("accepted", "").split(";"):
        if spec and ":" in spec:
            col, vals = spec.split(":", 1)
            accepted[col] = vals.split("|")
    positive = _csv_param(p, "positive")
    fks: list[tuple[str, str, str]] = []
    for spec in p.params.get("fk", "").split(";"):
        if spec and "->" in spec:
            child, parent = spec.split("->", 1)
            view, pcol = parent.rsplit(".", 1)
            fks.append((child, view, pcol))
    mode = p.params.get("mode", "audit")

    def run(spark: SparkSession, df: DataFrame) -> DataFrame:
        from spark_etl_cli_spark.operators.maintenance import expectations

        audit = expectations(
            df,
            not_null=not_null,
            unique=unique,
            accepted=accepted,
            positive=positive,
            foreign_keys=[(c, spark.table(v), pc) for c, v, pc in fks],
        )
        if mode == "fail":
            bad = audit.filter("violations > 0").collect()
            if bad:
                raise ValueError(
                    "expectations failed: "
                    + "; ".join(f"{r['check']}={r['violations']}" for r in bad)
                )
        return audit

    return run


@register_transform("bloom-prune")
def bloom_prune_transform(p: ParsedUri) -> TransformFn:
    """``in+out+bloom-prune://keysView?key=o_custkey&dim-key=c_custkey
    &fpp=0.01&expected=100000``.

    Prunes the input view's rows to those whose ``key`` might appear in
    ``keysView[dim-key]`` — explicit runtime filtering ahead of a join
    or aggregation (operators/joins.py). Exact joins downstream are
    unaffected (no false negatives); ``expected`` skips the sizing
    ``count()`` on the keys view.
    """
    keys_view = p.path.lstrip("/") or p.authority
    fact_key = p.params.get("key", "id")
    dim_key = p.params.get("dim-key") or None
    fpp = float(p.params.get("fpp", "0.01"))
    expected = p.params.get("expected")

    def run(spark: SparkSession, df: DataFrame) -> DataFrame:
        from spark_etl_cli_spark.operators.joins import bloom_semi_prune

        return bloom_semi_prune(
            df,
            spark.table(keys_view),
            fact_key,
            dim_key,
            expected_items=int(expected) if expected else None,
            fpp=fpp,
        )

    return run


@register_transform("range-join")
def range_join_transform(p: ParsedUri) -> TransformFn:
    """``in+out+range-join://intervalsView?point=ts&lo=start&hi=end
    &bin-width=3600``.

    Inner-joins the input view (point side) against an intervals view
    on ``point BETWEEN lo AND hi`` via the binned hash-join
    decomposition (operators/joins.py) — no nested loop even without
    an equi key.
    """
    iv_view = p.path.lstrip("/") or p.authority
    point = p.params.get("point", "ts")
    lo = p.params.get("lo", "lo")
    hi = p.params.get("hi", "hi")
    bin_width = int(p.params.get("bin-width", "3600"))

    def run(spark: SparkSession, df: DataFrame) -> DataFrame:
        from spark_etl_cli_spark.operators.joins import range_join_binned

        return range_join_binned(df, spark.table(iv_view), point, lo, hi, bin_width)

    return run


@register_transform("assign-ids")
def assign_ids_transform(p: ParsedUri) -> TransformFn:
    """``in+out+assign-ids://?order=date,id&id-col=seq_id&partitions=N``.

    Dense 0-based sequential ids in ``order`` order via the two-pass
    range-partition scheme (operators/ids.py) — never a single-partition
    global window.
    """
    order = _csv_param(p, "order")
    id_col = p.params.get("id-col", "seq_id")
    partitions = p.params.get("partitions")

    def run(spark: SparkSession, df: DataFrame) -> DataFrame:
        from spark_etl_cli_spark.operators.ids import assign_sequential_ids

        return assign_sequential_ids(
            df, order, id_col, int(partitions) if partitions else None
        )

    return run


@register_transform("zorder")
def zorder_transform(p: ParsedUri) -> TransformFn:
    """``in+out+zorder://?by=a,b&bits=10&partitions=N``.

    Totally orders the view by the z-value (Morton interleave) of the
    given columns (operators/zorder.py) so a following file sink writes
    row groups clustered in every listed dimension.
    """
    by = _csv_param(p, "by")
    bits = int(p.params.get("bits", "10"))
    partitions = p.params.get("partitions")

    def run(spark: SparkSession, df: DataFrame) -> DataFrame:
        from spark_etl_cli_spark.operators.zorder import zorder_sort

        return zorder_sort(
            df, by, bits, int(partitions) if partitions else None
        )

    return run


@register_transform("rebalance")
def rebalance_transform(p: ParsedUri) -> TransformFn:
    """``in+out+rebalance://[?by=a,b]``.

    AQE rebalance hint: the runtime splits oversized shuffle partitions
    and coalesces undersized ones toward
    ``spark.sql.adaptive.advisoryPartitionSizeInBytes`` — the idiom for
    evenly sized output files without hand-picking a repartition count
    (and, unlike ``repartition(n)``, skew-safe: a hot key is split).
    Optional ``by`` columns hash-distribute before balancing.
    """
    by = _csv_param(p, "by")

    def run(spark: SparkSession, df: DataFrame) -> DataFrame:
        return df.hint("rebalance", *by) if by else df.hint("rebalance")

    return run


@register_transform("checksum")
def checksum_transform(p: ParsedUri) -> TransformFn:
    """``in+out+checksum://?cols=a,b,c&by=grp``.

    Order-insensitive reconciliation checksum per group
    (operators/checksum.py): run on both systems, compare the tiny
    results, drill into mismatched groups with ``diff://``.
    """
    cols = _csv_param(p, "cols")
    by = _csv_param(p, "by") or None

    def run(spark: SparkSession, df: DataFrame) -> DataFrame:
        from spark_etl_cli_spark.operators.checksum import table_checksum

        return table_checksum(df, cols or df.columns, by)

    return run


@register_transform("profile")
def profile_transform(p: ParsedUri) -> TransformFn:
    """``in+out+profile://[?cols=a,b]``.

    One-pass column profile (operators/profile.py): long-form
    (column, n_rows, n_nonnull, n_distinct) for discovery before
    declaring ``expect://`` rules.
    """
    cols = _csv_param(p, "cols") or None

    def run(spark: SparkSession, df: DataFrame) -> DataFrame:
        from spark_etl_cli_spark.operators.profile import profile_columns

        return profile_columns(df, cols)

    return run


@register_transform("encode")
def encode_transform(p: ParsedUri) -> TransformFn:
    """``in+out+encode://vocabView?text-col=text&id-col=doc_id
    &token-col=token&token-id-col=token_id&unk=-1``.

    Vocabulary encoding (operators/encoding.py): per-document token-id
    arrays via a broadcast vocab join; unknowns encode as ``unk``.
    """
    vocab_view = p.path.lstrip("/") or p.authority
    text_col = p.params.get("text-col", "text")
    id_col = p.params.get("id-col", "doc_id")
    token_col = p.params.get("token-col", "token")
    tid_col = p.params.get("token-id-col", "token_id")
    unk = int(p.params.get("unk", "-1"))

    def run(spark: SparkSession, df: DataFrame) -> DataFrame:
        from spark_etl_cli_spark.operators.encoding import vocab_encode

        return vocab_encode(
            df, spark.table(vocab_view), text_col, id_col, token_col,
            tid_col, unk,
        )

    return run


@register_transform("decontaminate")
def decontaminate_transform(p: ParsedUri) -> TransformFn:
    """``in+out+decontaminate://benchView?n=8&min-shared=1&id-col=doc_id
    &text-col=text[&pairs=true][&mode=substring&min-span=12
    &action=drop|scrub|spans&key=text|hash]``.

    Drops input docs sharing >= ``min-shared`` word n-grams with any doc
    in the benchmark view (operators/retrieval.py) — the train/test
    contamination scrub. With ``pairs=true`` it instead emits the
    (train_doc_id, bench_doc_id, n_shared) collision report for audit.

    ``mode=substring`` applies the GPT-3/PaLM-style SPAN rule instead
    (operators/substring.py): contamination = a verbatim >= ``n``-token
    window chain reaching ``min-span`` tokens; ``action=drop`` removes
    contaminated docs, ``action=scrub`` deletes exactly the
    contaminated ranges, ``action=spans`` emits the span report.
    """
    bench_view = p.path.lstrip("/") or p.authority
    n = int(p.params.get("n", "8"))
    min_shared = int(p.params.get("min-shared", "1"))
    id_col = p.params.get("id-col", "doc_id")
    text_col = p.params.get("text-col", "text")
    pairs = p.params.get("pairs", "false").lower() == "true"
    mode = p.params.get("mode", "ngram")

    def run(spark: SparkSession, df: DataFrame) -> DataFrame:
        bench = spark.table(bench_view)
        if mode == "substring":
            from spark_etl_cli_spark.operators.substring import (
                substring_contamination_spans,
                substring_decontaminate,
            )

            action = p.params.get("action", "drop")
            key = p.params.get("key", "text")
            if action == "spans" or pairs:
                return substring_contamination_spans(
                    df, bench, text_col, id_col, k=n, key=key
                )
            return substring_decontaminate(
                df, bench, text_col, id_col,
                k=n,
                min_span=int(p.params.get("min-span", str(n + 4))),
                key=key,
                action=action,
            )
        from spark_etl_cli_spark.operators.retrieval import (
            contamination_pairs,
            decontaminate,
        )

        if pairs:
            return contamination_pairs(
                df, bench, n=n, id_col=id_col, text_col=text_col
            )
        return decontaminate(
            df, bench, n=n, min_shared=min_shared,
            id_col=id_col, text_col=text_col,
        )

    return run


@register_transform("bm25")
def bm25_transform(p: ParsedUri) -> TransformFn:
    """``in+out+bm25://term1,term2,...?k1=1.2&b=0.75&id-col=doc_id
    &text-col=text[&top-k=20]``.

    BM25 relevance of every doc against a fixed query-term bag
    (operators/retrieval.py); optional ``top-k`` keeps the best k with
    a deterministic id tie-break.
    """
    terms = [t for t in (p.path.lstrip("/") or p.authority).split(",") if t]
    if not terms:
        raise ValueError("bm25:// needs at least one query term")
    k1 = float(p.params.get("k1", "1.2"))
    b = float(p.params.get("b", "0.75"))
    id_col = p.params.get("id-col", "doc_id")
    text_col = p.params.get("text-col", "text")
    top_k = p.params.get("top-k")

    def run(spark: SparkSession, df: DataFrame) -> DataFrame:
        from pyspark.sql import functions as F

        from spark_etl_cli_spark.operators.retrieval import bm25_scores

        scored = bm25_scores(
            df, terms, k1=k1, b=b, id_col=id_col, text_col=text_col
        )
        if top_k:
            scored = scored.orderBy(
                F.col("score").desc(), F.col(id_col)
            ).limit(int(top_k))
        return scored

    return run


@register_transform("mixture")
def mixture_transform(p: ParsedUri) -> TransformFn:
    """``in+out+mixture://?weights=src0:2.5,src1:0.3&default=1
    &source-col=source&id-col=doc_id&epoch-col=epoch``.

    Epoch-weighted corpus mixing (operators/mixture.py): each row is
    repeated floor(w) times plus a deterministic md5-bucket-gated extra
    copy for frac(w) of rows; weight 0 drops the source.
    """
    raw = p.params.get("weights", "")
    weights: dict[str, float] = {}
    for part in raw.split(","):
        if part:
            src, _, w = part.partition(":")
            weights[src] = float(w or "1")
    default = float(p.params.get("default", "1"))
    source_col = p.params.get("source-col", "source")
    id_col = p.params.get("id-col", "doc_id")
    epoch_col = p.params.get("epoch-col", "epoch")

    def run(spark: SparkSession, df: DataFrame) -> DataFrame:
        from spark_etl_cli_spark.operators.mixture import epoch_upsample

        return epoch_upsample(
            df, weights, default=default, source_col=source_col,
            id_col=id_col, epoch_col=epoch_col,
        )

    return run


@register_transform("kmeans")
def kmeans_transform(p: ParsedUri) -> TransformFn:
    """``in+out+kmeans://?k=8&iters=2&id-col=vec_id&vec-col=embedding``.

    Deterministic fixed-iteration Lloyd k-means
    (operators/clustering.py); emits per-(cluster, dim) statistics of
    the final update. Centroids are driver-resident (k x dim doubles).
    """
    k = int(p.params.get("k", "8"))
    iters = int(p.params.get("iters", "2"))
    id_col = p.params.get("id-col", "vec_id")
    vec_col = p.params.get("vec-col", "embedding")

    def run(spark: SparkSession, df: DataFrame) -> DataFrame:
        from spark_etl_cli_spark.operators.clustering import kmeans_lloyd

        return kmeans_lloyd(df, k=k, iters=iters, id_col=id_col, vec_col=vec_col)

    return run


@register_transform("watermark")
def watermark_transform(p: ParsedUri) -> TransformFn:
    """``in+out+watermark://col:duration`` (e.g. ``watermark://ts:30 minutes``).

    Applies an event-time watermark mid-pipeline — needed when the
    event-time column only becomes a TIMESTAMP after a transform (e.g.
    a cast from TIMESTAMP_NTZ or epoch), so the source-level
    ``?watermark=`` param can't be used.
    """
    spec = p.path.lstrip("/") or p.authority

    def run(spark: SparkSession, df: DataFrame) -> DataFrame:
        from spark_etl_cli_spark.sources.base import apply_watermark

        return apply_watermark(df, spec)

    return run


@register_transform("funnel")
def funnel_transform(p: ParsedUri) -> TransformFn:
    """``in+out+funnel://?steps=view,click,purchase&user-col=u&ts-col=ts``.

    Ordered funnel conversion over an event view (operators/events.py):
    one row per step with user counts and conversion rate vs step 1.
    Step k counts a user only when their earliest step-k event falls
    strictly after their earliest qualifying step-(k-1) event.
    """
    steps = _csv_param(p, "steps")
    user_col = p.params.get("user-col", "user_id")
    type_col = p.params.get("type-col", "event_type")
    ts_col = p.params.get("ts-col", "ts")

    def run(spark: SparkSession, df: DataFrame) -> DataFrame:
        from spark_etl_cli_spark.operators.events import funnel_steps

        return funnel_steps(df, steps, user_col, type_col, ts_col)

    return run


@register_transform("retention")
def retention_transform(p: ParsedUri) -> TransformFn:
    """``in+out+retention://?user-col=user_id&ts-col=ts``.

    Weekly retention cohort matrix (operators/events.py): cohort =
    Monday of the user's first-event week, one row per (cohort_week,
    week_offset) with distinct active users.
    """
    user_col = p.params.get("user-col", "user_id")
    ts_col = p.params.get("ts-col", "ts")

    def run(spark: SparkSession, df: DataFrame) -> DataFrame:
        from spark_etl_cli_spark.operators.events import retention_cohorts

        return retention_cohorts(df, user_col, ts_col)

    return run


@register_transform("transitions")
def transitions_transform(p: ParsedUri) -> TransformFn:
    """``in+out+transitions://?user-col=user_id&type-col=event_type&ts-col=ts&order=event_id``.

    First-order Markov transition matrix of consecutive events per user
    (operators/events.py): (from_type, to_type, n, prob), prob
    row-normalized per from_type. ``order`` adds tie-break columns to
    the per-user ordering.
    """
    user_col = p.params.get("user-col", "user_id")
    type_col = p.params.get("type-col", "event_type")
    ts_col = p.params.get("ts-col", "ts")
    order_cols = _csv_param(p, "order") or None

    def run(spark: SparkSession, df: DataFrame) -> DataFrame:
        from spark_etl_cli_spark.operators.events import transition_matrix

        return transition_matrix(df, user_col, type_col, ts_col, order_cols)

    return run


@register_transform("cap")
def cap_transform(p: ParsedUri) -> TransformFn:
    """``in+out+cap://?by=source&n=1000&order=n_chars:desc,doc_id``.

    Per-group row cap (operators/curation.py): keep at most ``n`` rows
    per ``by`` group, priority given by ``order`` (``col[:desc]`` list;
    default: all columns ascending — pass a unique tie-breaker for
    reproducible survivorship). The per-domain document cap of corpus
    curation, as a URI stage.
    """
    by = p.params.get("by") or (p.path.lstrip("/") or p.authority)
    if not by:
        raise ValueError("cap:// needs ?by=<group column>")
    n = int(p.params.get("n", "1000"))
    order_spec = _csv_param(p, "order")

    def run(spark: SparkSession, df: DataFrame) -> DataFrame:
        from pyspark.sql import functions as F

        from spark_etl_cli_spark.operators.curation import cap_per_group

        order = None
        if order_spec:
            order = []
            for item in order_spec:
                col, _, direction = item.partition(":")
                d = direction.lower() or "asc"
                if d not in ("asc", "desc"):
                    raise ValueError(
                        f"cap:// order direction must be asc|desc, got {direction!r}"
                    )
                c = F.col(col)
                order.append(c.desc() if d == "desc" else c.asc())
        return cap_per_group(df, by, n, order)

    return run


@register_transform("split")
def split_transform(p: ParsedUri) -> TransformFn:
    """``in+out+split://?id-col=doc_id&weights=train:80,val:10,test:10&salt=v1``.

    Deterministic hash-bucket dataset split (operators/curation.py):
    appends a ``split`` label; assignments are stable across runs,
    appends, and engines (md5 buckets, no rand()).
    """
    id_col = p.params.get("id-col", "id")
    weights_spec = _csv_param(p, "weights") or ["train:80", "val:10", "test:10"]
    weights: dict[str, int] = {}
    for item in weights_spec:
        label, _, w = item.partition(":")
        weights[label] = int(w or "1")
    salt = p.params.get("salt", "")

    def run(spark: SparkSession, df: DataFrame) -> DataFrame:
        from spark_etl_cli_spark.operators.curation import dataset_split

        return dataset_split(df, id_col, weights, salt)

    return run


@register_transform("compact-plan")
def compact_plan_transform(p: ParsedUri) -> TransformFn:
    """``in+out+compact-plan://?partition-col=source&file-col=doc_id&size-col=n_chars&target=134217728``.

    OPTIMIZE-style bin-packing plan (operators/curation.py): one row
    per (partition, bin) with file count and byte total; execution of
    the plan is a separate rewrite stage.
    """
    part = p.params.get("partition-col", "partition")
    file_col = p.params.get("file-col", "path")
    size_col = p.params.get("size-col", "bytes")
    target = int(p.params.get("target", str(128 * 1024 * 1024)))

    def run(spark: SparkSession, df: DataFrame) -> DataFrame:
        from spark_etl_cli_spark.operators.curation import compaction_plan

        return compaction_plan(df, part, file_col, size_col, target)

    return run


@register_transform("skew-profile")
def skew_profile_transform(p: ParsedUri) -> TransformFn:
    """``in+out+skew-profile://?key=o_custkey&top=20``.

    Join-key skew profile (operators/curation.py): top-k heaviest keys
    with share-of-table and count/mean skew ratio — the pre-flight
    check that decides broadcast vs salting vs AQE skew-join handling.
    """
    key = p.params.get("key") or (p.path.lstrip("/") or p.authority)
    if not key:
        raise ValueError("skew-profile:// needs ?key=<column>")
    top = int(p.params.get("top", "10"))

    def run(spark: SparkSession, df: DataFrame) -> DataFrame:
        from spark_etl_cli_spark.operators.curation import key_skew_profile

        return key_skew_profile(df, key, top)

    return run


@register_transform("pagerank")
def pagerank_transform(p: ParsedUri) -> TransformFn:
    """``in+out+pagerank://?src=src&dst=dst&weight=w&iters=3&damping=0.85``.

    Fixed-iteration weighted PageRank over an edge view
    (operators/graph.py): returns (vertex, pagerank), deterministic
    under any partitioning (sorted-fold contribution sums).
    """
    src = p.params.get("src", "src")
    dst = p.params.get("dst", "dst")
    weight = p.params.get("weight", "w")
    iters = int(p.params.get("iters", "3"))
    damping = float(p.params.get("damping", "0.85"))

    def run(spark: SparkSession, df: DataFrame) -> DataFrame:
        from spark_etl_cli_spark.operators.graph import pagerank

        return pagerank(df, iters, damping, src, dst, weight)

    return run


@register_transform("triangles")
def triangles_transform(p: ParsedUri) -> TransformFn:
    """``in+out+triangles://?u=u&v=v`` over canonical undirected edges
    (one row per edge, u < v): global (n_edges, n_wedges, n_triangles)
    via degree orientation (operators/graph.py)."""
    u = p.params.get("u", "u")
    v = p.params.get("v", "v")

    def run(spark: SparkSession, df: DataFrame) -> DataFrame:
        from spark_etl_cli_spark.operators.graph import triangle_count

        return triangle_count(df, u, v)

    return run


@register_transform("tfidf-topk")
def tfidf_topk_transform(p: ParsedUri) -> TransformFn:
    """``in+out+tfidf-topk://?k=5&ngram=2&df-cap-frac=0.2&id-col=doc_id&text-col=text&query-ids=0,1,2``.

    Sparse TF-IDF cosine top-k retrieval (operators/retrieval.py);
    ``query-ids`` restricts the query side (default: all docs).
    """
    k = int(p.params.get("k", "5"))
    ngram = int(p.params.get("ngram", "2"))
    frac = float(p.params.get("df-cap-frac", "0.2"))
    id_col = p.params.get("id-col", "doc_id")
    text_col = p.params.get("text-col", "text")
    qids = _csv_param(p, "query-ids")

    def run(spark: SparkSession, df: DataFrame) -> DataFrame:
        from pyspark.sql import functions as F

        from spark_etl_cli_spark.operators.retrieval import sparse_cosine_topk

        pred = F.col("query_id").isin([int(q) for q in qids]) if qids else None
        return sparse_cosine_topk(
            df, k=k, df_cap_frac=frac, ngram=ngram, query_pred=pred,
            id_col=id_col, text_col=text_col,
        )

    return run


@register_transform("attribution")
def attribution_transform(p: ParsedUri) -> TransformFn:
    """``in+out+attribution://?conversion=purchase&user-col=user_id&ts-col=ts&value-col=value&order=event_id``.

    Last-touch conversion attribution over an event view
    (operators/events.py): one row per touch type with conversion
    count and total attributed value.
    """
    conversion = p.params.get("conversion", "purchase")
    user_col = p.params.get("user-col", "user_id")
    type_col = p.params.get("type-col", "event_type")
    ts_col = p.params.get("ts-col", "ts")
    value_col = p.params.get("value-col", "value")
    order_cols = _csv_param(p, "order") or None

    def run(spark: SparkSession, df: DataFrame) -> DataFrame:
        from spark_etl_cli_spark.operators.events import last_touch_attribution

        return last_touch_attribution(
            df, conversion, user_col, type_col, ts_col, value_col, order_cols
        )

    return run


@register_transform("regression")
def regression_transform(p: ParsedUri) -> TransformFn:
    """``in+out+regression://?x=day&y=cents&by=priority,region``.

    Closed-form per-group OLS of y on x (operators/profiling.py):
    (groups..., n, slope, intercept, r2). Integer-encoded x/y make the
    result partition-order independent (exact sufficient statistics).
    """
    x = p.params.get("x")
    y = p.params.get("y")
    if not x or not y:
        raise ValueError("regression:// needs ?x=<col>&y=<col>")
    by = _csv_param(p, "by")

    def run(spark: SparkSession, df: DataFrame) -> DataFrame:
        from spark_etl_cli_spark.operators.profiling import group_regression

        return group_regression(df, x, y, by)

    return run


@register_transform("histogram")
def histogram_transform(p: ParsedUri) -> TransformFn:
    """``in+out+histogram://?col=o_totalprice&lo=0&width=25000&buckets=24``.

    Equi-width histogram (operators/profiling.py): (bucket, lo, hi,
    n_rows), clamped to [0, buckets); one scan + one tiny groupBy.
    """
    col = p.params.get("col")
    if not col:
        raise ValueError("histogram:// needs ?col=<column>")
    lo = float(p.params.get("lo", "0"))
    width = float(p.params.get("width", "1"))
    buckets = int(p.params.get("buckets", "20"))
    if width <= 0:
        raise ValueError("histogram:// needs width > 0, got %r" % width)
    if buckets < 1:
        raise ValueError("histogram:// needs buckets >= 1, got %r" % buckets)

    def run(spark: SparkSession, df: DataFrame) -> DataFrame:
        from spark_etl_cli_spark.operators.profiling import equi_width_histogram

        return equi_width_histogram(df, col, lo, width, buckets)

    return run


@register_transform("outliers")
def outliers_transform(p: ParsedUri) -> TransformFn:
    """``in+out+outliers://?col=value&by=event_type&z=3``.

    Z-score outlier filter (operators/profiling.py): keeps rows with
    |value − μ_group| > z·σ_group and appends the ``z`` column; group
    moments broadcast back (exact sums for integral values).
    """
    col = p.params.get("col")
    if not col:
        raise ValueError("outliers:// needs ?col=<column>")
    by = _csv_param(p, "by")
    z = float(p.params.get("z", "3"))

    def run(spark: SparkSession, df: DataFrame) -> DataFrame:
        from spark_etl_cli_spark.operators.profiling import zscore_outliers

        return zscore_outliers(df, col, by, z)

    return run


@register_transform("vocab-coverage")
def vocab_coverage_transform(p: ParsedUri) -> TransformFn:
    """``in+out+vocab-coverage://?text-col=text&pct=95``.

    Smallest frequency-ranked vocabulary covering pct% of token
    occurrences (operators/profiling.py): one row (vocab_size,
    covered_tokens, total_tokens).
    """
    text_col = p.params.get("text-col", "text")
    pct = int(p.params.get("pct", "95"))

    def run(spark: SparkSession, df: DataFrame) -> DataFrame:
        from spark_etl_cli_spark.operators.profiling import vocab_coverage

        return vocab_coverage(df, text_col, pct)

    return run


@register_transform("bpe-train")
def bpe_train_transform(p: ParsedUri) -> TransformFn:
    """``in+out+bpe-train://?merges=20&text-col=text&max-word-len=32``.

    Learn a BPE merge table from the input corpus (operators/
    encoding.py): (merge_rank, left, right, merged, pair_count), one
    row per merge in application order — feed it to a tokenizer, or
    join against ``vocab-encode`` pipelines.
    """
    merges = int(p.params.get("merges", "20"))
    text_col = p.params.get("text-col", "text")
    max_word_len = int(p.params.get("max-word-len", "32"))
    if merges < 1:
        raise ValueError("bpe-train:// needs merges >= 1")

    def run(spark: SparkSession, df: DataFrame) -> DataFrame:
        from spark_etl_cli_spark.operators.encoding import bpe_train

        return bpe_train(df, merges, text_col, max_word_len)

    return run


@register_transform("novelty")
def novelty_transform(p: ParsedUri) -> TransformFn:
    """``in+out+novelty://?id-col=doc_id&text-col=text&k=3``.

    Per-document first-occurrence k-gram novelty share
    (operators/profiling.py): (id, n_shingles, n_novel, novelty) — the
    corpus-audit memorization signal.
    """
    id_col = p.params.get("id-col", "doc_id")
    text_col = p.params.get("text-col", "text")
    k = int(p.params.get("k", "3"))

    def run(spark: SparkSession, df: DataFrame) -> DataFrame:
        from spark_etl_cli_spark.operators.profiling import ngram_novelty

        return ngram_novelty(df, id_col, text_col, k)

    return run


@register_transform("k-anon")
def k_anon_transform(p: ParsedUri) -> TransformFn:
    """``in+out+k-anon://?by=nationkey,segment&k=5``.

    k-anonymity audit (operators/profiling.py): quasi-identifier
    groups with fewer than k members — the pre-release privacy check.
    """
    by = _csv_param(p, "by")
    if not by:
        raise ValueError("k-anon:// needs ?by=<qi-col,...>")
    k = int(p.params.get("k", "5"))

    def run(spark: SparkSession, df: DataFrame) -> DataFrame:
        from spark_etl_cli_spark.operators.profiling import k_anonymity

        return k_anonymity(df, by, k)

    return run


@register_transform("media")
def media_transform(p: ParsedUri) -> TransformFn:
    """``in+out+media://?id-col=path&kind=image&payload-col=content``.

    Normalize any frame (e.g. a ``binaryfile://`` read) into the media
    schema (media_id, kind, payload, meta). Non-numeric id columns
    (file paths) are hashed to a stable 64-bit media_id.
    """
    id_col = p.params.get("id-col", "media_id")
    kind = p.params.get("kind", "image")
    payload_col = p.params.get("payload-col", "payload")

    def run(spark: SparkSession, df: DataFrame) -> DataFrame:
        from pyspark.sql import functions as F

        from spark_etl_cli_spark.operators.multimodal import (
            attach_binary_payload,
        )

        dtype = dict(df.dtypes).get(id_col)
        if dtype not in ("bigint", "int", "long", "smallint", "tinyint"):
            df = df.withColumn("__media_id", F.xxhash64(F.col(id_col)))
            return attach_binary_payload(df, "__media_id", kind, payload_col)
        return attach_binary_payload(df, id_col, kind, payload_col)

    return run


@register_transform("media-features")
def media_features_transform(p: ParsedUri) -> TransformFn:
    """``in+out+media-features://?op=image|audio|frames|resize&fake=true``.

    Arrow-batched feature extraction over a media view
    (operators/multimodal.py). Real codecs need PIL/ffmpeg/librosa;
    ``fake=true`` (default here — the container has no codecs) runs
    the deterministic digest-derived stub so the batch plumbing is
    exercised for real.
    """
    op = p.params.get("op", "image")
    fake = p.params.get("fake", "true").lower() != "false"
    every_n = int(p.params.get("every-n", "10"))
    width = int(p.params.get("width", "64"))
    height = int(p.params.get("height", "64"))

    def run(spark: SparkSession, df: DataFrame) -> DataFrame:
        from spark_etl_cli_spark.operators import multimodal as mm

        if op == "image":
            return mm.decode_image_features(df, fake=fake)
        if op == "audio":
            return mm.decode_audio_features(df, fake=fake)
        if op == "frames":
            return mm.sample_frames(df, every_n=every_n, fake=fake)
        if op == "resize":
            return mm.resize_images(df, width, height, fake=fake)
        raise ValueError(f"media-features:// unknown op {op!r}")

    return run


@register_transform("payload-dedup")
def payload_dedup_transform(p: ParsedUri) -> TransformFn:
    """``in+out+payload-dedup://?id-col=media_id&payload-col=payload``:
    content-addressable exact dedup groups over binary payloads
    (operators/multimodal.py) — (digest, keep_id, group_size, n_bytes)
    per duplicate group; the shuffle carries digests, not payloads."""
    id_col = p.params.get("id-col", "media_id")
    payload_col = p.params.get("payload-col", "payload")

    def run(spark: SparkSession, df: DataFrame) -> DataFrame:
        from spark_etl_cli_spark.operators.multimodal import (
            payload_dedup_groups,
        )

        return payload_dedup_groups(df, id_col, payload_col)

    return run


@register_transform("chunk-dedup")
def chunk_dedup_transform(p: ParsedUri) -> TransformFn:
    """``in+out+chunk-dedup://?payload-col=payload&chunk-bytes=256``:
    fixed-size chunk dedup savings estimate (one row: total/unique/dup
    chunks + ratio) over binary payloads (operators/multimodal.py)."""
    payload_col = p.params.get("payload-col", "payload")
    chunk_bytes = int(p.params.get("chunk-bytes", "256"))

    def run(spark: SparkSession, df: DataFrame) -> DataFrame:
        from spark_etl_cli_spark.operators.multimodal import chunk_dedup_stats

        return chunk_dedup_stats(df, payload_col, chunk_bytes)

    return run
