"""Exact-substring (suffix-array-style) deduplication.

The dedup tier every production LLM-corpus pipeline runs that whole-doc
tiers (exact md5, MinHash, SimHash, embedding) cannot express:
cross-document duplication of any shared span of >= k consecutive
tokens — boilerplate headers, license blocks, quoted paragraphs —
detected at token-window granularity and removable span-by-span while
the rest of the document survives. The classic implementation is a
suffix array over the concatenated corpus (Lee et al., "Deduplicating
Training Data Makes Language Models Better", ACL 2022); a suffix array
is a fundamentally sequential, single-address-space structure, so the
Spark-shaped equivalent here reaches the same answer with distributed
primitives:

    1. explode each document into its k-token rolling windows
       (one posting per window occurrence),
    2. group postings by window into posting lists and generate
       cross-document candidate pairs IN-ROW (:func:`bucket_pairs` —
       one shuffle, no self-join),
    3. merge adjacent matched windows into MAXIMAL shared spans with
       a gaps-and-islands pass: windows of a pair sharing a diagonal
       (a_pos - b_pos) and consecutive a_pos belong to one span,
    4. decide/scrub: a document duplicating >= min_span consecutive
       tokens of an earlier (smaller-id) document is a dup (or has
       exactly those token ranges removed, earliest occurrence kept).

Reference capability anchor: the reference's `sql://` surface
(etl/src/main/scala/dev/mauch/spark/dfio/SqlTransform inventory in
SURVEY.md §2b) has no operator family for this; it completes the
dedup waterfall (exact -> simhash -> minhash -> embedding ->
substring) exposed at `dedup://?mode=substring`.

100 TB shape: the only corpus-sized shuffle is the posting groupBy
(step 2) — ``k`` tokens of payload per posting under ``key='text'``
(bit-exact, the DuckDB-oracle rule) or a fixed 8-byte xxhash64 key
under ``key='hash'`` (the scale switch; collisions are possible at
~2^-64 per colliding pair, and ``verify=True`` re-slices both
documents' tokens at SPAN grain — spans are rare — and raises on any
mismatch rather than silently serving a hash artifact). Pair
generation never self-joins; spans/islands shuffle only the matched
pairs, which are corpus-duplication-sized, not corpus-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from spark_etl_cli_spark.operators.dedup import bucket_pairs
from spark_etl_cli_spark.operators.util import fan_out

__all__ = [
    "token_windows",
    "substring_dup_spans",
    "substring_dedup",
    "substring_scrub",
    "substring_contamination_spans",
    "substring_decontaminate",
]


def _tokens(text_col: str):
    return F.split(F.trim(F.col(text_col)), r"\s+")


def token_windows(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    key: str = "text",
) -> DataFrame:
    """One row per k-token rolling window occurrence:
    ``(id, pos, win)`` — ``pos`` is the 0-based token offset, ``win``
    the space-joined window text (``key='text'``) or the ``xxhash64``
    of the k-token slice (``key='hash'``: the window string is never
    built — tokens cannot contain whitespace, so token-array equality
    is exactly joined-text equality — and downstream shuffles carry an
    8-byte key instead of ~k tokens of text). Documents shorter than
    ``k`` tokens emit nothing. Pure per-row explode; no shuffle.

    The token array is STAGED AS A COLUMN before the window lambda
    touches it (Spark does no CSE inside lambda bodies — inline
    ``split`` re-evaluates per window), and under ``key='hash'`` each
    token is hashed ONCE up front so every window key hashes k longs
    instead of k strings — measured ~2x on the windows→postings path
    at sf0.1, and at scale the window-build work per token becomes a
    fixed 8 bytes rather than token-length. A window-key collision —
    between token slices or between per-token hashes — is still
    caught by the callers' span-grain verification, which raises
    rather than emit a false span."""
    toks = _tokens(text_col)
    if key == "hash":
        base = df.select(
            F.col(id_col).alias("id"),
            F.transform(toks, lambda t: F.xxhash64(t)).alias("__tw"),
        )
        win = lambda i: F.xxhash64(F.slice(F.col("__tw"), i + 1, k))  # noqa: E731
    else:
        base = df.select(F.col(id_col).alias("id"), toks.alias("__tw"))
        win = lambda i: F.array_join(  # noqa: E731
            F.slice(F.col("__tw"), i + 1, k), " "
        )
    return base.select(
        "id",
        F.explode(
            # sequence(0, n) with n < 0 would COUNT DOWN — guard short
            # docs with an empty array instead
            F.when(
                F.size("__tw") >= k,
                F.transform(
                    F.sequence(F.lit(0), F.size("__tw") - k),
                    lambda i: F.struct(
                        i.alias("pos"), win(i).alias("win")
                    ),
                ),
            ).otherwise(F.array())
        ).alias("w"),
    ).select("id", "w.pos", "w.win")


def substring_dup_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    key: str = "text",
    verify: bool = True,
    max_df: int | None = None,
) -> DataFrame:
    """MAXIMAL cross-document shared token spans:
    ``(doc_a, doc_b, a_start, b_start, span_len)`` with
    ``doc_a < doc_b``, token offsets 0-based, ``span_len >= k`` in
    tokens. A span is maximal per alignment: matched k-windows of a
    pair on one diagonal (``a_pos - b_pos``) with consecutive
    positions merge into one row.

    ``key='text'`` buckets postings by the window text itself —
    bit-exact, identical to the DuckDB oracle rule, shuffling ~k
    tokens per posting. ``key='hash'`` buckets by ``xxhash64(win)``
    (8-byte shuffle key, the 100 TB switch); with ``verify=True``
    (default) every resulting span is confirmed by re-slicing both
    documents' token arrays — span-grain work, spans are rare — and a
    mismatch RAISES (hash collision: rerun with key='text') instead
    of silently emitting a false span.

    ``max_df`` drops windows occurring in more than ``max_df``
    postings (stop-phrase boilerplate cap) — EXACTNESS TRADE: spans
    supported only by capped windows disappear. None (default) = no
    cap.
    """
    if key not in ("text", "hash"):
        raise ValueError(f"substring dedup: key must be text|hash, got {key!r}")
    # documents are compute-dense and often arrive in one byte-split
    # file partition; tokenize/window across the cluster, not one core
    df = fan_out(df)
    w = token_windows(df, text_col, id_col, k, key=key)
    entries = w.select(
        F.col("win").alias("bucket"),
        F.struct("id", "pos").alias("e"),
    )
    pairs = (
        bucket_pairs(entries, "bucket", max_bucket_size=max_df)
        .filter(F.col("a.id") != F.col("b.id"))
        .select(
            F.col("a.id").alias("doc_a"),
            F.col("b.id").alias("doc_b"),
            F.col("a.pos").alias("a_pos"),
            F.col("b.pos").alias("b_pos"),
        )
    )
    spans = _islands_to_spans(pairs, k, "doc_a", "doc_b")
    if key == "hash" and verify:
        # materialize the (rare) span set once so the verification pass
        # and every downstream consumer read it back instead of
        # re-executing the corpus-sized posting shuffle
        spans = spans.localCheckpoint()
        spans = _verify_spans(spans, df, df, text_col, id_col, text_col, id_col)
    return spans


def _islands_to_spans(
    pairs: DataFrame, k: int, id_a: str, id_b: str
) -> DataFrame:
    """Matched (a_pos, b_pos) windows of a pair -> MAXIMAL spans: the
    gaps-and-islands merge of diagonal-consecutive windows. Pair-sized
    work (one exchange on (pair, diagonal))."""
    diag = (F.col("a_pos") - F.col("b_pos")).alias("diag")
    isl = (
        F.col("a_pos")
        - F.row_number().over(
            Window.partitionBy(id_a, id_b, diag).orderBy("a_pos")
        )
    ).alias("isl")
    return (
        pairs.select(id_a, id_b, "a_pos", "b_pos", diag, isl)
        .groupBy(id_a, id_b, "diag", "isl")
        .agg(
            F.min("a_pos").alias("a_start"),
            F.min("b_pos").alias("b_start"),
            (F.max("a_pos") - F.min("a_pos") + k).alias("span_len"),
        )
        .select(id_a, id_b, "a_start", "b_start", "span_len")
    )


def _verify_spans(
    spans: DataFrame,
    df_a: DataFrame,
    df_b: DataFrame,
    text_a: str,
    id_a_src: str,
    text_b: str,
    id_b_src: str,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
) -> DataFrame:
    """Confirm every hash-keyed span by comparing the actual token
    slices of both documents; raise on the first mismatch (a 2^-64
    xxhash64 bucket collision) so key='hash' is exact-or-loud, never
    silently wrong. Span-grain: ``spans`` arrives materialized
    (checkpointed by the callers), so its doc ids are collected first
    and pushed into the token scans as id filters — the check then
    re-tokenizes only the (rare) documents that actually appear in a
    span instead of both full corpora."""
    _ID_PUSHDOWN_CAP = 50_000  # InSet stays O(1)/row; plans stay small

    def _ids(col: str) -> list | None:
        vals = [r[0] for r in spans.select(col).distinct().collect()]
        return vals if len(vals) <= _ID_PUSHDOWN_CAP else None

    a_ids, b_ids = _ids(id_a), _ids(id_b)
    if a_ids is not None:
        df_a = df_a.filter(F.col(id_a_src).isin(a_ids))
    if b_ids is not None:
        df_b = df_b.filter(F.col(id_b_src).isin(b_ids))
    toks_a = df_a.select(
        F.col(id_a_src).alias("_vid"), _tokens(text_a).alias("_vt")
    )
    toks_b = df_b.select(
        F.col(id_b_src).alias("_vid"), _tokens(text_b).alias("_vt")
    )
    both = (
        spans.join(toks_a, spans[id_a] == toks_a["_vid"])
        .withColumnRenamed("_vt", "_ta")
        .drop("_vid")
        .join(toks_b, spans[id_b] == toks_b["_vid"])
        .withColumnRenamed("_vt", "_tb")
        .drop("_vid")
    )
    mismatch = ~(
        F.slice(F.col("_ta"), F.col("a_start") + 1, F.col("span_len"))
        == F.slice(F.col("_tb"), F.col("b_start") + 1, F.col("span_len"))
    )
    bad = both.filter(mismatch).limit(1).collect()
    if bad:
        r = bad[0]
        raise ValueError(
            "substring spans (key='hash'): span verification failed "
            f"for docs ({r[id_a]}, {r[id_b]}) at "
            f"({r['a_start']}, {r['b_start']}) len {r['span_len']} — "
            "an xxhash64 window collision; rerun with key='text'."
        )
    # every span just verified equal — the (checkpointed) input frame
    # IS the result; re-deriving it through the token joins on the
    # returned plan would only repeat the check downstream
    return spans


def substring_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_span: int = 12,
    key: str = "text",
    max_df: int | None = None,
) -> DataFrame:
    """Whole-document decision on top of :func:`substring_dup_spans`:
    a document sharing a span of >= ``min_span`` tokens with ANY
    smaller-id (earlier) document is a duplicate. One row per input
    document: ``(id, dup_of, shared_span)`` — ``dup_of`` NULL =
    survivor, else the SMALLEST qualifying earlier doc id;
    ``shared_span`` = the longest span shared with any earlier doc
    (NULL when none). Decision aggregation is span-sized, the doc
    join id-keyed."""
    spans = substring_dup_spans(
        df, text_col, id_col, k=k, key=key, max_df=max_df
    )
    dec = (
        spans.filter(F.col("span_len") >= min_span)
        .groupBy(F.col("doc_b").alias("id"))
        .agg(
            F.min("doc_a").alias("dup_of"),
            F.max("span_len").alias("shared_span"),
        )
    )
    return df.select(F.col(id_col).alias("id")).join(dec, "id", "left")


def substring_scrub(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_span: int = 12,
    key: str = "text",
    max_df: int | None = None,
) -> DataFrame:
    """Span REMOVAL — the surgical alternative to dropping whole
    documents: from every document, delete exactly the token ranges
    duplicating >= ``min_span`` consecutive tokens of an earlier
    (smaller-id) document; the earliest occurrence always survives.
    Returns one row per input document:
    ``(id, text_clean, removed_tokens)`` with ``text_clean`` the
    surviving tokens space-joined (whitespace-normalized) and
    ``removed_tokens`` the count of deleted tokens (0 for untouched
    docs).

    Overlapping qualifying spans union before removal (standard
    gaps-and-islands interval merge per document, span-sized), so a
    token is never double-counted and the removal set is
    order-independent. Everything after the span computation is
    span-grain + one id-keyed join against the documents."""
    spans = substring_dup_spans(
        df, text_col, id_col, k=k, key=key, max_df=max_df
    )
    iv = spans.filter(F.col("span_len") >= min_span).select(
        F.col("doc_b").alias("id"),
        F.col("b_start").alias("s"),
        (F.col("b_start") + F.col("span_len")).alias("e"),
    )
    return _remove_intervals(df, iv, text_col, id_col)


def _remove_intervals(
    df: DataFrame, iv: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Delete token ranges ``iv`` = (id, s, e) from each document:
    standard gaps-and-islands interval UNION per doc (span-sized), one
    id-keyed join back, in-row token filtering. Returns
    ``(id, text_clean, removed_tokens)`` for every input doc."""
    df = fan_out(df)  # full-corpus re-tokenization below: spread it
    prev_end = F.max("e").over(
        Window.partitionBy("id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    brk = F.when(
        prev_end.isNull() | (F.col("s") > prev_end), 1
    ).otherwise(0)
    isl = F.sum(brk).over(
        Window.partitionBy("id")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = (
        iv.withColumn("isl", isl)
        .groupBy("id", "isl")
        .agg(F.min("s").alias("s"), F.max("e").alias("e"))
        .groupBy("id")
        .agg(F.collect_list(F.struct("s", "e")).alias("cut"))
    )
    toks = _tokens(text_col)
    out = df.select(F.col(id_col).alias("id"), toks.alias("t")).join(
        merged, "id", "left"
    )
    pos_t = F.transform(
        F.col("t"), lambda tk, i: F.struct(tk.alias("tk"), i.alias("i"))
    )
    kept = F.when(F.col("cut").isNull(), pos_t).otherwise(
        F.filter(
            pos_t,
            lambda x: ~F.exists(
                F.col("cut"),
                lambda v: (x["i"] >= v["s"]) & (x["i"] < v["e"]),
            ),
        )
    )
    return out.select(
        "id",
        F.array_join(
            F.transform(kept, lambda x: x["tk"]), " "
        ).alias("text_clean"),
        (F.size("t") - F.size(kept)).alias("removed_tokens"),
    )


def substring_contamination_spans(
    train: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str | None = None,
    bench_id_col: str | None = None,
    k: int = 8,
    key: str = "text",
    verify: bool = True,
) -> DataFrame:
    """Train/benchmark CONTAMINATION at substring grain — the
    GPT-3/PaLM-style decontamination rule (a training doc is
    contaminated when it contains a >= k-token verbatim span of a
    benchmark doc), strictly stronger evidence than shared-n-gram
    COUNTS (``decontaminate://``'s default rule), which fire on
    reordered or coincidental n-grams.

    Returns maximal shared spans
    ``(train_doc_id, bench_doc_id, t_start, b_start, span_len)``.

    100 TB shape: the benchmark side is benchmark-suite-sized, so its
    window postings BROADCAST — the corpus-sized train postings stream
    map-side through the join and never shuffle; only matched windows
    (contamination-sized) reach the islands exchange. ``key='hash'``
    joins on the 8-byte xxhash64 of the window with span-grain
    verification (raises on a collision), ``key='text'`` is the
    bit-exact oracle rule.
    """
    if key not in ("text", "hash"):
        raise ValueError(
            f"substring contamination: key must be text|hash, got {key!r}"
        )
    b_text = bench_text_col or text_col
    b_id = bench_id_col or id_col
    # key='hash': both sides emit 8-byte window hashes — the corpus
    # side never builds a window string at all (token_windows hashes
    # the token slice in-row); a hash collision is caught by the
    # span-grain _verify_spans below, which raises rather than emit a
    # false span.
    train = fan_out(train)  # corpus-side windows: full-width, not 1 task
    tw = token_windows(train, text_col, id_col, k, key=key)
    bw = token_windows(bench, b_text, b_id, k, key=key)
    matched = tw.alias("t").join(
        F.broadcast(bw.alias("b")), F.col("t.win") == F.col("b.win")
    )
    pairs = matched.select(
        F.col("t.id").alias("train_doc_id"),
        F.col("b.id").alias("bench_doc_id"),
        F.col("t.pos").alias("a_pos"),
        F.col("b.pos").alias("b_pos"),
    )
    spans = _islands_to_spans(pairs, k, "train_doc_id", "bench_doc_id")
    spans = spans.select(
        "train_doc_id",
        "bench_doc_id",
        F.col("a_start").alias("t_start"),
        F.col("b_start").alias("b_start"),
        "span_len",
    )
    if key == "hash" and verify:
        # contamination spans are rarer still — checkpoint before the
        # verification collect so the posting join runs exactly once
        spans = spans.localCheckpoint()
        spans = _verify_spans(
            spans.withColumnRenamed("t_start", "a_start"),
            train, bench, text_col, id_col, b_text, b_id,
            id_a="train_doc_id", id_b="bench_doc_id",
        ).withColumnRenamed("a_start", "t_start")
    return spans


def substring_decontaminate(
    train: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    min_span: int = 12,
    key: str = "text",
    action: str = "drop",
    bench_text_col: str | None = None,
    bench_id_col: str | None = None,
) -> DataFrame:
    """Apply the substring contamination rule to the training set.

    ``action='drop'``: remove every training doc sharing a span of
    >= ``min_span`` tokens with any benchmark doc (anti-join against
    the contaminated-id set; train schema passes through).
    ``action='scrub'``: keep the docs but delete exactly the
    contaminated token ranges (interval union per doc, same machinery
    as :func:`substring_scrub`) — returns
    ``(id, text_clean, removed_tokens)`` for every training doc.
    """
    spans = substring_contamination_spans(
        train, bench, text_col, id_col,
        bench_text_col=bench_text_col, bench_id_col=bench_id_col,
        k=k, key=key,
    ).filter(F.col("span_len") >= min_span)
    if action == "drop":
        hits = spans.select(
            F.col("train_doc_id").alias(id_col)
        ).distinct()
        return train.join(hits, id_col, "left_anti")
    if action == "scrub":
        iv = spans.select(
            F.col("train_doc_id").alias("id"),
            F.col("t_start").alias("s"),
            (F.col("t_start") + F.col("span_len")).alias("e"),
        )
        return _remove_intervals(train, iv, text_col, id_col)
    raise ValueError(
        f"substring decontaminate: action must be drop|scrub, got {action!r}"
    )
