"""Arrow-vectorized text map stages (guide §4.2).

``word_shingles`` (functions/text.py) is a pure built-in composition,
but its shingle loop is a higher-order ``transform`` whose body Spark
evaluates INTERPRETED (HOF lambdas never reach whole-stage codegen), so
every shingle position pays an interpreter dispatch plus a fresh
``slice`` + ``concat_ws`` allocation. That is the map-side cost under
every minhash / jaccard / containment / simhash / calibration query.

:func:`with_word_shingles` computes byte-identical shingles in ONE
``mapInArrow`` stage instead. The split of work is deliberate:

- **JVM side** keeps everything with regex/locale semantics — the
  whitespace normalization (Java ``\\s``), ``lower`` and ``trim`` run
  as the same codegen'd built-ins as before, producing the normalized
  string ``lower(trim(regexp_replace(text, '\\s+', ' ')))``. Python
  regex/casefold rules differ in corners (Unicode ``\\s``, locale
  lowering), so none of that is re-implemented here.
- **Python side** only does offset arithmetic: the normalized string
  IS its tokens joined by single spaces (the regex collapsed every
  whitespace run), so token boundaries are exactly the spaces and the
  k-shingle at position i is the SUBSTRING of the normalized string
  from token i's start to token i+k-1's end. No join, no re-concat —
  one slice per shingle, dedup via insertion-ordered dict, matching
  ``array_distinct``'s keep-first-occurrence order.

Byte-exact parity with ``word_shingles`` is pinned by
``tests/test_arrowtext.py`` over adversarial inputs (NULL, empty,
blank, Unicode spaces, emoji, CRLF/tabs, short docs) and the real
corpus; the shingle strings feed md5/xxhash oracles downstream, so the
DuckDB gates re-verify the parity end-to-end on every query that
adopts this stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from spark_etl_cli_spark.functions.text import normalize_ws


def _py_shingles(norm: str | None, k: int, distinct: bool) -> list[str]:
    """Shingles of an already-normalized string (single-space separated,
    no leading/trailing space). Twin of ``word_shingles`` given
    ``norm = lower(normalize_ws(text))``:

    - ``None`` → ``[]``  (size(NULL) is NULL → the when() falls through
      to the empty-array branch);
    - fewer than k tokens → ``[]`` (the short-doc guard);
    - otherwise one entry per position, each the substring spanning k
      tokens, optionally distinct with first-occurrence order.
    """
    if norm is None:
        return []
    toks = norm.split(" ")
    n = len(toks)
    if n < k:
        return []
    # norm == " ".join(toks): precompute each token's [start, end) in
    # norm; shingle i = norm[start_i : end_{i+k-1}]
    ends = []
    pos = 0
    starts = []
    for t in toks:
        starts.append(pos)
        pos += len(t)
        ends.append(pos)
        pos += 1  # the single separating space
    out = [norm[starts[i] : ends[i + k - 1]] for i in range(n - k + 1)]
    if distinct:
        out = list(dict.fromkeys(out))
    return out


def with_word_shingles(
    df: DataFrame,
    text_col: str = "text",
    k: int = 3,
    *,
    distinct: bool = True,
    out_col: str = "shingles",
    keep: list[str | Column] | None = None,
) -> DataFrame:
    """``df.select(*keep, word_shingles(text_col, k, distinct))`` as one
    Arrow stage — byte-identical output, vectorized instead of an
    interpreted per-position HOF.

    ``keep`` lists the columns to carry through the Python boundary
    (guide §4.1: pass ONLY what downstream needs — an opaque stage
    defeats column pruning, so the explicit projection here is the
    pruning). Defaults to every column except ``text_col``.

    Returns columns ``[*keep, out_col: array<string>]``.
    """
    if keep is None:
        keep = [c for c in df.columns if c != text_col]
    norm = F.lower(normalize_ws(F.col(text_col)))
    pre = df.select(*keep, norm.alias("__norm"))
    keep_names = pre.columns[:-1]
    keep_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in pre.schema[:-1]
    )
    out_schema = (
        f"{keep_schema}, `{out_col}` array<string>"
        if keep_names
        else f"`{out_col}` array<string>"
    )
    n_keep = len(keep_names)
    names = list(keep_names) + [out_col]

    def _batches(it):
        import pyarrow as pa

        for batch in it:
            if batch.num_rows == 0:
                continue
            norms = batch.column(n_keep).to_pylist()
            arr = pa.array(
                [_py_shingles(s, k, distinct) for s in norms],
                type=pa.list_(pa.string()),
            )
            yield pa.RecordBatch.from_arrays(
                [batch.column(i) for i in range(n_keep)] + [arr], names
            )

    return pre.mapInArrow(_batches, out_schema)


def with_shingle_md5_longs(
    df: DataFrame,
    text_col: str = "text",
    k: int = 3,
    *,
    hex_chars: int = 15,
    distinct: bool = True,
    out_col: str = "hs",
    keep: list[str | Column] | None = None,
) -> DataFrame:
    """Shingle + md5-prefix hash fused in ONE Arrow stage: ``out_col``
    is ``array<long>`` with one ``int(md5(shingle)[:hex_chars], 16)``
    per shingle — byte-identical to
    ``transform(word_shingles(text, k), s -> md5_long(s))``
    (``hex_chars=15``) / ``md5_long28`` (``hex_chars=7``), the
    oracle-replayable hash families of the minhash/simhash queries.

    Why fused: the per-shingle md5 otherwise runs INTERPRETED (inside a
    ``transform`` lambda) or as one codegen'd md5+conv per exploded
    row, and the shingle STRINGS cross the Python boundary back to the
    JVM just to be hashed and discarded. Hashing here keeps the
    return payload at 8 bytes per shingle and uses OpenSSL's md5 (C)
    via hashlib. md5 is md5 — the bytes hashed are the UTF-8 shingle,
    identical in both engines; parity is pinned in
    tests/test_arrowtext.py and by the adopting queries' oracles.
    """
    if keep is None:
        keep = [c for c in df.columns if c != text_col]
    norm = F.lower(normalize_ws(F.col(text_col)))
    pre = df.select(*keep, norm.alias("__norm"))
    keep_names = pre.columns[:-1]
    keep_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in pre.schema[:-1]
    )
    out_schema = (
        f"{keep_schema}, `{out_col}` array<bigint>"
        if keep_names
        else f"`{out_col}` array<bigint>"
    )
    n_keep = len(keep_names)
    names = list(keep_names) + [out_col]

    def _batches(it):
        from hashlib import md5

        import pyarrow as pa

        for batch in it:
            if batch.num_rows == 0:
                continue
            norms = batch.column(n_keep).to_pylist()
            out = [
                [
                    int(md5(s.encode("utf-8")).hexdigest()[:hex_chars], 16)
                    for s in _py_shingles(norm_s, k, distinct)
                ]
                for norm_s in norms
            ]
            arr = pa.array(out, type=pa.list_(pa.int64()))
            yield pa.RecordBatch.from_arrays(
                [batch.column(i) for i in range(n_keep)] + [arr], names
            )

    return pre.mapInArrow(_batches, out_schema)


def with_shingle_md5_hexes(
    df: DataFrame,
    text_col: str = "text",
    k: int = 3,
    *,
    hex_chars: int = 16,
    distinct: bool = True,
    out_col: str = "hs",
    keep: list[str | Column] | None = None,
) -> DataFrame:
    """Shingle + md5-hex-prefix fused in ONE Arrow stage: ``out_col``
    is ``array<string>`` with ``md5(shingle)[:hex_chars]`` per shingle
    — byte-identical to
    ``transform(word_shingles(text, k), s -> substring(md5(s), 1, n))``
    (Spark's md5() returns the lowercase hex digest, as hashlib does).
    The decontamination path (q111) keys on 16-hex-char prefixes: the
    fused stage returns 16 bytes per 8-word gram instead of the gram
    text, and hashes in OpenSSL instead of one codegen'd md5+substring
    per exploded row."""
    if keep is None:
        keep = [c for c in df.columns if c != text_col]
    norm = F.lower(normalize_ws(F.col(text_col)))
    pre = df.select(*keep, norm.alias("__norm"))
    keep_names = pre.columns[:-1]
    keep_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in pre.schema[:-1]
    )
    out_schema = (
        f"{keep_schema}, `{out_col}` array<string>"
        if keep_names
        else f"`{out_col}` array<string>"
    )
    n_keep = len(keep_names)
    names = list(keep_names) + [out_col]

    def _batches(it):
        from hashlib import md5

        import pyarrow as pa

        for batch in it:
            if batch.num_rows == 0:
                continue
            norms = batch.column(n_keep).to_pylist()
            out = [
                [
                    md5(s.encode("utf-8")).hexdigest()[:hex_chars]
                    for s in _py_shingles(norm_s, k, distinct)
                ]
                for norm_s in norms
            ]
            arr = pa.array(out, type=pa.list_(pa.string()))
            yield pa.RecordBatch.from_arrays(
                [batch.column(i) for i in range(n_keep)] + [arr], names
            )

    return pre.mapInArrow(_batches, out_schema)


def with_tagged_ngrams(
    df: DataFrame,
    text_col: str = "text",
    ks: tuple[int, ...] = (1, 2, 3),
    *,
    distinct: bool = False,
    out_col: str = "grams",
    keep: list[str | Column] | None = None,
) -> DataFrame:
    """All ``ks``-word shingles of each doc in ONE pass, tagged with
    their gram size: ``out_col`` is ``array<struct<n:int, g:string>>``,
    ordered by (position of k in ``ks``, shingle position) — exactly
    ``flatten(array(transform(word_shingles(text, k), g -> (k, g))
    for k in ks))``, the q182 shape, without the per-element struct
    transform (interpreted) or one shingle pass per k.

    Tokenization happens once per row; each k's shingles reuse the same
    token offsets.
    """
    if keep is None:
        keep = [c for c in df.columns if c != text_col]
    norm = F.lower(normalize_ws(F.col(text_col)))
    pre = df.select(*keep, norm.alias("__norm"))
    keep_names = pre.columns[:-1]
    keep_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in pre.schema[:-1]
    )
    gram_t = f"`{out_col}` array<struct<n: int, g: string>>"
    out_schema = f"{keep_schema}, {gram_t}" if keep_names else gram_t
    n_keep = len(keep_names)
    names = list(keep_names) + [out_col]
    ks = tuple(ks)

    def _tagged(norm_s: str | None) -> list[dict]:
        if norm_s is None:
            return []
        toks = norm_s.split(" ")
        n = len(toks)
        starts = []
        ends = []
        pos = 0
        for t in toks:
            starts.append(pos)
            pos += len(t)
            ends.append(pos)
            pos += 1
        out: list[dict] = []
        for k in ks:
            if n < k:
                continue
            grams = [
                norm_s[starts[i] : ends[i + k - 1]] for i in range(n - k + 1)
            ]
            if distinct:
                grams = list(dict.fromkeys(grams))
            out.extend({"n": k, "g": g} for g in grams)
        return out

    def _batches(it):
        import pyarrow as pa

        gram_type = pa.list_(
            pa.struct([("n", pa.int32()), ("g", pa.string())])
        )
        for batch in it:
            if batch.num_rows == 0:
                continue
            norms = batch.column(n_keep).to_pylist()
            arr = pa.array([_tagged(s) for s in norms], type=gram_type)
            yield pa.RecordBatch.from_arrays(
                [batch.column(i) for i in range(n_keep)] + [arr], names
            )

    return pre.mapInArrow(_batches, out_schema)
