"""Text-analysis column functions for large-scale corpus pipelines.

All pure built-in-function compositions (JVM-side, codegen'd): no
Python UDFs anywhere, so these run at full whole-stage-codegen speed
over 100 TB of documents. Each has deterministic cross-engine semantics
so a DuckDB oracle can verify it.

Capabilities (north-star extensions beyond the reference, per
SURVEY.md §2d north-star list): tokenization/counting, quality
scoring, language ID (stopword heuristic), document fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets for the heuristic language ID.
# Chosen to be regex-safe and language-distinctive.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "die", "und", "nicht", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
    "es": ["el", "los", "las", "que", "es"],
    "zh": ["de5", "shi4", "le5", "zai4", "he2"],
}


def normalize_ws(text: Column) -> Column:
    """Collapse whitespace runs and trim — canonical text form."""
    return F.trim(F.regexp_replace(text, r"\s+", " "))


def token_count(text: Column) -> Column:
    """Whitespace token count (0 for empty/blank strings)."""
    norm = normalize_ws(text)
    return F.when(F.length(norm) == 0, F.lit(0)).otherwise(
        F.size(F.split(norm, " "))
    ).cast("bigint")


def tokens(text: Column) -> Column:
    """Lower-cased whitespace tokens of the normalized text."""
    return F.split(F.lower(normalize_ws(text)), " ")


def char_ngrams(text: Column, n: int) -> Column:
    """Array of character n-grams (for shingle-based dedup)."""
    norm = F.lower(normalize_ws(text))
    # sequence of start offsets 1..len-n+1, substring per offset
    return F.expr(
        f"transform(sequence(1, greatest(length({_sql(norm)}) - {n} + 1, 0)), "
        f"i -> substring({_sql(norm)}, i, {n}))"
    )


def _sql(col: Column) -> str:
    # Column → SQL text usable inside F.expr (internal helper).
    return col._jc.toString()  # noqa: SLF001


def word_shingles(text: Column, k: int = 3) -> Column:
    """Array of distinct k-word shingles, joined with single spaces.

    Guarded for short docs: Spark's ``sequence(1, 0)`` counts *down*
    ([1, 0]) and ``slice(_, 0, _)`` then throws, so docs with fewer than
    k tokens return an empty array explicitly.
    """
    toks = tokens(text)
    shingles = F.transform(
        F.sequence(F.lit(1), F.size(toks) - F.lit(k - 1)),
        lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
    )
    return F.array_distinct(
        F.when(F.size(toks) >= k, shingles).otherwise(
            F.array().cast("array<string>")
        )
    )


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are not alphanumeric/space."""
    clean = F.regexp_replace(text, r"[A-Za-z0-9 ]", "")
    return F.when(F.length(text) == 0, F.lit(0.0)).otherwise(
        F.length(clean).cast("double") / F.length(text).cast("double")
    )


def stopword_ratio(text: Column, stopwords: list[str] | None = None) -> Column:
    """Fraction of tokens that are common-English stopwords."""
    sw = stopwords or ["the", "a", "an", "and", "of", "to", "in", "is", "it"]
    toks = tokens(text)
    hits = F.size(F.filter(toks, lambda t: t.isin(sw)))
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        hits.cast("double") / F.size(toks).cast("double")
    )


def quality_score(text: Column) -> Column:
    """Composite quality heuristic in [0,1]: favors mid-length docs with
    low punctuation noise and a natural stopword rate.

    score = 0.4*length_score + 0.3*(1-punct_ratio) + 0.3*stopword_presence
    with length_score = min(n_tokens, 100)/100.
    """
    ntok = token_count(text)
    length_score = F.least(ntok, F.lit(100)).cast("double") / F.lit(100.0)
    sw = stopword_ratio(text)
    sw_presence = F.least(sw * F.lit(5.0), F.lit(1.0))
    return (
        F.lit(0.4) * length_score
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio(text))
        + F.lit(0.3) * sw_presence
    )


def lang_scores(text: Column) -> dict[str, Column]:
    """Marker-token hit count per candidate language."""
    toks = tokens(text)
    return {
        lang: F.size(F.filter(toks, lambda t: t.isin(markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(text: Column) -> Column:
    """Heuristic language ID: language with the most marker hits;
    deterministic tie-break on language code; 'und' when no hits."""
    scores = lang_scores(text)
    pairs = F.array(
        *[
            F.struct(score.cast("bigint").alias("hits"), F.lit(lang).alias("lang"))
            for lang, score in sorted(scores.items())
        ]
    )
    best = F.array_max(F.filter(pairs, lambda p: p["hits"] > 0))
    # array_max on struct: max by hits then lang — ties pick the
    # lexicographically largest lang; invert lang for asc tie-break is
    # overkill here, document the tie rule instead.
    return F.when(best.isNull(), F.lit("und")).otherwise(best["lang"])


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the lower-cased,
    whitespace-normalized text (portable across engines)."""
    return F.md5(F.encode(F.lower(normalize_ws(text)), "UTF-8"))


def winnow_fingerprints(text: Column, k: int = 5, w: int = 4) -> Column:
    """MOSS-style winnowing fingerprints (Schleimer et al., SIGMOD'03).

    Hash every character k-gram, slide a window of ``w`` consecutive
    hashes, keep each window's minimum, return the distinct minima —
    the classic local-fingerprint scheme whose guarantee is: any shared
    substring of length >= k+w-1 yields at least one shared fingerprint.

    The k-gram hash is the first 15 hex chars of md5 (60 bits) rather
    than xxhash64, so the whole pipeline is replicable in ANSI SQL for
    the oracle. All array ops (sequence/transform/slice/min/distinct)
    are codegen'd built-ins — no shuffle, no UDF.
    """
    norm = F.lower(normalize_ws(text))
    n_grams = F.greatest(F.length(norm) - F.lit(k - 1), F.lit(0))
    gram_hashes = F.when(n_grams <= 0, F.array().cast("array<long>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.greatest(n_grams, F.lit(1))),
            lambda i: F.conv(
                F.md5(norm.substr(i, F.lit(k))).substr(1, 15), 16, 10
            ).cast("long"),
        )
    )
    n_windows = F.size(gram_hashes) - F.lit(w - 1)
    # sliding min as a zip_with fold over w shifted slices. The naive
    # transform(sequence, i -> array_min(slice(grams, i, w))) form
    # re-evaluates the whole gram-hash array inside every lambda call
    # (no CSE across higher-order-function lambdas) — O(n*w*n) md5s;
    # this shape evaluates it O(w) times per row.
    shifted = [
        F.slice(gram_hashes, i + 1, F.greatest(n_windows, F.lit(1)))
        for i in range(w)
    ]
    folded = shifted[0]
    for s in shifted[1:]:
        folded = F.zip_with(folded, s, lambda x, y: F.least(x, y))
    windows_min = F.when(
        n_windows <= 0,
        # short doc: a single window over whatever grams exist
        F.when(F.size(gram_hashes) > 0, F.array(F.array_min(gram_hashes))).otherwise(
            F.array().cast("array<long>")
        ),
    ).otherwise(folded)
    return F.array_sort(F.array_distinct(windows_min))
