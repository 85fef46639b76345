"""Text analysis for training-data pipelines — all JVM-native Columns
(whole-stage codegen; no Python anywhere).

language-ID: stopword-hit heuristic over five languages; quality: length /
punctuation / stopword-ratio features; token counting: whitespace + a
BPE-ish subword regex; fingerprint: 64-bit content hash + shape signature.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "en", "para", "que"],
    "it": ["il", "la", "le", "e", "è", "un", "una", "per", "che", "di"],
}

_TOKENS = "split(lower(trim({c})), '\\\\s+')"
# BPE-ish subword segmentation: letter-runs, digit-runs, single punctuation
_SUBWORD_RE = "[a-z]+|[0-9]+|[^a-z0-9\\\\s]"


def tokens_col(text_col: str) -> F.Column:
    return F.expr(_TOKENS.format(c=text_col))


def token_count(text_col: str) -> F.Column:
    return F.size(tokens_col(text_col))


def subword_count(text_col: str) -> F.Column:
    """BPE-ish token count via regexp extraction (JVM regex, no Python)."""
    return F.size(F.expr(f"regexp_extract_all(lower({text_col}), '{_SUBWORD_RE}', 0)"))


def punct_ratio(text_col: str) -> F.Column:
    stripped = F.regexp_replace(F.col(text_col), "[\\p{Punct}]", "")
    return (F.length(text_col) - F.length(stripped)) / F.greatest(
        F.length(text_col), F.lit(1)
    )


def stopword_ratio(text_col: str, lang: str = "en") -> F.Column:
    toks = tokens_col(text_col)
    hits = F.size(
        F.array_intersect(toks, F.array(*[F.lit(w) for w in STOPWORDS[lang]]))
    )
    return hits / F.greatest(F.size(toks), F.lit(1))


def langid_col(text_col: str) -> F.Column:
    """Heuristic language id: most stopword hits wins (argmax via array_max
    over (score, lang) structs — on equal scores the lexicographically
    *greatest* lang code wins, e.g. 'it' beats 'en')."""
    toks = tokens_col(text_col)
    scored = [
        F.struct(
            F.size(
                F.array_intersect(toks, F.array(*[F.lit(w) for w in ws]))
            ).alias("score"),
            F.lit(lang).alias("lang"),
        )
        for lang, ws in STOPWORDS.items()
    ]
    return F.array_max(F.array(*scored)).getField("lang")


def quality_score(text_col: str) -> F.Column:
    """[0, 1] quality heuristic: length band + low punctuation + healthy
    mean-token-length band — the standard cheap pretraining filters."""
    n_tok = token_count(text_col).cast("double")
    mean_tok_len = F.length(text_col).cast("double") / F.greatest(n_tok, F.lit(1.0))
    len_ok = F.when((n_tok >= 5) & (n_tok <= 100000), 1.0).otherwise(0.2)
    punct_ok = F.when(punct_ratio(text_col) < 0.3, 1.0).otherwise(0.3)
    tok_ok = F.when((mean_tok_len >= 2.5) & (mean_tok_len <= 12), 1.0).otherwise(0.4)
    return F.round((len_ok + punct_ok + tok_ok) / 3.0, 6)


def fingerprint_col(text_col: str) -> F.Column:
    """64-bit document fingerprint: content hash mixed with a shape signature
    (length, token count) — stable, collision-resistant for dedup joins."""
    return F.xxhash64(
        F.col(text_col), F.length(text_col), token_count(text_col)
    )


def winnow_fingerprints_col(text_col: str, k: int = 3, w: int = 4) -> F.Column:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken —
    "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD 2003):
    rolling k-gram hashes over the token stream, then the minimum of every
    w-window of gram hashes; the DISTINCT window minima are the document's
    fingerprint set.  Guarantee: any shared token run of length ≥ k+w−1
    between two documents shares at least one fingerprint.

    Entirely JVM-side Catalyst higher-order functions — no Python, no
    shuffle; per-row bounded work, shards with the table at 100 TB.  Hashes
    are the repo's portable 31-bit polynomial family (token: acc·131+code
    mod 2³¹; gram: acc·1000003+tokenhash mod 2³¹) so the whole pipeline
    replays exactly in ANSI SQL (driver oracle).  Each stage is let-bound
    via a single-element ``transform(array(·), x -> …)`` wrapper so the
    generated expression stays LINEAR in size instead of exploding when
    Catalyst inlines collapsed projections.

    Short documents: with 0 < n_grams < w the whole gram list forms one
    window (the paper's boundary case); an empty token list yields an
    empty fingerprint set.
    """
    toks = (
        f"filter(split(lower(trim({text_col})), '\\\\s+'), t -> length(t) > 0)"
    )
    hv = (
        f"transform({toks}, t -> aggregate(split(t, ''), 0L, "
        "(acc, c) -> (acc * 131 + ascii(c)) % 2147483648))"
    )
    grams = (
        f"transform(sequence(1, greatest(1, size(hv) - {k} + 1)), "
        f"i -> aggregate(slice(hv, i, {k}), 0L, "
        "(acc, h) -> (acc * 1000003 + h) % 2147483648))"
    )
    mins = (
        f"array_distinct(transform(sequence(1, greatest(1, size(gr) - {w} + 1)), "
        f"j -> array_min(slice(gr, j, {w}))))"
    )
    return F.expr(
        f"element_at(transform(array({hv}), hv -> "
        "  CASE WHEN size(hv) = 0 THEN array() "
        f" ELSE element_at(transform(array({grams}), gr -> {mins}), 1) END"
        "), 1)"
    )


def annotate(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the full text-analysis feature set."""
    return (
        df.withColumn("n_tokens", token_count(text_col))
        .withColumn("n_subwords", subword_count(text_col))
        .withColumn("punct_ratio", F.round(punct_ratio(text_col), 6))
        .withColumn("stopword_ratio_en", F.round(stopword_ratio(text_col, "en"), 6))
        .withColumn("lang_pred", langid_col(text_col))
        .withColumn("quality", quality_score(text_col))
        .withColumn("fingerprint", fingerprint_col(text_col))
    )
