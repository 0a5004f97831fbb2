"""Text-analysis operators for training-data pipelines: token counting,
quality scoring, language ID, document fingerprinting.

All column expressions (JVM-side); language ID uses per-language stopword
hit rates — a deterministic n-gram/stopword heuristic, no model artifact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import normalize as N

STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "zu", "ist", "ein", "nicht", "mit", "sich"],
    "fr": ["le", "la", "de", "et", "un", "une", "est", "que", "pour", "dans"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "es", "por", "los"],
}


def tokens(col: Column) -> Column:
    """Whitespace tokens of trimmed text; empty text ⇒ empty array."""
    t = F.trim(col)
    return F.when(t == "", F.array().cast("array<string>")).otherwise(F.split(t, r"\s+"))


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column) -> Column:
    """Sub-word-ish token estimate: count of matches of a BPE-flavored
    regex (word pieces, numbers, punctuation runs) — the standard cheap
    proxy for tokenizer cost at corpus scale."""
    return F.size(F.regexp_extract_all(col, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"), 0))


def quality_features(col: Column) -> dict[str, Column]:
    """Heuristic quality signals: length, punct ratio, stopword ratio,
    mean word length, uppercase ratio, digit ratio."""
    toks = tokens(col)
    n_tok = F.size(toks)
    n_chars = F.length(col)
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, F.lower(t))))
    safe = lambda num, den: F.when(den > 0, num.cast("double") / den).otherwise(F.lit(0.0))
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tok.cast("long"),
        "punct_ratio": safe(F.length(F.regexp_replace(col, r"[A-Za-z0-9\s]", "")), n_chars),
        "stopword_ratio": safe(n_stop, n_tok),
        "mean_word_len": safe(
            F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t)), n_tok
        ),
        "upper_ratio": safe(F.length(F.regexp_replace(col, r"[^A-Z]", "")), n_chars),
        "digit_ratio": safe(F.length(F.regexp_replace(col, r"[^0-9]", "")), n_chars),
    }


def quality_score(col: Column) -> Column:
    """Composite 0-1 quality score: rewards stopword presence and sane
    word lengths, penalizes punctuation/digit noise and tiny docs."""
    f = quality_features(col)
    score = (
        F.lit(0.3) * F.least(f["stopword_ratio"] * 4.0, F.lit(1.0))
        + F.lit(0.25) * F.when((f["mean_word_len"] >= 3) & (f["mean_word_len"] <= 10), 1.0).otherwise(0.3)
        + F.lit(0.2) * (1.0 - F.least(f["punct_ratio"] * 5.0, F.lit(1.0)))
        + F.lit(0.15) * (1.0 - F.least(f["digit_ratio"] * 5.0, F.lit(1.0)))
        + F.lit(0.1) * F.least(f["n_tokens"].cast("double") / 50.0, F.lit(1.0))
    )
    return F.round(score, 6)


def language_scores(col: Column) -> dict[str, Column]:
    """Per-language stopword hit rate over the document's tokens."""
    toks = F.transform(tokens(N.desc_norm(col)), lambda t: t)
    n = F.size(toks)
    out = {}
    for lang, words in STOPWORDS.items():
        arr = F.array(*[F.lit(w) for w in words])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
        out[lang] = F.when(n > 0, hits.cast("double") / n).otherwise(F.lit(0.0))
    return out


def language_id(col: Column, min_score: float = 0.02) -> Column:
    """argmax language by stopword rate; 'und' (undetermined) below floor.

    Deterministic tie-break by language code.
    """
    scores = language_scores(col)
    pairs = F.array(
        *[F.struct(scores[lang].alias("score"), F.lit(lang).alias("lang"))
          for lang in sorted(scores)]
    )
    best = F.array_max(pairs)  # struct compare: score first, then lang
    return F.when(best["score"] >= min_score, best["lang"]).otherwise(F.lit("und"))


def fingerprint(col: Column) -> Column:
    """Canonical document fingerprint: sha256 of normalized text — the
    dedup/citation key (≈ invoice_payload_hash, app/normalization.py:66-70)."""
    return F.sha2(N.desc_norm(col), 256)


def rolling_fingerprints(col: Column, window: int = 8) -> Column:
    """Winnowing-style fingerprint set: xxhash64 of each ``window``-token
    shingle, keep every hash ≡ 0 (mod 8) — a deterministic sample of the
    document's local structure for containment detection."""
    toks = tokens(N.desc_norm(col))
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - window, F.lit(0)))
    hashes = F.transform(
        idx, lambda i: F.xxhash64(F.array_join(F.slice(toks, i + 1, window), " "))
    )
    sampled = F.filter(hashes, lambda h: F.pmod(h, F.lit(8)) == 0)
    return F.when(n >= window, F.array_distinct(sampled)).otherwise(
        F.array().cast("array<bigint>")
    )


def with_text_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the full text-analysis column set."""
    c = F.col(text_col)
    out = docs
    for name, expr in quality_features(c).items():
        out = out.withColumn(name, expr)
    return (
        out.withColumn("quality_score", quality_score(c))
        .withColumn("lang_pred", language_id(c))
        .withColumn("doc_fingerprint", fingerprint(c))
        .withColumn("bpe_token_count", bpe_ish_token_count(c))
    )
