"""Text analysis operators: token counting, quality scoring, language ID,
document fingerprinting.

Every operator is a pure Spark SQL expression (codegen'd, no UDF) with a
deterministic formula, so each has an exact DuckDB oracle. These are the
text-side analogs of the reference's derived-column convention — flags and
scores appended as ``f_*``-style columns
(/root/reference/datalib/patternTraderUtil.py:61-63 contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import ngrams_col, words_col

# tiny per-language stopword profiles for the n-gram/stopword heuristic
LANG_PROFILES = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "den"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"],
    "es": ["el", "la", "los", "las", "es", "un", "una", "que", "por", "con"],
}

BPE_ISH_REGEX = r"[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]"


def add_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + a BPE-ish regex token count (letters runs,
    single digits, single punctuation — a crude but deterministic proxy for
    subword tokenizers)."""
    ws = F.when(F.trim(F.col(text_col)) == "", 0).otherwise(
        F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    )
    bpe = F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH_REGEX), 0))
    return df.withColumn("n_tokens_ws", ws).withColumn("n_tokens_bpe", bpe)


def add_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality features + composite score in [0, 1]:
    length band, alpha ratio, punctuation ratio, mean word length,
    stopword(en) ratio. Deterministic arithmetic only."""
    t = F.col(text_col)
    n_chars = F.length(t)
    words = words_col(text_col)
    n_words = F.size(words)
    alpha_ratio = (F.length(F.regexp_replace(t, "[^a-zA-Z]", "")) / F.greatest(n_chars, F.lit(1)))
    punct_ratio = (
        F.length(F.regexp_replace(t, r"[^.,;:!?'\"()]", "")) / F.greatest(n_chars, F.lit(1))
    )
    mean_word_len = F.when(n_words > 0,
                           F.aggregate(words, F.lit(0), lambda a, w: a + F.length(w)) / n_words
                           ).otherwise(F.lit(0.0))
    stop_arr = F.array(*[F.lit(s) for s in LANG_PROFILES["en"]])
    stop_ratio = F.when(
        n_words > 0,
        F.size(F.filter(words, lambda w: F.array_contains(stop_arr, w))) / n_words,
    ).otherwise(F.lit(0.0))
    len_score = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    wordlen_score = F.when((mean_word_len >= 3) & (mean_word_len <= 10), 1.0).otherwise(0.5)
    punct_score = F.when(punct_ratio <= 0.1, 1.0).otherwise(0.5)
    # very short fragments are low-quality training data regardless of ratios
    short_penalty = F.when(n_words < 5, 0.5).otherwise(1.0)
    quality = short_penalty * (len_score + alpha_ratio + wordlen_score + punct_score) / F.lit(4.0)
    return (
        df.withColumn("n_chars_calc", n_chars)
        .withColumn("n_words", n_words)
        .withColumn("alpha_ratio", alpha_ratio)
        .withColumn("punct_ratio", punct_ratio)
        .withColumn("mean_word_len", mean_word_len)
        .withColumn("stopword_ratio", stop_ratio)
        .withColumn("quality", quality)
    )


def add_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-profile language ID: score each language by its stopword hit
    ratio over the word set; argmax wins, 'und' (undetermined) when no
    profile scores > 0."""
    words = words_col(text_col)
    scores = []
    for lang, stops in LANG_PROFILES.items():
        arr = F.array(*[F.lit(s) for s in stops])
        score = F.size(F.filter(words, lambda w: F.array_contains(arr, w)))
        scores.append(F.struct(score.alias("score"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    pred = F.when(best.getField("score") > 0, best.getField("lang")).otherwise(F.lit("und"))
    return df.withColumn("lang_pred", pred).withColumn(
        "lang_score", best.getField("score")
    )


def add_fingerprint(df: DataFrame, text_col: str = "text", n: int = 5) -> DataFrame:
    """Winnowing-lite document fingerprint: the lexicographic min of md5
    digests over word ``n``-grams (a rolling-hash fingerprint with window =
    whole doc). Identical-content docs share fingerprints; k-min variants
    extend this to similarity sketches."""
    grams = ngrams_col(words_col(text_col), n)
    fp = F.when(
        F.size(grams) > 0, F.array_min(F.transform(grams, lambda g: F.md5(g)))
    ).otherwise(F.md5(F.lower(F.col(text_col))))
    return df.withColumn("fingerprint", fp)
