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


def add_repetition_signals(
    df: DataFrame, text_col: str = "text", top_n: int = 2, dup_n: int = 5
) -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021, table A1's
    repetition filters; also used by MassiveText/Dolma-class pipelines):

    - ``dup_line_frac``     — fraction of non-empty lines that are repeats of
      an earlier-or-later identical line (1 - distinct/total);
    - ``dup_line_char_frac`` — fraction of line characters sitting in lines
      that occur more than once (every occurrence counts);
    - ``top_ngram_char_frac`` — characters covered by the heaviest word
      ``top_n``-gram (max over distinct grams of count × gram length, a
      deterministic tie-free variant of Gopher's most-frequent-gram rule)
      over total gram characters;
    - ``dup_ngram_char_frac`` — characters covered by word ``dup_n``-grams
      occurring more than once (count × length, overlapping occurrences
      counted) over total gram characters.

    A doc repeating one sentence a hundred times scores near 1.0 on all
    four; clean prose scores near 0. Thresholds are the caller's policy
    (Gopher drops dup_line_frac > 0.30, top 2-gram frac > 0.20,
    dup 5-gram frac > 0.15).

    Scale design: every signal is a pure codegen'd SQL expression over the
    row's own text — no shuffle, no UDF, no corpus-wide state. The n-gram
    counts run on the SORTED gram array with a single O(G) ``aggregate``
    pass (run-length counting), not a G^2 self-comparison, so long docs
    stay linear in gram count after the O(G log G) ``array_sort``.
    """
    t = F.col(text_col)
    # ---- line-level: split on newlines, keep non-blank trimmed lines ----
    lines = F.filter(
        F.transform(F.split(t, "\n"), lambda l: F.trim(l)), lambda l: l != ""
    )
    n_lines = F.size(lines)
    dup_line_frac = F.when(
        n_lines > 0,
        (n_lines - F.size(F.array_distinct(lines))) / n_lines.cast("double"),
    ).otherwise(F.lit(0.0))
    # chars in duplicated lines / chars in all lines, via one sorted
    # run-length pass: a line's chars count as duplicated iff its run > 1
    # (first run member retro-counted when the second arrives).
    sorted_lines = F.array_sort(lines)
    line_acc = F.aggregate(
        sorted_lines,
        F.struct(
            F.lit("").alias("prev"),
            F.lit(1).alias("run"),
            F.lit(0.0).alias("dupchars"),
            F.lit(0.0).alias("allchars"),
        ),
        lambda a, l: F.struct(
            l.alias("prev"),
            F.when(l == a["prev"], a["run"] + 1).otherwise(F.lit(1)).alias("run"),
            (
                a["dupchars"]
                + F.when(
                    l == a["prev"],
                    # second occurrence pays for itself AND the first
                    F.when(a["run"] == 1, F.length(l) * 2.0).otherwise(
                        F.length(l).cast("double")
                    ),
                ).otherwise(F.lit(0.0))
            ).alias("dupchars"),
            (a["allchars"] + F.length(l)).alias("allchars"),
        ),
    )
    dup_line_char_frac = F.when(
        line_acc["allchars"] > 0, line_acc["dupchars"] / line_acc["allchars"]
    ).otherwise(F.lit(0.0))

    def _gram_stats(n: int):
        """(top_char_frac, dup_char_frac) over word n-grams, one sorted
        run-length aggregate each. Denominator = total characters across
        ALL n-gram occurrences (consistent between the two signals)."""
        grams = F.array_sort(ngrams_col(words_col(text_col), n))
        acc = F.aggregate(
            grams,
            F.struct(
                F.lit("").alias("prev"),
                F.lit(1).alias("run"),
                F.lit(0.0).alias("bestchars"),
                F.lit(0.0).alias("dupchars"),
                F.lit(0.0).alias("allchars"),
            ),
            lambda a, g: F.struct(
                g.alias("prev"),
                F.when(g == a["prev"], a["run"] + 1)
                .otherwise(F.lit(1))
                .alias("run"),
                F.greatest(
                    a["bestchars"],
                    F.when(g == a["prev"], (a["run"] + 1) * F.length(g))
                    .otherwise(F.length(g))
                    .cast("double"),
                ).alias("bestchars"),
                (
                    a["dupchars"]
                    + F.when(
                        g == a["prev"],
                        F.when(a["run"] == 1, F.length(g) * 2.0).otherwise(
                            F.length(g).cast("double")
                        ),
                    ).otherwise(F.lit(0.0))
                ).alias("dupchars"),
                (a["allchars"] + F.length(g)).alias("allchars"),
            ),
        )
        top = F.when(acc["allchars"] > 0, acc["bestchars"] / acc["allchars"]).otherwise(
            F.lit(0.0)
        )
        dup = F.when(acc["allchars"] > 0, acc["dupchars"] / acc["allchars"]).otherwise(
            F.lit(0.0)
        )
        return top, dup

    top_frac, _ = _gram_stats(top_n)
    _, dup_frac = _gram_stats(dup_n)
    return (
        df.withColumn("dup_line_frac", dup_line_frac)
        .withColumn("dup_line_char_frac", dup_line_char_frac)
        .withColumn("top_ngram_char_frac", top_frac)
        .withColumn("dup_ngram_char_frac", dup_frac)
    )


#: Gopher's required-stopword list (Rae et al. 2021 table A1): a doc must
#: contain at least 2 of these to pass the rule set.
GOPHER_STOPS = ("the", "be", "to", "of", "and", "that", "have", "with")


def add_gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    """Gopher word-level quality rules (Rae et al. 2021, table A1 — the
    non-repetition half; :func:`add_repetition_signals` is the other):

    - ``gopher_n_words``        — whitespace word count (raw split, NOT the
      alphanumeric normalizer: bullet glyphs and symbols must count);
    - ``symbol_word_ratio``     — ``#`` and ellipsis (``...`` / U+2026)
      occurrences per word (Gopher drops > 0.1);
    - ``bullet_line_frac``      — fraction of non-blank lines starting with
      a bullet glyph (``-``, ``*``, U+2022) (drops > 0.9);
    - ``ellipsis_line_frac``    — fraction of non-blank lines ending with an
      ellipsis (drops > 0.3);
    - ``alpha_word_frac``       — fraction of words containing at least one
      ASCII letter (drops < 0.8);
    - ``gopher_stop_hits``      — how many of the 8 required stopwords
      appear (drops < 2);
    - ``gopher_pass``           — all of the above plus
      ``min_words <= n_words <= max_words``; NULL text fails.

    Every signal is a pure codegen'd SQL expression over the row's own
    text — no shuffle, no UDF, no corpus state — and each rule stays in
    the Java-regex ∩ RE2 subset, so a DuckDB oracle reproduces all seven
    columns exactly (tests/test_dedup_textstats.py).
    """
    t = F.col(text_col)
    words = F.filter(F.split(t, r"\s+"), lambda w: w != "")
    n_words = F.size(words)
    lines = F.filter(
        F.transform(F.split(t, "\n"), lambda l: F.trim(l)), lambda l: l != ""
    )
    n_lines = F.size(lines)
    n_sym = F.regexp_count(t, F.lit("#")) + F.regexp_count(
        t, F.lit(r"(\.\.\.|…)")
    )
    symbol_ratio = n_sym / F.greatest(n_words, F.lit(1))
    bullet_frac = F.size(
        F.filter(lines, lambda l: l.rlike(r"^[-*•]"))
    ) / F.greatest(n_lines, F.lit(1))
    ellipsis_frac = F.size(
        F.filter(lines, lambda l: l.rlike(r"(\.\.\.|…)$"))
    ) / F.greatest(n_lines, F.lit(1))
    alpha_frac = F.size(
        F.filter(words, lambda w: w.rlike("[a-zA-Z]"))
    ) / F.greatest(n_words, F.lit(1))
    lowered = F.lower(t)
    stop_terms = [
        F.when(lowered.rlike(rf"\b{s}\b"), 1).otherwise(0) for s in GOPHER_STOPS
    ]
    stop_hits = stop_terms[0]
    for term in stop_terms[1:]:
        stop_hits = stop_hits + term
    gopher_pass = (
        (n_words >= min_words)
        & (n_words <= max_words)
        & (symbol_ratio <= 0.1)
        & (bullet_frac <= 0.9)
        & (ellipsis_frac <= 0.3)
        & (alpha_frac >= 0.8)
        & (stop_hits >= 2)
    )
    return (
        df.withColumn("gopher_n_words", n_words)
        .withColumn("symbol_word_ratio", symbol_ratio)
        .withColumn("bullet_line_frac", bullet_frac)
        .withColumn("ellipsis_line_frac", ellipsis_frac)
        .withColumn("alpha_word_frac", alpha_frac)
        .withColumn("gopher_stop_hits", stop_hits)
        .withColumn("gopher_pass", F.coalesce(gopher_pass, F.lit(False)))
    )


def c4_line_clean(
    df: DataFrame,
    text_col: str = "text",
    min_line_words: int = 5,
) -> DataFrame:
    """C4's line-level cleanup (Raffel et al. 2020, §2.2): rebuild each
    document from only the lines that

    - end in a terminal punctuation mark (``.`` ``!`` ``?`` ``"``);
    - have at least ``min_line_words`` whitespace words;
    - do not contain the word ``javascript`` (case-insensitive) —
      C4's cookie/JS-warning boilerplate tell.

    Appends ``text_c4`` (kept lines re-joined with newlines; NULL when
    the input text is NULL, empty string when no line survives),
    ``c4_lines_kept`` and ``c4_lines_removed``. Pair with
    :func:`add_c4_rules` on the CLEANED column for the document-level
    drops — C4 cleans lines first, then discards pages.

    Pure codegen'd array/regex expressions over the row's own text — no
    shuffle, no UDF — and DuckDB-exact (tests/test_dedup_textstats.py).
    """
    t = F.col(text_col)
    lines = F.transform(F.split(t, "\n"), lambda l: F.trim(l))
    keep = F.filter(
        lines,
        lambda l: l.rlike(r'[.!?"]$')
        & (F.size(F.filter(F.split(l, r"\s+"), lambda w: w != ""))
           >= min_line_words)
        & ~F.lower(l).rlike(r"\bjavascript\b"),
    )
    n_all = F.size(F.filter(lines, lambda l: l != ""))
    n_keep = F.size(keep)
    return (
        df.withColumn("text_c4", F.concat_ws("\n", keep))
        .withColumn("c4_lines_kept", F.coalesce(n_keep, F.lit(0)))
        .withColumn(
            "c4_lines_removed", F.coalesce(n_all - n_keep, F.lit(0))
        )
        # concat_ws on a NULL array yields '' — restore NULL-in/NULL-out
        .withColumn(
            "text_c4", F.when(t.isNotNull(), F.col("text_c4"))
        )
    )


def add_c4_rules(
    df: DataFrame,
    text_col: str = "text",
    min_sentences: int = 3,
    badwords: list[str] | None = None,
) -> DataFrame:
    """C4's document-level drop rules (Raffel et al. 2020, §2.2):

    - ``c4_n_sentences`` — terminal-punctuation sentence count
      (occurrences of ``. ! ?`` at a word end); pages with fewer than
      ``min_sentences`` drop;
    - ``c4_has_lorem``   — contains "lorem ipsum" (placeholder text);
    - ``c4_has_brace``   — contains ``{`` (leaked code/templates);
    - ``c4_bad_hits``    — how many of ``badwords`` appear (whole-word,
      case-insensitive). C4 uses the public "bad words" blocklist; none
      ships here, so the list is a parameter and defaults to empty;
    - ``c4_pass``        — all of the above; False (never NULL) on NULL
      text.

    Pure per-row SQL expressions, DuckDB-exact. Run AFTER
    :func:`c4_line_clean` (pass ``text_col="text_c4"``) to reproduce the
    C4 order: clean lines, then drop pages.
    """
    t = F.col(text_col)
    n_sent = F.regexp_count(t, F.lit(r"[.!?](\s|$)"))
    lowered = F.lower(t)
    has_lorem = lowered.contains("lorem ipsum")
    has_brace = t.contains("{")
    bad_hits = F.lit(0)
    for w in sorted(badwords or []):
        bad_hits = bad_hits + F.when(
            lowered.rlike(rf"\b{w.lower()}\b"), 1
        ).otherwise(0)
    c4_pass = (
        (n_sent >= min_sentences)
        & ~has_lorem
        & ~has_brace
        & (bad_hits == 0)
    )
    return (
        df.withColumn("c4_n_sentences", n_sent)
        .withColumn("c4_has_lorem", has_lorem)
        .withColumn("c4_has_brace", has_brace)
        .withColumn("c4_bad_hits", bad_hits)
        .withColumn("c4_pass", F.coalesce(c4_pass, F.lit(False)))
    )
