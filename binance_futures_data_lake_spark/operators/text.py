"""Text analysis for training-data pipelines: language-ID heuristic,
quality scoring, tokenization, document fingerprinting.

All deterministic and engine-portable (regex + md5 + integer arithmetic)
so every operator is DuckDB-oracle-checkable. JVM-side column algebra
throughout — no Python UDFs in these paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from binance_futures_data_lake_spark.functions.scalars import round6

from binance_futures_data_lake_spark.operators.textdedup import words

# tiny per-language stopword lists for the n-gram/stopword language heuristic
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "es": ("el", "la", "de", "y", "que", "en", "un", "una", "es", "por"),
    "fr": ("le", "la", "de", "et", "que", "en", "un", "une", "est", "pour"),
    "de": ("der", "die", "das", "und", "zu", "in", "ein", "eine", "ist", "von"),
}

# GPT-ish pre-tokenizer shape: word pieces | numbers | single punctuation
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

FINGERPRINT_BASE = 131
FINGERPRINT_MOD = 2_147_483_647  # 2^31−1; acc·B stays well inside int64


def token_count_bpe_ish(col) -> F.Column:
    """Token count under a BPE-ish regex pre-tokenizer."""
    return F.size(F.regexp_extract_all(col, F.lit(BPE_ISH_PATTERN), 0))


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality signals: token stats, punctuation/digit/space
    ratios, stopword ratio, and a composite keep/drop heuristic of the
    Gopher-rules shape (length bounds + stopword floor + symbol ceiling)."""
    c = F.col(text_col)
    toks = words(c)
    n_tok = F.size(toks)
    n_chars = F.length(c)
    n_punct = n_chars - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    n_digit = n_chars - F.length(F.regexp_replace(c, r"[0-9]", ""))
    all_stop = [w for ws in LANG_STOPWORDS.values() for w in ws]
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*all_stop)))
    avg_tok_len = F.aggregate(toks, F.lit(0), lambda a, x: a + F.length(x)).cast(
        "double"
    ) / F.nullif(n_tok.cast("double"), F.lit(0.0))
    out = (
        docs.withColumn("n_tokens", n_tok)
        .withColumn("n_tokens_bpe", token_count_bpe_ish(c))
        .withColumn("avg_token_len", round6(avg_tok_len))
        .withColumn("punct_ratio", round6(n_punct / F.nullif(n_chars.cast("double"), F.lit(0.0))))
        .withColumn("digit_ratio", round6(n_digit / F.nullif(n_chars.cast("double"), F.lit(0.0))))
        .withColumn("stopword_ratio", round6(n_stop / F.nullif(n_tok.cast("double"), F.lit(0.0))))
    )
    return out.withColumn(
        "quality_keep",
        (F.col("n_tokens") >= 5)
        & (F.col("n_tokens") <= 100000)
        & (F.col("avg_token_len") >= 2)
        & (F.col("avg_token_len") <= 12)
        & (F.coalesce(F.col("punct_ratio"), F.lit(0.0)) <= 0.2)
        & (F.coalesce(F.col("digit_ratio"), F.lit(0.0)) <= 0.3),
    )


def lang_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-overlap score per language + argmax label (deterministic
    tiebreak: higher score wins, then language code ascending; 'und' when
    every score is zero)."""
    toks = words(F.col(text_col))
    out = docs
    for lang, stops in sorted(LANG_STOPWORDS.items()):
        out = out.withColumn(
            f"score_{lang}", F.size(F.filter(toks, lambda t: t.isin(*stops)))
        )
    langs = sorted(LANG_STOPWORDS)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    label = F.lit("und")
    for lang in reversed(langs):  # ascending priority: earliest lang wins ties
        label = F.when(F.col(f"score_{lang}") == best, F.lit(lang)).otherwise(label)
    return out.withColumn("lang_pred", F.when(best > 0, label).otherwise(F.lit("und")))


def fingerprint(col) -> F.Column:
    """Polynomial rolling hash of the normalized text:
    acc ← (acc·B + codepoint) mod (2^31−1) over characters of
    lower(trimmed collapsed-whitespace text). Engine-portable: DuckDB
    list_reduce over string_split(…, '') computes the same value."""
    norm = F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))
    chars = F.filter(F.split(norm, ""), lambda c: c != "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * FINGERPRINT_BASE + F.ascii(ch)) % FINGERPRINT_MOD,
    )
