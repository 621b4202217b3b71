"""Text-analysis operators for large-scale training-data pipelines.

All JVM-side (native pyspark.sql.functions — no Python in the hot path):

* :func:`with_token_stats`  — token/char counts, punctuation & digit ratios
* :func:`with_quality_score` — length/stopword/repetition quality heuristic
* :func:`with_lang_id`      — stopword-hit language scoring (n-gram-free
  heuristic: per-language function-word hit counts, argmax with
  deterministic tie-break)
* :func:`with_fingerprint`  — 64-bit rolling-hash document fingerprint
  (polynomial hash over normalized tokens, exactly reproducible in SQL)

Each has a matching ANSI-SQL formulation used by the correctness oracle
(plans/gate.py) so the semantics are pinned, not just the implementation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# tiny function-word lists per language (deterministic, ASCII-foldable)
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with"],
    "de": ["der", "die", "das", "und", "ist", "mit", "von", "nicht"],
    "fr": ["le", "la", "les", "et", "est", "dans", "pour", "que"],
    "es": ["el", "la", "los", "y", "es", "en", "por", "con"],
}

TOKENIZE_EXPR = (
    "filter(split(regexp_replace(lower({col}), '[^a-z0-9 ]+', ' '), ' '), "
    "w -> w <> '')"
)


def tokens_col(col: str = "text") -> Column:
    return F.expr(TOKENIZE_EXPR.format(col=col))


def with_token_stats(df: DataFrame, col: str = "text") -> DataFrame:
    toks = tokens_col(col)
    return (
        df.withColumn("n_tokens", F.size(toks).cast("long"))
        .withColumn("n_chars_raw", F.length(col).cast("long"))
        .withColumn(
            "digit_ratio",
            F.round(
                F.length(F.regexp_replace(col, "[^0-9]", ""))
                / F.greatest(F.length(col), F.lit(1)),
                6,
            ),
        )
        .withColumn(
            "punct_ratio",
            F.round(
                F.length(F.regexp_replace(col, "[^.,;:!?]", ""))
                / F.greatest(F.length(col), F.lit(1)),
                6,
            ),
        )
    )


def _stopword_hits(col: str, words: list[str]) -> Column:
    toks = tokens_col(col)
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.array_intersect(F.array_distinct(toks), arr))


def with_lang_id(df: DataFrame, col: str = "text") -> DataFrame:
    """Argmax of per-language distinct-stopword hits; ties break by language
    code ascending; zero hits everywhere -> 'und' (undetermined)."""
    scored = df
    for lang, words in sorted(LANG_STOPWORDS.items()):
        scored = scored.withColumn(f"_hits_{lang}", _stopword_hits(col, words))
    best = F.greatest(*[F.col(f"_hits_{l}") for l in sorted(LANG_STOPWORDS)])
    lang_expr = F.lit("und")
    for lang in sorted(LANG_STOPWORDS, reverse=True):
        lang_expr = F.when(
            (F.col(f"_hits_{lang}") == best) & (best > 0), F.lit(lang)
        ).otherwise(lang_expr)
    out = scored.withColumn("lang_pred", lang_expr)
    return out.drop(*[f"_hits_{l}" for l in LANG_STOPWORDS])


def with_quality_score(df: DataFrame, col: str = "text") -> DataFrame:
    """Heuristic in [0, 1]: length band + stopword presence + low repetition.

    score = 0.4 * min(n_tokens/100, 1)
          + 0.3 * min(en_stopword_hits/5, 1)
          + 0.3 * (distinct_tokens / n_tokens)
    rounded to 6 decimals (order-independent, SQL-reproducible).
    """
    toks = tokens_col(col)
    n = F.size(toks)
    distinct_ratio = F.size(F.array_distinct(toks)) / F.greatest(n, F.lit(1))
    length_term = F.least(n / F.lit(100.0), F.lit(1.0))
    stop_term = F.least(
        _stopword_hits(col, LANG_STOPWORDS["en"]) / F.lit(5.0), F.lit(1.0)
    )
    return df.withColumn(
        "quality",
        F.round(0.4 * length_term + 0.3 * stop_term + 0.3 * distinct_ratio, 6),
    )


FP_MOD = 2**31 - 1  # Mersenne prime; keeps acc*BASE+h < 2^63 so the fold
FP_BASE = 1000003   # never overflows BIGINT (DuckDB throws on overflow,
HASH_HEX = 7        # Spark wraps — must stay in range in BOTH engines)


def with_fingerprint(df: DataFrame, col: str = "text") -> DataFrame:
    """Order-sensitive 31-bit polynomial rolling hash over tokens.

    fp = fold_left(acc * BASE + token_hash mod M) with token_hash = the
    first 7 md5 hex digits — portable bit-for-bit to any SQL engine.
    aggregate() folds left per document; documents are fully parallel.
    (A production deployment would widen this to xxhash64 Spark-side; the
    31-bit form exists so the DuckDB oracle can verify the exact semantics.)
    """
    fold = F.expr(
        "aggregate("
        + TOKENIZE_EXPR.format(col=col)
        + f", CAST(0 AS BIGINT), (acc, w) -> "
        f"pmod(acc * {FP_BASE} + CAST(conv(substring(md5(w), 1, {HASH_HEX}),"
        f" 16, 10) AS BIGINT), {FP_MOD}))"
    )
    return df.withColumn("fingerprint", fold)
