"""Text analysis for web-text corpora: language-ID, quality scoring, token
counting, document fingerprinting.

Everything except the rolling-hash fingerprint is pure Column expressions
(whole-stage codegen, zero Python) with exact ANSI-SQL equivalents — the
driver's DuckDB oracle re-runs the same logic (see __spark_entry__.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DE_STOPWORDS = ("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den")
EN_STOPWORDS = ("the", "and", "is", "of", "to", "in", "that", "it", "for", "on")

_DE_PAT = r"\b(" + "|".join(DE_STOPWORDS) + r")\b"
_EN_PAT = r"\b(" + "|".join(EN_STOPWORDS) + r")\b"
# fused alternation == de_hits + en_hits (the word sets are disjoint) in a
# single regex pass — quality_score uses this instead of two counts
_STOP_PAT = r"\b(" + "|".join(DE_STOPWORDS + EN_STOPWORDS) + r")\b"
TOKEN_PAT = r"\S+"
# BPE-ish pre-tokenization: letter runs | digit runs | single non-space symbol
BPE_PAT = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
PUNCT_PAT = r"[.,;:!?]"


def token_count_col(text_col):
    return F.regexp_count(text_col, F.lit(TOKEN_PAT))


def bpe_token_count_col(text_col):
    return F.regexp_count(text_col, F.lit(BPE_PAT))


def with_token_counts(df: DataFrame, text_col: str) -> DataFrame:
    return df.withColumn("n_tokens", token_count_col(F.col(text_col))).withColumn(
        "n_bpe_tokens", bpe_token_count_col(F.col(text_col))
    )


def with_lang_id(df: DataFrame, text_col: str, out_col: str = "lang_pred") -> DataFrame:
    """Stopword-count language heuristic: argmax of German vs English
    stopword hits; no hits -> 'unknown'; ties -> 'de' (deterministic)."""
    lowered = F.lower(F.col(text_col))
    de = F.regexp_count(lowered, F.lit(_DE_PAT))
    en = F.regexp_count(lowered, F.lit(_EN_PAT))
    return (
        df.withColumn("de_hits", de)
        .withColumn("en_hits", en)
        .withColumn(
            out_col,
            F.when((F.col("de_hits") == 0) & (F.col("en_hits") == 0), F.lit("unknown"))
            .when(F.col("de_hits") >= F.col("en_hits"), F.lit("de"))
            .otherwise(F.lit("en")),
        )
    )


def with_quality_score(df: DataFrame, text_col: str) -> DataFrame:
    """Length / punctuation / stopword / mean-token-length features + a
    deterministic composite quality score in [0, 1]."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = token_count_col(t)
    n_punct = F.regexp_count(t, F.lit(PUNCT_PAT))
    n_stop = F.regexp_count(F.lower(t), F.lit(_STOP_PAT))
    n_ws = F.regexp_count(t, F.lit(r"\s"))
    df = (
        df.withColumn("n_chars_calc", n_chars)
        .withColumn("n_tokens", n_tokens)
        .withColumn("punct_ratio", F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6))
        .withColumn("stopword_ratio", F.round(n_stop / F.greatest(n_tokens, F.lit(1)), 6))
        .withColumn(
            "mean_token_len",
            F.round((n_chars - n_ws) / F.greatest(n_tokens, F.lit(1)), 6),
        )
    )
    # composite: favor texts with some stopwords, moderate token length,
    # low punctuation noise — a fixed, documented heuristic
    score = (
        F.least(F.col("stopword_ratio") * 4, F.lit(1.0)) * 0.4
        + F.when((F.col("mean_token_len") >= 3) & (F.col("mean_token_len") <= 10), 0.4).otherwise(0.1)
        + F.when(F.col("punct_ratio") <= 0.05, 0.2).otherwise(0.05)
    )
    return df.withColumn("quality_score", F.round(score, 6))


def doc_frequency(
    df: DataFrame, id_col: str, text_col: str, n_docs: int, min_df: int = 1
) -> DataFrame:
    """Corpus vocabulary statistics: per-token document frequency and
    idf = ln(N / df) — the DF/IDF table a training-data pipeline needs for
    vocab pruning, stopword discovery and contamination checks.

    One explode of per-doc DISTINCT whitespace tokens + one hash groupBy
    (map-side partial agg); `n_docs` is passed in (the caller usually knows
    it — never a second scan hidden inside the operator)."""
    from .dedup import tokens_col

    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(tokens_col(F.col(text_col)))).alias("token"),
    ).where(F.length("token") > 0)
    return (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("df_count"))
        .where(F.col("df_count") >= min_df)
        .withColumn("idf", F.log(F.lit(float(n_docs)) / F.col("df_count")))
    )


# ---------------------------------------------------------------------------
# document fingerprinting (rolling hash / winnowing-style)
# ---------------------------------------------------------------------------

FP_BASE = 257
FP_MOD = (1 << 61) - 1
FP_WINDOW = 16


def fingerprint_py(text: str, window: int = FP_WINDOW) -> tuple[int, int]:
    """(doc_hash, min_gram_hash): polynomial rolling hash of the whole text
    and the minimum hash over all char `window`-grams (winnowing-style
    robust fingerprint). Pure integer arithmetic, portable."""
    h = 0
    for ch in text:
        h = (h * FP_BASE + ord(ch)) % FP_MOD
    doc_hash = h
    n = len(text)
    if n < window:
        return doc_hash, doc_hash
    # rolling window
    pw = pow(FP_BASE, window - 1, FP_MOD)
    wh = 0
    for ch in text[:window]:
        wh = (wh * FP_BASE + ord(ch)) % FP_MOD
    min_h = wh
    for i in range(window, n):
        wh = ((wh - ord(text[i - window]) * pw) * FP_BASE + ord(text[i])) % FP_MOD
        if wh < min_h:
            min_h = wh
    return doc_hash, min_h


def with_fingerprint(df: DataFrame, text_col: str) -> DataFrame:
    """Vectorized pandas UDF columns (doc_hash, min_gram_hash) — rolling
    hashes are inherently sequential per row, so this is the sanctioned
    Arrow-batched escape hatch, numpy-accelerated inside the batch."""
    from pyspark.sql import types as T

    @F.pandas_udf(
        T.StructType(
            [
                T.StructField("doc_hash", T.LongType()),
                T.StructField("min_gram_hash", T.LongType()),
            ]
        )
    )
    def fp(texts: pd.Series) -> pd.DataFrame:
        doc, mg = [], []
        for t in texts:
            d, m = fingerprint_py(t or "")
            # FP_MOD < 2^61 so values fit signed int64
            doc.append(d)
            mg.append(m)
        return pd.DataFrame({"doc_hash": np.array(doc, dtype=np.int64), "min_gram_hash": np.array(mg, dtype=np.int64)})

    return df.withColumn("fp", fp(F.col(text_col))).select(
        "*", F.col("fp.doc_hash").alias("doc_hash"), F.col("fp.min_gram_hash").alias("min_gram_hash")
    ).drop("fp")
