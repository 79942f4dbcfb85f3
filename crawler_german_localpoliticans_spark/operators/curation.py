"""Corpus-curation operators a 100-TB training-data pipeline needs beyond
scoring/dedup: PII detection + redaction and benchmark decontamination.

Both are Spark-first:

- PII is pure Column regexp work (whole-stage codegen, zero Python) with
  regexes shared verbatim with the DuckDB oracle (__spark_entry__.py);
- decontamination is a hashed n-gram semi-join — the industry-standard
  "drop any document sharing an n-gram with the eval set" rule (as used for
  C4/GPT-3-style decontamination) expressed as an Arrow gram-hash kernel ->
  explode -> broadcast-able LEFT SEMI/ANTI join, never a substring scan per
  pair.
  At 10^10 docs the benchmark n-gram table is tiny (a few million grams) and
  broadcasts; the document side stays a single map pass + one semi-join.
"""

from __future__ import annotations

import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # FIPS-enforcing builds refuse plain md5; this use is non-cryptographic
    hashlib.md5(b"", usedforsecurity=False)

    def _md5(data: bytes):
        return hashlib.md5(data, usedforsecurity=False)

except TypeError:  # Python < 3.9: no usedforsecurity kwarg (and no FIPS gate)
    _md5 = hashlib.md5

# shared Spark/DuckDB regexes (keep in sync with the oracle in
# __spark_entry__.py — both engines get THESE strings)
EMAIL_PAT = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
# international-ish phone: optional +country, then 3 groups of digits with
# separators; at least 8 digits total is enforced by the shape
PHONE_PAT = r"\+?[0-9]{2,4}[-/ ][0-9]{3,6}[-/ ][0-9]{3,8}"
IPV4_PAT = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
IBAN_PAT = r"\b[A-Z]{2}[0-9]{2}(?: ?[0-9A-Z]{4}){3,7}\b"

# fixed application order, most-specific first: an IBAN contains
# phone-shaped digit groups, so it must redact before the phone pattern;
# emails before phone/IP keeps digits inside an address intact. Both
# counting and redaction consume matches in THIS order, so n_<kind> always
# equals the number of <PII:kind> tokens in the redacted text.
PII_PATTERNS: dict[str, str] = {
    "iban": IBAN_PAT,
    "email": EMAIL_PAT,
    "phone": PHONE_PAT,
    "ipv4": IPV4_PAT,
}

REDACTION_TOKEN = "<PII:{kind}>"


def with_pii_counts(df: DataFrame, text_col: str) -> DataFrame:
    """One count column per PII class (n_email, n_phone, ...) plus a total
    and a boolean `has_pii` — pure regexp Columns, one codegen stage, no
    Python. Counts consume matches in the SAME precedence order as
    redact_pii (each class counts on the text with higher-precedence
    classes already redacted): without that, the phone-shaped digit groups
    inside every IBAN would double-count as phones and n_<kind> would
    disagree with the redaction tokens actually emitted — the class counts
    always equal the number of <PII:kind> tokens in the redacted text."""
    out = df
    total = F.lit(0)
    remaining = F.col(text_col)
    for kind, pat in PII_PATTERNS.items():
        c = F.regexp_count(remaining, F.lit(pat))
        out = out.withColumn(f"n_{kind}", c)
        total = total + c
        remaining = F.regexp_replace(remaining, pat, REDACTION_TOKEN.format(kind=kind))
    return out.withColumn("n_pii", total).withColumn("has_pii", total > 0)


def redact_pii(df: DataFrame, text_col: str, out_col: str = "redacted") -> DataFrame:
    """Replace every PII match with a typed redaction token, applying the
    patterns in the fixed PII_PATTERNS order (IBAN before phone: an IBAN's
    spaced digit groups would otherwise partially redact as a phone) — a
    chain of regexp_replace Columns, still zero Python."""
    col = F.col(text_col)
    for kind, pat in PII_PATTERNS.items():
        col = F.regexp_replace(col, pat, REDACTION_TOKEN.format(kind=kind))
    return df.withColumn(out_col, col)


# ---------------------------------------------------------------------------
# benchmark decontamination
# ---------------------------------------------------------------------------


def ngram_hashes(
    df: DataFrame, id_col: str, text_col: str, n: int = 13
) -> DataFrame:
    """(id, gram_hash) — 64-bit hash of each DISTINCT word n-gram, computed
    in one Arrow map pass per batch (the JVM transform/slice/concat
    higher-order form evaluates interpreted per element — the same cost the
    MinHash signatures eliminated, operators/dedup.py). Tokens follow the
    corpus-wide whitespace contract; documents shorter than n tokens
    contribute their single full-text gram, so no document is invisible to
    the check.

    The hash is the first 8 bytes of MD5 (C-speed via hashlib, constructed
    with usedforsecurity=False so FIPS-enforcing builds allow this
    non-cryptographic use; both join
    sides use THIS kernel, so the choice is self-consistent and invisible
    to callers). 64 bits keeps false collisions negligible even at
    10^10-doc scale (~3e11 grams -> expected ~2e3 spurious gram matches
    corpus-wide, i.e. a ~1e-7 false-contamination rate on a
    recall-oriented filter)."""
    from pyspark.sql import types as T

    from .dedup import tokens_py

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def grams(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            # CONTENT n-grams: boundary empty tokens (tokens_py's faithful
            # JVM artifact for leading/trailing \t or \n) are dropped —
            # otherwise '\tthe quick fox' grams as ' the quick fox' and
            # never matches the clean benchmark text's gram, silently
            # losing decontamination recall. (MinHash keeps the artifact:
            # its contract is byte-parity with the JVM shingle plan.)
            toks = [tok for tok in tokens_py(t) if tok]
            gs = {" ".join(toks[i : i + n]) for i in range(max(1, len(toks) - n + 1))}
            gs.discard("")
            out.append(
                [
                    int.from_bytes(_md5(g.encode()).digest()[:8], "big", signed=True)
                    for g in gs
                ]
                or None
            )
        return pd.Series(out)

    # asNondeterministic: same ArrowEvalPython-duplication fix as
    # minhash_signatures_arrow (guide §4.4) — the isNotNull filter on the
    # UDF output would otherwise be pushed below an upstream exchange by
    # substitution and re-run the gram kernel serially before it.
    return (
        df.select(
            F.col(id_col).alias("id"),
            grams.asNondeterministic()(F.col(text_col)).alias("gs"),
        )
        .where(F.col("gs").isNotNull())
        .select("id", F.explode("gs").alias("gram_hash"))
    )


def _bench_gram_hashes(benchmark: DataFrame, bench_text_col: str, n: int) -> DataFrame:
    """The benchmark side's distinct gram_hash set — ONE definition shared
    by contamination_check and decontaminate so the check form can never
    silently desynchronize from the filter form."""
    return (
        ngram_hashes(
            benchmark.select(F.lit(0).alias("bid"), F.col(bench_text_col)),
            "bid",
            bench_text_col,
            n,
        )
        .select("gram_hash")
        .distinct()
    )


# Above this many distinct benchmark grams the broadcast is declined and
# Catalyst/AQE picks a shuffle join instead. 10M longs ≈ 80 MB on the wire —
# comfortably broadcastable; real eval suites are a few MBs of text (1e5-1e6
# grams), so the shuffle branch only triggers when someone feeds a corpus-
# sized "benchmark".
BROADCAST_MAX_BENCH_GRAMS = 10_000_000


def _bench_gram_join_side(
    benchmark: DataFrame,
    bench_text_col: str,
    n: int,
    broadcast_max_grams: int | None,
) -> DataFrame:
    """Self-defending join side (the robots-join pattern,
    plans/crawl.py evaluate_robots): COUNT the distinct benchmark gram set
    once, broadcast it only when it is provably small, otherwise hand
    Catalyst the un-hinted side so the gram join shuffles on gram_hash and
    per-task memory stays O(grams/P). The gram set is persisted so the
    count does not recompute the Arrow gram kernel inside the join.
    broadcast_max_grams=None skips the guard (unconditional broadcast —
    the pre-guard behavior, for callers that know their benchmark).

    The count runs ONCE per (session, benchmark plan, n, threshold): the
    resulting broadcast-or-shuffle DECISION is memoized, so repeated calls
    (the check form then the filter form, or a bench loop) pay no extra
    job. Like AQE statistics, a stale decision can only change the join
    strategy, never the result."""
    bench_grams = _bench_gram_hashes(benchmark, bench_text_col, n)
    if broadcast_max_grams is None:
        return F.broadcast(bench_grams)
    spark = benchmark.sparkSession
    key = (
        spark.sparkContext.applicationId,
        benchmark.semanticHash(),
        bench_text_col,
        n,
        broadcast_max_grams,
    )
    decision = _BENCH_GRAM_DECISIONS.get(key)
    if decision is None:
        counted = bench_grams.persist()
        decision = counted.count() <= broadcast_max_grams
        _BENCH_GRAM_DECISIONS[key] = decision
        # release the probe cache immediately: the benchmark side is tiny,
        # so recomputing its gram kernel inside the join costs less than a
        # cache entry leaked for the session lifetime (review find, r4).
        # The memo keeps subsequent calls from ever re-counting. NOTE the
        # guard makes DataFrame CONSTRUCTION run one Spark job (the count)
        # on the first call per (appId, benchmark plan, n, threshold) key;
        # pass broadcast_max_grams=None for fully-lazy plan assembly.
        counted.unpersist()
    return F.broadcast(bench_grams) if decision else bench_grams


_BENCH_GRAM_DECISIONS: dict[tuple, bool] = {}


def contamination_check(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    bench_text_col: str = "text",
    n: int = 13,
    broadcast_max_grams: int | None = BROADCAST_MAX_BENCH_GRAMS,
) -> DataFrame:
    """Per-document contamination against an eval/benchmark corpus: a doc is
    contaminated iff it shares >= 1 word n-gram with ANY benchmark text.
    Returns (id, contaminated_grams, contaminated).

    Plan shape for 100 TB: the benchmark side collapses to a distinct
    gram_hash set (tiny — benchmarks are MBs, corpora are TBs) that Spark
    broadcasts; the document side is one explode + one broadcast semi-ish
    join + one groupBy. No substring matching, no cross join. The broadcast
    is size-guarded (_bench_gram_join_side): an adversarially large
    benchmark declines to a shuffle join instead of OOMing every
    executor."""
    doc_grams = ngram_hashes(docs, id_col, text_col, n)
    bench_grams = _bench_gram_join_side(benchmark, bench_text_col, n, broadcast_max_grams)
    hits = doc_grams.join(bench_grams, "gram_hash").groupBy("id").agg(
        F.count(F.lit(1)).alias("contaminated_grams")
    )
    base = docs.select(F.col(id_col).alias("id"))
    return (
        base.join(hits, "id", "left")
        .select(
            "id",
            F.coalesce("contaminated_grams", F.lit(0)).alias("contaminated_grams"),
            (F.coalesce("contaminated_grams", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    bench_text_col: str = "text",
    n: int = 13,
    broadcast_max_grams: int | None = BROADCAST_MAX_BENCH_GRAMS,
) -> DataFrame:
    """The filter form: documents with no shared n-gram (LEFT ANTI join on
    the size-guarded benchmark gram set — the exact plan a 10^10-doc
    decontamination pass wants)."""
    doc_grams = ngram_hashes(docs, id_col, text_col, n)
    bench_grams = _bench_gram_join_side(benchmark, bench_text_col, n, broadcast_max_grams)
    dirty = doc_grams.join(bench_grams, "gram_hash").select("id").distinct()
    return docs.join(dirty.withColumnRenamed("id", id_col), id_col, "left_anti")
