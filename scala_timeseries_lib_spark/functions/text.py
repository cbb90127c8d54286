"""Text analysis over the documents table: token stats, quality scoring,
n-gram language ID, document fingerprinting.

All pure Spark column expressions (codegen-friendly); each has an exact
DuckDB-SQL twin in __spark_entry__.oracle_sql. Tokenization is
whitespace-split, matching the synthetic corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hash32",
    "token_stats",
    "bpe_token_count",
    "quality_score",
    "lang_id",
    "fingerprint",
    "STOPWORDS",
    "LANG_STOPWORDS",
    "FP_MOD",
    "BPE_ISH_PATTERN",
]

# GPT-2-pretokenizer shape (letter runs | digit runs | punctuation runs)
# restricted to ASCII classes so the Java (Spark) and RE2 (DuckDB) regex
# dialects agree byte-for-byte
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]+"

STOPWORDS = ["the", "of", "and", "to", "a", "in", "is", "it", "that", "for"]

LANG_STOPWORDS = {
    "en": ["the", "and", "is", "to", "of"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
    "es": ["el", "los", "las", "y", "es"],
}

FP_MOD = 1_000_000_007


def hash32(col):
    """Portable 32-bit word hash: first 8 hex chars of md5 as unsigned int."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def _tokens(text_col: str = "text"):
    return F.split(F.col(text_col), " ")


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc token counting: n_tokens, n_chars, avg token length,
    stopword ratio."""
    toks = _tokens(text_col)
    n = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    return df.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        F.length(text_col).cast("long").alias("n_chars"),
        F.round(
            (F.length(text_col) - n + 1) / n.cast("double"), 5
        ).alias("avg_token_len"),
        F.round(n_stop / n.cast("double"), 5).alias("stopword_ratio"),
    )


def bpe_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting two ways: whitespace split and a BPE-ish pretokenizer
    regex (the shape BPE vocabularies are trained over). Pure JVM
    ``regexp_extract_all`` -- no Python in the scan."""
    toks = F.regexp_extract_all(
        F.col(text_col), F.lit(BPE_ISH_PATTERN), F.lit(0)
    )
    return df.select(
        "doc_id",
        F.size(_tokens(text_col)).alias("n_ws_tokens"),
        F.size(toks).alias("n_bpe_tokens"),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document quality in [0,1]: length saturation + stopword
    plausibility + token-length plausibility. Deterministic linear blend."""
    toks = _tokens(text_col)
    n = F.size(toks).cast("double")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    stop_ratio = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t))) / n
    avg_len = (F.length(text_col) - n + 1) / n
    score = (
        F.least(n / 100.0, F.lit(1.0)) * 0.5
        + F.least(stop_ratio * 5.0, F.lit(1.0)) * 0.3
        + F.least(avg_len / 8.0, F.lit(1.0)) * 0.2
    )
    return df.select("doc_id", F.round(score, 5).alias("quality"))


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-hit language ID: count hits per language lexicon, argmax with
    deterministic lexicographic tie-break; 'und' (undetermined) when no hits."""
    toks = _tokens(text_col)

    def _contains(arr):
        # NB: closure factory, not a default arg -- PySpark turns every
        # lambda parameter into a lambda variable
        return lambda t: F.array_contains(arr, t)

    hits = {}
    for lang, words in LANG_STOPWORDS.items():
        arr = F.array(*[F.lit(w) for w in words])
        hits[lang] = F.size(F.filter(toks, _contains(arr)))
    # argmax with deterministic tie-break to the lexicographically smallest
    # language: struct comparison on (count, priority)
    langs = sorted(hits)
    best = F.greatest(
        *[
            F.struct(
                hits[lg].alias("c"),
                F.lit(len(langs) - i).alias("p"),
                F.lit(lg).alias("lang"),
            )
            for i, lg in enumerate(langs)
        ]
    )
    pred = F.when(best["c"] == 0, F.lit("und")).otherwise(best["lang"])
    return df.select("doc_id", pred.alias("pred_lang"))


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Positional additive fingerprint: sum_i (hash32(w_i) % M) * (i+1) mod M.

    Order-sensitive (unlike a bag-of-words hash) and exactly reproducible in
    SQL via an indexed transform + sum.
    """
    toks = _tokens(text_col)
    terms = F.transform(toks, lambda w, i: (hash32(w) % FP_MOD) * (i + 1))
    fp = F.aggregate(terms, F.lit(0).cast("long"), lambda acc, x: (acc + x) % FP_MOD)
    return df.select("doc_id", fp.alias("fingerprint"))
