"""Text-analysis operators: language-ID heuristic, quality scoring,
token counting, document fingerprinting.

Pure Column expressions (whole-stage codegen; zero Python in the hot
path); every function uses only ops with byte-identical DuckDB
equivalents so the oracle replays them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bigartm_spark.functions.hashing import char_hash
from bigartm_spark.operators.dedup import words_col

# tiny inline stopword lists for the n-gram/stopword language heuristic
LANG_STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "es": ["el", "la", "de", "y", "en", "es", "un"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu"],
    "fr": ["le", "la", "de", "et", "est", "un", "en"],
}


def token_count(documents: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_distinct_tokens, n_chars_measured)."""
    ws = words_col()
    return documents.select(
        "doc_id",
        F.size(ws).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(ws)).cast("long").alias("n_distinct_tokens"),
        F.length("text").cast("long").alias("n_chars_measured"),
    )


BPE_ISH_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


def bpe_ish_tokens(documents: DataFrame) -> DataFrame:
    """Tokenizer-style counting: a GPT-2-like pre-tokenization regex
    (letter runs | digit runs | single punctuation) — the cheap proxy for
    'how many BPE tokens will this cost'. Adds a pieces-per-word ratio."""
    pieces = F.regexp_extract_all("text", F.lit(BPE_ISH_PATTERN), 0)
    n_pieces = F.size(pieces).cast("long")
    n_words = F.size(words_col()).cast("long")
    return documents.select(
        "doc_id",
        n_pieces.alias("n_pieces"),
        n_words.alias("n_words"),
        F.when(n_words > 0, n_pieces.cast("double") / n_words)
        .otherwise(F.lit(0.0))
        .alias("pieces_per_word"),
    )


def lang_id(documents: DataFrame) -> DataFrame:
    """Stopword-ratio language heuristic: per language, the share of the
    doc's tokens found in that language's tiny stopword list; predict the
    argmax (ties broken by language code order; 'und' if all zero)."""
    ws = words_col()
    n = F.size(ws).cast("double")
    scores = {}
    for lang, sw in LANG_STOPWORDS.items():
        sw_arr = F.array(*[F.lit(w) for w in sw])
        hits = F.size(F.filter(ws, lambda w: F.array_contains(sw_arr, w)))
        scores[lang] = (hits.cast("double") / n).alias(f"score_{lang}")
    langs = sorted(LANG_STOPWORDS)
    base = documents.select("doc_id", *[scores[lang] for lang in langs])
    # argmax, first-in-order tiebreak; 'und' when every score is 0.
    # Scores are exact small-integer divisions, so cross-engine equality
    # comparisons are safe.
    mx = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = F.lit("und")
    chain = None
    for lang in langs:
        cond = (F.col(f"score_{lang}") == mx) & (mx > 0)
        chain = F.when(cond, F.lit(lang)) if chain is None else chain.when(
            cond, F.lit(lang)
        )
    return base.withColumn("predicted_lang", F.coalesce(chain, pred))


def quality_score(documents: DataFrame) -> DataFrame:
    """Deterministic quality heuristics: length, repetition, word shape.
    score = 0.4*min(n_words/100,1) + 0.3*distinct_ratio + 0.3*min(mean_wl/8,1)
    """
    ws = words_col()
    n_words = F.size(ws).cast("double")
    n_distinct = F.size(F.array_distinct(ws)).cast("double")
    # sum(len(w)) == len(concat(words)): one codegen'd string op instead
    # of an interpreted HOF fold; integer-valued doubles sum exactly, so
    # the value is bit-identical to the oracle's left-to-right reduce
    total_wl = F.length(F.concat_ws("", ws)).cast("double")
    mean_wl = F.when(n_words > 0, total_wl / n_words).otherwise(F.lit(0.0))
    distinct_ratio = F.when(n_words > 0, n_distinct / n_words).otherwise(
        F.lit(0.0)
    )
    score = (
        F.lit(0.4) * F.least(n_words / 100.0, F.lit(1.0))
        + F.lit(0.3) * distinct_ratio
        + F.lit(0.3) * F.least(mean_wl / 8.0, F.lit(1.0))
    )
    return documents.select(
        "doc_id",
        n_words.alias("n_words"),
        distinct_ratio.alias("distinct_ratio"),
        mean_wl.alias("mean_word_len"),
        score.alias("quality"),
    )


def fingerprint(documents: DataFrame) -> DataFrame:
    """(doc_id, fp, fp_rolling): md5 content fingerprint (codegen-fast)
    plus the rolling mod-prime hash (portable incremental form — the
    rolling variant supports streaming/chunked fingerprinting)."""
    return documents.select(
        "doc_id",
        F.md5("text").alias("fp"),
        char_hash("text").alias("fp_rolling"),
    )
