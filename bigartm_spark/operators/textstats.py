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


def repetition_signals(documents: DataFrame) -> DataFrame:
    """Gopher-style repetition quality signals over word bigrams
    (Rae et al. 2021 §A1.1 use top n-gram character fraction; we use the
    count fraction of the most frequent bigram plus bigram diversity):

    (doc_id, n_bigrams, n_distinct_bigrams, top_bigram_count,
     top_bigram_frac, distinct_bigram_ratio)

    Shape at scale: explode -> two-level groupBy with map-side partial
    aggregation; per-doc state is bounded by doc length, never by corpus
    size. A doc with < 2 words yields zero counts (kept, not dropped).
    """
    ws = words_col()
    n = F.size(ws)
    # zip_with of the two shifted slices; slice len 0 -> empty array, so
    # short docs survive without a sequence(1,0) descending-range trap
    bigrams = F.zip_with(
        F.slice(ws, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(ws, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    per_bigram = (
        documents.select("doc_id", F.explode_outer(bigrams).alias("bigram"))
        .groupBy("doc_id", "bigram")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    agg = per_bigram.groupBy("doc_id").agg(
        F.sum(F.when(F.col("bigram").isNotNull(), F.col("_c")).otherwise(0))
        .cast("long")
        .alias("n_bigrams"),
        F.count(F.when(F.col("bigram").isNotNull(), F.lit(1)))
        .cast("long")
        .alias("n_distinct_bigrams"),
        F.max(F.when(F.col("bigram").isNotNull(), F.col("_c")).otherwise(0))
        .cast("long")
        .alias("top_bigram_count"),
    )
    nb = F.col("n_bigrams").cast("double")
    return agg.select(
        "doc_id",
        "n_bigrams",
        "n_distinct_bigrams",
        "top_bigram_count",
        F.when(nb > 0, F.col("top_bigram_count").cast("double") / nb)
        .otherwise(F.lit(0.0))
        .alias("top_bigram_frac"),
        F.when(nb > 0, F.col("n_distinct_bigrams").cast("double") / nb)
        .otherwise(F.lit(0.0))
        .alias("distinct_bigram_ratio"),
    )


# PII patterns: ASCII-only, valid in BOTH Java regex (Spark) and RE2
# (DuckDB) with identical non-overlapping leftmost-first match counts —
# no backreferences, no lookaround, no \d//\w class-shorthand drift.
PII_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+"
PII_IPV4 = (
    "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"
)
PII_PHONE = "[+][0-9]{7,15}"
PII_LONG_DIGITS = "[0-9]{6,}"


def pii_scan(documents: DataFrame) -> DataFrame:
    """Per-doc PII indicator counts (emails, IPv4-shaped dotted quads,
    +international phone runs, long digit runs) — the scan side of a
    redaction pipeline. Pure regexp Column expressions: counting 100 TB
    is one codegen'd scan, no Python."""

    def cnt(pat: str) -> F.Column:
        return F.size(F.regexp_extract_all("text", F.lit(pat), 0)).cast("long")

    n_email = cnt(PII_EMAIL)
    n_ipv4 = cnt(PII_IPV4)
    n_phone = cnt(PII_PHONE)
    n_digits = cnt(PII_LONG_DIGITS)
    return documents.select(
        "doc_id",
        n_email.alias("n_emails"),
        n_ipv4.alias("n_ipv4"),
        n_phone.alias("n_phones"),
        n_digits.alias("n_long_digit_runs"),
        (n_email + n_ipv4 + n_phone + n_digits > 0).cast("int").alias("has_pii"),
    )


def pii_redact(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Replace every PII match with a typed placeholder; emails before
    digit runs so an address is redacted whole, digit runs last so they
    don't eat phone/IP substrings first."""
    t = F.col(text_col)
    t = F.regexp_replace(t, PII_EMAIL, "<EMAIL>")
    t = F.regexp_replace(t, PII_IPV4, "<IP>")
    t = F.regexp_replace(t, PII_PHONE, "<PHONE>")
    t = F.regexp_replace(t, PII_LONG_DIGITS, "<NUM>")
    return documents.withColumn("redacted_text", t)


def fingerprint(documents: DataFrame) -> DataFrame:
    """(doc_id, fp, fp_rolling): md5 content fingerprint (codegen-fast)
    plus the rolling mod-prime hash (portable incremental form — the
    rolling variant supports streaming/chunked fingerprinting)."""
    return documents.select(
        "doc_id",
        F.md5("text").alias("fp"),
        char_hash("text").alias("fp_rolling"),
    )
