"""Deterministic corpus sampling / splitting / mixture resampling.

The operations every training-data pipeline needs between "cleaned
corpus" and "training shards":

- :func:`hash_split` — train/val/test assignment,
- :func:`stratified_sample` — per-stratum Bernoulli subsampling,
- :func:`domain_mixture_resample` — downsample strata to hit a target
  domain mixture (the C4/Pile-style "mix web : code : books at w1:w2:w3"
  step).

All three draw their coins from the portable integer-keyed MINSTD
generator (functions/hashing.py::int_uniform) instead of ``rand()``:

- deterministic under task retry / speculative execution / partition
  reordering — on a 1000-executor run a retried task re-derives the
  exact same keep/drop decision, so a split is a *function of the key*,
  not of the execution;
- pure JVM integer arithmetic inside whole-stage codegen — a filter,
  not a shuffle; sampling 100 TB is a single scan;
- replayable in ANSI SQL, so the DuckDB oracle checks the exact rows.

Only :func:`domain_mixture_resample` runs a job before the filter: one
K-row aggregate (K = #strata) to learn current stratum counts; the
derived keep-rates join back via broadcast.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from bigartm_spark.functions.hashing import int_uniform

# distinct salts decorrelate the coins of the three operators so e.g. a
# stratified sample of the train split is unbiased
SPLIT_SALT = 101
SAMPLE_SALT = 202
MIXTURE_SALT = 303


def _unit_coin(key_col: str, salt: int, seed: int) -> Column:
    return int_uniform(key_col, salt, seed=seed)


def hash_split(
    df: DataFrame,
    weights: Mapping[str, float] | None = None,
    key_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Assign every row to a named split by cumulative-threshold lookup
    on the per-key uniform: ``u < w_train -> train``, etc. Splits are
    disjoint, exhaustive, and stable across runs/engines/cluster sizes.

    Returns the input plus a ``split`` column (no row is dropped — feed
    the filter downstream so Catalyst can push it into the scan of a
    split-partitioned copy).
    """
    if weights is None:
        weights = {"train": 0.98, "val": 0.01, "test": 0.01}
    total = float(sum(weights.values()))
    u = _unit_coin(key_col, SPLIT_SALT, seed)
    expr = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += float(weights[name]) / total
        cond = u < F.lit(cum)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    last = F.lit(names[-1])
    return df.withColumn(
        "split", last if expr is None else expr.otherwise(last)
    )


def stratified_sample(
    df: DataFrame,
    fractions: Mapping[str, float] | float,
    stratum_col: str = "source",
    key_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Deterministic Bernoulli sample, optionally with a per-stratum
    rate (``fractions`` a dict) or one global rate (a float). A pure
    filter — no shuffle, no count pass; expected stratum sizes are
    ``rate * n_s`` with per-key determinism."""
    u = _unit_coin(key_col, SAMPLE_SALT, seed)
    if isinstance(fractions, Mapping):
        rate = None
        for stratum, f in sorted(fractions.items()):
            cond = F.col(stratum_col) == F.lit(stratum)
            rate = (
                F.when(cond, F.lit(float(f)))
                if rate is None
                else rate.when(cond, F.lit(float(f)))
            )
        rate = rate.otherwise(F.lit(0.0)) if rate is not None else F.lit(0.0)
    else:
        rate = F.lit(float(fractions))
    return df.filter(u < rate)


def mixture_rates(
    df: DataFrame,
    target_weights: Mapping[str, float],
    stratum_col: str = "source",
) -> DataFrame:
    """Per-stratum keep-rates achieving ``target_weights`` proportions by
    downsampling only (no stratum is upsampled): with current counts
    ``n_s`` and normalized targets ``p_s``, the largest corpus honoring
    the mixture has total ``c = min_s(n_s / p_s)`` and keep-rate
    ``rate_s = c * p_s / n_s``. One K-row aggregate job.

    Returns (stratum, n_rows, keep_rate) — K rows, broadcast-joinable.
    """
    tot = float(sum(target_weights.values()))
    targets = [(s, float(w) / tot) for s, w in sorted(target_weights.items())]
    target_df = df.sparkSession.createDataFrame(
        targets, f"{stratum_col} string, p double"
    )
    counts = (
        df.filter(
            F.col(stratum_col).isin([s for s, _ in targets])
        )
        .groupBy(stratum_col)
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    scored = counts.join(F.broadcast(target_df), stratum_col).withColumn(
        "_ratio", F.col("n_rows").cast("double") / F.col("p")
    )
    # the global min over K strata rows (K = #domains, tiny by
    # construction) — an empty-partition window is safe here
    c = F.min("_ratio").over(Window.partitionBy())
    return (
        scored.withColumn(
            "keep_rate",
            F.least(c * F.col("p") / F.col("n_rows").cast("double"), F.lit(1.0)),
        )
        .select(F.col(stratum_col).alias("stratum"), "n_rows", "keep_rate")
    )


def domain_mixture_resample(
    df: DataFrame,
    target_weights: Mapping[str, float],
    stratum_col: str = "source",
    key_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Downsample strata so the surviving corpus matches the target
    domain mixture: rates from :func:`mixture_rates` broadcast-join back
    onto the corpus, then the deterministic coin filter. Strata absent
    from ``target_weights`` are dropped (weight 0). Two jobs total at
    any scale: the K-row count and the filtered scan."""
    rates = mixture_rates(df, target_weights, stratum_col).select(
        F.col("stratum").alias(stratum_col), "keep_rate"
    )
    u = _unit_coin(key_col, MIXTURE_SALT, seed)
    return (
        df.join(F.broadcast(rates), stratum_col)
        .filter(u < F.col("keep_rate"))
        .drop("keep_rate")
    )


def corpus_stats(
    documents: DataFrame,
    group_col: str | None = "source",
    text_col: str = "text",
    percentiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    with_share: bool = True,
) -> DataFrame:
    """Token-budget report: per group (source/domain/split — or the
    whole corpus when ``group_col`` is None), document count, total and
    mean whitespace-token counts, char totals, and exact length
    percentiles — the numbers that size a training run (epochs x budget)
    and catch a domain whose length distribution drifted.

    Scale: ONE groupBy over the corpus with map-side partial aggregation
    for the counts; percentiles via percentile_approx (t-digest sketch,
    mergeable — no sort, no collect), exact enough for budgeting at any
    corpus size.
    """
    n_tokens = F.size(
        F.filter(F.split(F.col(text_col), " "), lambda w: F.length(w) > 0)
    ).cast("long")
    with_counts = documents.withColumn("_n_tokens", n_tokens)
    keys = [group_col] if group_col is not None else []
    pct = F.percentile_approx(
        "_n_tokens", F.array(*[F.lit(p) for p in percentiles]), 10_000
    )
    out = with_counts.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_n_tokens").alias("total_tokens"),
        (F.sum("_n_tokens") / F.count(F.lit(1))).alias("mean_tokens"),
        F.sum(F.length(text_col)).cast("long").alias("total_chars"),
        pct.alias("token_percentiles"),
    )
    if group_col is not None and with_share:
        # with_share=False for streaming complete-mode aggregation
        # (window functions are not allowed in streaming plans; the
        # other columns stream fine)
        tot = F.sum("total_tokens").over(Window.partitionBy())
        out = out.withColumn(
            "token_share", F.col("total_tokens").cast("double") / tot
        )
    return out
