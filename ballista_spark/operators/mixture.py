"""Domain-mixture assembly operators: target-weight sampling, epoch-based
upsampling plans, and token-budget selection.

:func:`temperature_sample` (operators/sampling.py) flattens a mixture by a
temperature exponent; the operators here hit an *explicit* target mixture —
the "data recipe" step of assembling a pretraining corpus (e.g. 67% web,
4.5% code, 4.5% wiki, as published for LLaMA-style recipes):

- :func:`mixture_rates` — given observed per-domain sizes (rows or tokens)
  and target weights, the per-domain keep-rates that realize the largest
  corpus matching the target *without upsampling* (the binding domain keeps
  rate 1.0), plus the epoch factors an upsampling build would need.
- :func:`mixture_sample` — apply those rates as a deterministic md5-lottery
  filter (same guarantees as :func:`hash_sample`: partitioning-invariant,
  cross-engine reproducible).
- :func:`mixture_epochs` — the upsampling variant: materialize ``epoch``
  copies per domain (integer part replicated, fractional last epoch
  lottery-sampled) so every domain hits exactly ``weight_d * budget``
  expected units — how over-weighted curated sources (wiki, books) are
  repeated in real recipes.
- :func:`budget_sample` — keep documents in deterministic lottery order
  until a token budget is exhausted (globally or per domain).  The prefix
  sum is two-level (lottery-range buckets, then an ``n_buckets``-row
  broadcast of bucket offsets) so no global-order window ever serializes
  the corpus through one reducer.

Scale notes (100 TB): domain cardinality is assumed small (sources /
languages, not documents) — every per-domain table here is aggregated
map-side to ~|domains| rows and broadcast.  The corpus itself is only ever
filtered (mixture_sample, budget_sample) or exploded by a bounded epoch
count (mixture_epochs); nothing corpus-sized is collected, broadcast, or
globally sorted.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ballista_spark.operators.sampling import (
    _LOTTERY_SPACE_F,
    lottery_long,
)

#: separator mirrored from the sampling lottery
_SEP = "\x1f"


def _weight_expr(weight_col: str | None) -> F.Column:
    return F.lit(1).cast("long") if weight_col is None else F.col(weight_col).cast("long")


def _targets_df(df: DataFrame, domain_col: str,
                target_weights: Mapping[str, float]) -> DataFrame:
    total = float(sum(target_weights.values()))
    if total <= 0:
        raise ValueError("target weights must sum to a positive value")
    rows = [(str(k), float(v) / total) for k, v in sorted(target_weights.items())]
    return df.sparkSession.createDataFrame(rows, f"{domain_col} string, __w double")


def mixture_rates(
    df: DataFrame,
    domain_col: str,
    target_weights: Mapping[str, float],
    weight_col: str | None = None,
) -> DataFrame:
    """Per-domain keep-rates realizing ``target_weights`` without upsampling.

    Returns one row per *targeted* domain: ``(domain, observed, target_w,
    rate, epochs)`` where ``observed`` is the domain's size (row count, or
    the sum of ``weight_col`` — e.g. token counts), ``rate = target_w * T /
    observed`` with ``T = min_d(observed_d / target_w_d)`` (the largest
    total any downsample-only build can reach — the binding domain gets
    rate 1.0), and ``epochs = target_w * B / observed`` for ``B`` = the sum
    of observed sizes over targeted domains (the repeat factor an
    upsampling build at budget B needs; >1 means the domain must repeat).

    Domains absent from ``target_weights`` are excluded (rate 0 — the
    recipe's way of dropping a source); weights are normalized to sum 1.

    Scale shape: ONE map-side-combined aggregation to ~|domains| rows; all
    arithmetic happens on that tiny table.  Mirrors the published
    mixture-recipe computation (weights over observed token counts).
    """
    targets = _targets_df(df, domain_col, target_weights)
    observed = (
        df.groupBy(F.col(domain_col).cast("string").alias(domain_col))
        .agg(F.sum(_weight_expr(weight_col)).alias("observed"))
    )
    joined = observed.join(F.broadcast(targets), domain_col)
    t_total = joined.agg(
        F.min(F.col("observed") / F.col("__w")).alias("__t"),
        F.sum("observed").alias("__b"),
    )
    return (
        joined.crossJoin(F.broadcast(t_total))
        .select(
            domain_col,
            "observed",
            F.col("__w").alias("target_w"),
            F.least(
                F.col("__w") * F.col("__t") / F.col("observed"), F.lit(1.0)
            ).alias("rate"),
            (F.col("__w") * F.col("__b") / F.col("observed")).alias("epochs"),
        )
    )


def mixture_sample(
    df: DataFrame,
    domain_col: str,
    target_weights: Mapping[str, float],
    key_cols: Sequence[str],
    weight_col: str | None = None,
    seed: str = "mixture",
) -> DataFrame:
    """Downsample-only mixture realization: filter each domain at its
    :func:`mixture_rates` rate via the deterministic md5 lottery.

    With ``weight_col`` (token counts) the rates are computed over tokens
    and applied per document, so the *expected* token mixture matches the
    target (exact in the large-corpus limit — the standard practice; exact
    per-document token knapsacking is :func:`budget_sample`'s job).
    Untargeted domains are dropped.  Filter + broadcast-join only; the
    kept set is identical on any cluster and any partitioning.
    """
    rates = mixture_rates(df, domain_col, target_weights, weight_col)
    thresholds = rates.select(
        F.col(domain_col).alias("__dom"),
        F.floor(F.col("rate") * F.lit(_LOTTERY_SPACE_F)).alias("__thr"),
    )
    joined = df.join(
        F.broadcast(thresholds),
        F.col(domain_col).cast("string").eqNullSafe(F.col("__dom")),
    )
    # rate==1.0 floors to exactly 2^60, above every lottery value: keeps all
    return joined.where(lottery_long(key_cols, seed) < F.col("__thr")).drop(
        "__dom", "__thr"
    )


def mixture_epochs(
    df: DataFrame,
    domain_col: str,
    target_weights: Mapping[str, float],
    key_cols: Sequence[str],
    budget: int | None = None,
    weight_col: str | None = None,
    seed: str = "mixture",
) -> DataFrame:
    """Upsampling mixture realization: replicate each targeted domain
    ``epochs_d = target_w_d * budget / observed_d`` times — whole copies
    for the integer part (tagged ``epoch`` = 0,1,…) plus a lottery-sampled
    fractional final epoch — so every domain's expected kept size is
    exactly ``target_w_d * budget``.

    ``budget`` defaults to the targeted corpus' total observed size (sum
    of ``weight_col`` or row count), i.e. "same total, re-balanced".  The
    fractional-epoch lottery is seeded per epoch (``seed<US>e<k>``), so
    repeats of a domain draw independent subsets — and the whole layout is
    partitioning-invariant and cross-engine reproducible.

    Scale shape: the per-domain epoch table is ~|domains| rows, broadcast;
    replication is one ``explode(sequence(0, n_copies-1))`` whose factor is
    bounded by ``ceil(max epochs)`` (a recipe constant, typically < 5), then
    a filter.  No corpus-sized shuffle.
    """
    rates = mixture_rates(df, domain_col, target_weights, weight_col)
    if budget is None:
        ep = F.col("epochs")
    else:
        total = rates.agg(F.sum("observed").alias("__b"))
        rates = rates.crossJoin(F.broadcast(total))
        ep = F.col("epochs") * F.lit(float(budget)) / F.col("__b")
    plan = rates.select(
        F.col(domain_col).alias("__dom"),
        F.floor(ep).cast("int").alias("__full"),
        F.floor((ep - F.floor(ep)) * F.lit(_LOTTERY_SPACE_F)).alias("__thr"),
    )
    joined = df.join(
        F.broadcast(plan),
        F.col(domain_col).cast("string").eqNullSafe(F.col("__dom")),
    )
    exploded = joined.withColumn(
        "epoch", F.explode(F.sequence(F.lit(0), F.col("__full")))
    )
    keep_whole = F.col("epoch") < F.col("__full")
    # per-epoch lottery: fold the epoch number into the seed so fractional
    # epochs draw a fresh subset each repeat
    parts = [F.lit(seed), F.col("epoch").cast("string")] + [
        F.coalesce(F.col(c).cast("string"), F.lit("\x1e")) for c in key_cols
    ]
    epoch_lottery = F.conv(
        F.substring(F.md5(F.concat_ws(_SEP, *parts)), 1, 15), 16, 10
    ).cast("long")
    return exploded.where(keep_whole | (epoch_lottery < F.col("__thr"))).drop(
        "__dom", "__full", "__thr"
    )


def budget_sample(
    df: DataFrame,
    count_col: str,
    budget: int,
    key_cols: Sequence[str],
    domain_col: str | None = None,
    seed: str = "budget",
    n_buckets: int = 64,
) -> DataFrame:
    """Keep documents in deterministic lottery order until ``budget`` units
    (tokens, via ``count_col``) are used — globally, or per domain when
    ``domain_col`` is given (a per-domain token budget, the exact form of
    "take the first N tokens of shuffled domain X").  A document that would
    cross the budget boundary is dropped (cumulative-inclusive ≤ budget),
    so the kept total never exceeds ``budget``.

    Scale shape — the global prefix sum is two-level, like
    ``pack_contiguous``: the 60-bit lottery is uniform, so its top bits
    range-partition the *order* into ``n_buckets`` contiguous, balanced
    slices; each slice cumsums independently after ONE hash shuffle, and
    slice base-offsets are an ``n_buckets``(-per-domain)-row aggregate
    cumsum'd on a tiny partition and broadcast back.  No global-order
    window, no corpus collect; deterministic on any cluster.
    """
    if budget < 0:
        raise ValueError(f"budget must be >= 0, got {budget}")
    lot = lottery_long(key_cols, seed)
    # top bits of the 60-bit lottery: bucket boundaries are order boundaries
    width = (1 << 60) // int(n_buckets) + 1
    staged = df.withColumn("__lot", lot).withColumn(
        "__b", F.expr(f"__lot div {width}")
    )
    dom = [domain_col] if domain_col else []
    order = [F.col("__lot")] + [F.col(c) for c in key_cols]
    w_local = Window.partitionBy(*dom, "__b").orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    staged = staged.withColumn(
        "__lend", F.sum(F.col(count_col).cast("long")).over(w_local)
    )
    btot = staged.groupBy(*dom, "__b").agg(
        F.sum(F.col(count_col).cast("long")).alias("__t")
    )
    w_off = Window.partitionBy(*dom).orderBy("__b").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = btot.select(
        *dom, "__b", F.coalesce(F.sum("__t").over(w_off), F.lit(0)).alias("__off")
    )
    joined = staged.join(F.broadcast(offsets), dom + ["__b"])
    return joined.where(
        F.col("__off") + F.col("__lend") <= F.lit(int(budget))
    ).drop("__lot", "__b", "__lend", "__off")
