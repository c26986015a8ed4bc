"""Deterministic sampling operators: hash-lottery Bernoulli, stratified
rates, and per-group caps.

Training-data pipelines need *reproducible* sampling at 100 TB —
``DataFrame.sample`` / ``sampleBy`` draw from partition-local RNG streams,
so the selected set changes with partitioning, task retries, and cluster
size.  These operators derive the lottery from a content hash instead:

- :func:`hash_sample` — keep a row iff the md5 of (seed, key) falls below
  the rate threshold.  A pure projection: no shuffle, no RNG state, the
  same rows selected on any cluster, and cross-engine reproducible (md5 is
  standardized, unlike xxhash64).
- :func:`stratified_sample` — per-stratum rates (e.g. downsample crawl data
  to 10% while keeping 100% of curated sources) via a threshold per stratum
  on the same lottery.
- :func:`group_cap` — at most ``cap`` rows per group (per-domain document
  caps — the standard web-corpus balancing step), chosen deterministically
  by lottery order.  One shuffle (the window partition); no group blowup:
  rank is computed streaming per partition, never materializing a group in
  memory.

The md5 lottery maps a row to a uniform 60-bit value: the first 15 hex
digits of ``md5(seed <US> key...)`` compared lexicographically against a
threshold literal (equal-length lowercase hex compares identically to the
numeric compare, and 16^15 = 2^60 fits signed-64 exactly for the threshold
computation).  A seed change re-draws the whole lottery.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: hex digits of the lottery (60 bits — below any float/rounding concern)
_LOTTERY_HEX = 15
_LOTTERY_SPACE = 16**_LOTTERY_HEX
#: unit separator — cannot appear in numeric keys; avoids "a"+"bc" == "ab"+"c"
_SEP = "\x1f"


def rate_threshold(rate: float) -> str:
    """The zero-padded hex literal a lottery value must stay below to be
    kept with probability ``rate`` (exact for rates that are multiples of
    2^-60 — i.e. every float).  ``rate == 1.0`` returns ``"g"``, which
    sorts above every hex digit, so the compare keeps all rows."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    if rate == 1.0:
        return "g"
    return format(int(rate * _LOTTERY_SPACE), f"0{_LOTTERY_HEX}x")


#: stand-in for a NULL key part — ``concat_ws`` *skips* NULL arguments, so
#: without it every NULL-key row would hash to the identical lottery value
#: (all kept or all dropped together — a grossly mis-calibrated rate) and
#: composite keys like (NULL,'x') / ('x',NULL) would collide.  CHR(30)
#: (record separator) cannot appear in numeric keys; a real string key that
#: *equals* it would collide with NULL — acceptable for control characters.
_NULL = "\x1e"


def lottery_column(key_cols: Sequence[str], seed: str = "sample") -> F.Column:
    """The uniform hex lottery value for a row (same key → same value,
    everywhere, forever).  NULL key parts are encoded as :data:`_NULL`;
    the DuckDB mirror is ``COALESCE(CAST(k AS VARCHAR), CHR(30))``."""
    parts = [F.lit(seed)] + [
        F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in key_cols
    ]
    return F.substring(F.md5(F.concat_ws(_SEP, *parts)), 1, _LOTTERY_HEX)


def hash_sample(
    df: DataFrame,
    key_cols: Sequence[str],
    rate: float,
    seed: str = "sample",
) -> DataFrame:
    """Deterministic Bernoulli sample at ``rate`` keyed on ``key_cols``.

    A filter-only plan (pushdown-friendly, no shuffle): at 100 TB this is a
    map-side scan that never moves data.
    """
    return df.where(lottery_column(key_cols, seed) < F.lit(rate_threshold(rate)))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: Mapping[str, float],
    key_cols: Sequence[str],
    default_rate: float = 0.0,
    seed: str = "sample",
) -> DataFrame:
    """Per-stratum deterministic sampling: a row in stratum ``s`` survives
    with probability ``rates.get(s, default_rate)``.

    Still filter-only — the stratum→threshold mapping folds into one CASE
    expression, so skewed strata cost nothing extra (no per-stratum jobs,
    unlike ``sampleBy``).
    """
    thresh = None
    for value, rate in sorted(rates.items()):
        cond = F.col(strata_col) == value
        lit = F.lit(rate_threshold(rate))
        thresh = F.when(cond, lit) if thresh is None else thresh.when(cond, lit)
    thresh = (
        thresh.otherwise(F.lit(rate_threshold(default_rate)))
        if thresh is not None
        else F.lit(rate_threshold(default_rate))
    )
    return df.where(lottery_column(key_cols, seed) < thresh)


#: 2^60 as an exact double — the lottery space size used when a rate must
#: be computed *inside* the query (data-dependent rates can't be folded
#: into a Python-side hex literal the way fixed rates are).
_LOTTERY_SPACE_F = float(_LOTTERY_SPACE)


def lottery_long(key_cols: Sequence[str], seed: str = "sample") -> F.Column:
    """The lottery as a 60-bit BIGINT (uniform on [0, 2^60)) — the integer
    twin of :func:`lottery_column` for data-dependent thresholds.  DuckDB
    mirror: ``CAST(CONCAT('0x', <hex lottery>) AS BIGINT)``."""
    return F.conv(lottery_column(key_cols, seed), 16, 10).cast("long")


def temperature_sample(
    df: DataFrame,
    domain_col: str,
    alpha: float,
    key_cols: Sequence[str],
    seed: str = "mixture",
) -> DataFrame:
    """Temperature-flattened mixture sampling across domains — the standard
    LLM data-mixing step (kept counts ∝ n_d^alpha, as in multilingual /
    multi-source corpus balancing).

    A domain with ``n_d`` rows survives at rate ``(n_min / n_d)^(1-alpha)``
    (``n_min`` = smallest domain), so expected kept counts are proportional
    to ``n_d^alpha`` with the smallest domain kept whole: ``alpha=1`` keeps
    everything (no flattening), ``alpha=0`` equalizes every domain down to
    ``n_min`` rows, values between interpolate on the log scale.

    Scale shape: one map-side-combined count aggregation (~one row per
    domain), a broadcast join of the domain→threshold table (domain
    cardinality is assumed small — sources/languages, not documents), then
    a pure filter on the md5 lottery.  No corpus-sized shuffle and no RNG
    state: the kept set is identical on any cluster and any partitioning.

    Cross-engine exactness: thresholds are ``floor(rate * 2^60)`` compared
    against the integer lottery.  For ``1-alpha`` in {0, 0.5, 1} the rate
    uses only correctly-rounded IEEE ops (division / sqrt), so DuckDB
    reproduces the selected set bit-for-bit; other exponents go through
    ``pow`` (1-ulp libm differences could in principle flip a row with
    probability ~2^-53 per domain).
    """
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    e = 1.0 - alpha
    if e == 0.0:
        return df
    counts = df.groupBy(domain_col).agg(F.count("*").alias("__n"))
    nmin = counts.agg(F.min("__n").alias("__nmin"))
    ratio = F.col("__nmin") / F.col("__n")
    if e == 0.5:
        rate = F.sqrt(ratio)
    elif e == 1.0:
        rate = ratio
    else:
        rate = F.pow(ratio, F.lit(e))
    thresholds = (
        counts.crossJoin(F.broadcast(nmin))
        .select(
            F.col(domain_col).alias("__dom"),
            F.floor(rate * F.lit(_LOTTERY_SPACE_F)).alias("__thr"),
        )
    )
    joined = df.join(
        F.broadcast(thresholds), F.col(domain_col).eqNullSafe(F.col("__dom"))
    )
    return (
        joined.where(lottery_long(key_cols, seed) < F.col("__thr"))
        .drop("__dom", "__thr")
    )


def group_cap(
    df: DataFrame,
    group_cols: Sequence[str],
    cap: int,
    key_cols: Sequence[str],
    seed: str = "cap",
) -> DataFrame:
    """Keep at most ``cap`` rows per group, selected by lottery order
    (key columns break exact-tie lottery values, so the result is total-
    order deterministic).

    One hash shuffle on the group columns; a hot group (one domain with
    10^9 pages) ranks streaming within its partition — memory stays
    bounded by the sort spill, never by group size.
    """
    if cap < 0:
        raise ValueError(f"cap must be >= 0, got {cap}")
    order = [lottery_column(key_cols, seed)] + [F.col(c) for c in key_cols]
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= cap)
        .drop("__rk")
    )


def weighted_sample_k(
    df: DataFrame,
    weight_col: str,
    k: int,
    key_cols: Sequence[str],
    seed: str = "wsample",
    group_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: ``k`` rows
    selected with probability proportional to ``weight_col`` — the
    Efraimidis–Spirakis exponential race (Inf. Proc. Letters 2006,
    the standard one-pass distributed weighted reservoir): each row
    draws ``race = -ln(u) / w`` from its deterministic md5 uniform
    ``u`` and the ``k`` smallest race values win.

    Composes with :func:`ballista_spark.operators.dedup.
    exact_dedup_weighted` — sample canonical documents ∝ their
    duplicate multiplicity — and with any quality score as the weight.

    Deterministic and partitioning-invariant (the lottery is the
    engine-wide md5 construction; ties break on the keys); reseed to
    re-draw.  Rows with NULL, zero, or negative weight are excluded —
    they have no sampling mass.

    Scale shape: the race is a map-side projection.  Global form
    (``group_cols=None``): ``orderBy(race).limit(k)`` plans as
    TakeOrderedAndProject — per-partition top-k then a k-row merge,
    never a global sort.  Grouped form: one window shuffle on the
    group key, rank streaming within partitions (the
    :func:`group_cap` discipline).
    """
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    w = F.col(weight_col).cast("double")
    u = (lottery_long(key_cols, seed).cast("double") + F.lit(1.0)) / F.lit(
        float(_LOTTERY_SPACE)
    )
    race = -F.log(u) / w
    tagged = df.where(w.isNotNull() & (w > 0)).withColumn("__race", race)
    order = [F.col("__race")] + [F.col(c) for c in key_cols]
    if group_cols is None:
        return tagged.orderBy(*order).limit(k).drop("__race")
    win = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        tagged.withColumn("__rk", F.row_number().over(win))
        .where(F.col("__rk") <= k)
        .drop("__race", "__rk")
    )
