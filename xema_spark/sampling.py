"""Reproducible sampling for training-data mixes.

`df.sample()` is seed-dependent on partitioning and Spark version; a
training pipeline that wants the SAME subset on every rerun (and an
auditable membership rule per doc) needs content-addressed sampling: a doc
is in the sample iff hash(doc_id, salt) falls below the rate threshold.
That makes sampling a pure filter — no shuffle, pushdown-friendly, stable
under repartitioning, and resumable for free (membership is a function of
the row, not of execution order).

The 'portable' flavor uses the md5-derived 31-bit hash (dedup.portable_hash31)
so an external SQL engine reproduces the exact membership set; 'xxhash64'
is the cheaper production default.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from xema_spark.dedup import _P31, bucket_hash31


def _bucket31(col: Column, salt: str, hash_fn: str) -> Column:
    return bucket_hash31(col, hash_fn, salt=salt)


def deterministic_sample(df: DataFrame, id_col: str, rate: float,
                         salt: str = "v1",
                         hash_fn: str = "xxhash64") -> DataFrame:
    """Keep ~rate of rows, membership decided by hash(id, salt) — identical
    set on every run/cluster/partitioning. Change `salt` to draw an
    independent sample; keep it to reproduce one."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    thr = int(rate * _P31)
    return df.filter(_bucket31(F.col(id_col), salt, hash_fn) < F.lit(thr))


def stratified_deterministic_sample(df: DataFrame, id_col: str,
                                    strata_col: str, rates: dict[str, float],
                                    default_rate: float = 0.0,
                                    salt: str = "v1",
                                    hash_fn: str = "xxhash64") -> DataFrame:
    """Per-stratum rates (e.g. {'en': 1.0, 'de': 0.3}): the up/down-sampling
    step of a training-mix recipe, still a pure filter — the rate threshold
    is a CASE over the stratum column, the membership hash is shared, so a
    doc's inclusion at rate r implies inclusion at every r' > r (nested
    samples: raising a stratum's rate only ADDS docs — stable curricula)."""
    for s, r in list(rates.items()) + [("default_rate", default_rate)]:
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {s!r} must be in [0,1], got {r}")
    thr: Column = F.lit(int(default_rate * _P31))
    for s, r in rates.items():
        thr = F.when(F.col(strata_col) == s, F.lit(int(r * _P31))).otherwise(thr)
    return df.filter(_bucket31(F.col(id_col), salt, hash_fn) < thr)


def mixture_rates(df: DataFrame, strata_col: str,
                  target_shares: dict[str, float], total_rows: int,
                  ) -> dict[str, float]:
    """Per-stratum sampling rates that realize a training-mix RECIPE: given
    desired output proportions (e.g. {'en': 0.6, 'code': 0.4}) and a target
    corpus size, derive the rate each stratum must be sampled at from its
    OBSERVED count — the planning step recipes are written in, upstream of
    `stratified_deterministic_sample`.

    rate_k = min(1.0, share_k * total_rows / count_k). A stratum too small
    to supply its share caps at 1.0 (keep everything) and the realized mix
    honestly under-delivers that stratum — no silent re-normalization onto
    the others (spell redistribution out in the recipe instead). Strata
    absent from the recipe get rate 0.

    Scale shape: ONE partial-aggregated groupBy; only n_strata (count)
    rows reach the driver. The returned dict is a plain recipe artifact —
    log it next to the salt for auditability.
    """
    if total_rows < 0:
        raise ValueError(f"total_rows must be >= 0, got {total_rows}")
    for s, share in target_shares.items():
        if share < 0:
            raise ValueError(f"share for {s!r} must be >= 0, got {share}")
    counts = {r[0]: r[1] for r in
              df.groupBy(strata_col).agg(F.count(F.lit(1))).collect()}
    return {s: min(1.0, share * total_rows / counts[s])
            for s, share in target_shares.items()
            if counts.get(s)}


def mixture_sample(df: DataFrame, id_col: str, strata_col: str,
                   target_shares: dict[str, float], total_rows: int,
                   salt: str = "v1", hash_fn: str = "xxhash64") -> DataFrame:
    """Recipe-driven mixture: plan rates from observed counts, then apply
    the pure-filter stratified sampler — two jobs total (one tiny count
    aggregate + the filtered scan), no shuffle on the corpus."""
    rates = mixture_rates(df, strata_col, target_shares, total_rows)
    return stratified_deterministic_sample(
        df, id_col, strata_col, rates, salt=salt, hash_fn=hash_fn)
