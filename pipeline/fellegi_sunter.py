"""Fellegi–Sunter unsupervised match-weight estimation (EM).

The reference's channel weights are HAND-SET constants
(optimized.py:905-924 — street 0.35, city 0.2, ...); there is no way to
learn weights for a new corpus. This module adds the classical
probabilistic-record-linkage answer (Fellegi & Sunter 1969; Winkler
1988 EM fitting): binarize each comparison channel into an agreement
pattern, count pattern frequencies, and fit per-channel
m = P(agree | match) and u = P(agree | unmatch) with EM under
conditional independence. The learned log2(m/u) agreement weights are
the data-driven replacement for the hand-set constants.

Scale shape: the ONLY distributed work is one groupBy over the scored
pairs — the pattern table is bounded by 2^|channels| rows (64 here)
regardless of corpus size, so collecting it is a bounded reduction
exactly like the CC convergence checksum, and EM itself is driver-side
arithmetic on ≤64 floats. A 10^12-pair corpus costs one extra
aggregation over columns the scoring stage already produced.

Determinism: patterns are summed in sorted-pattern order with plain
Python floats, so the result is bit-stable across partitionings and
runs; outputs are rounded to 6 dp so the independently-coded pandas
twin (pipeline/twin.py:fs_em_pd) lands on identical literals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType, StructField, StructType

# (channel, agreement threshold). Thresholds sit at the corpus-typical
# strong-agreement level for each 0-100 channel (upper-quartile-ish on
# the documents corpus); EM is parametric in them — callers with a
# different corpus pass their own list.
DEFAULT_CHANNELS: list[tuple[str, float]] = [
    ("token_sort", 75.0),
    ("num", 95.0),
    ("partial", 55.0),
    ("jaccard", 85.0),
    ("jaro", 75.0),
    ("struct", 95.0),
]

EM_ITERS = 30
INIT_P, INIT_M, INIT_U = 0.1, 0.9, 0.1
_EPS = 1e-6  # probability clamp: keeps degenerate channels finite


def comparison_patterns(
    scored: DataFrame, channels: list[tuple[str, float]] | None = None
) -> DataFrame:
    """scored pairs -> (pattern, g_<channel>..., n_pairs).

    ``pattern`` is the agreement bit-string in channel order ("101100");
    one narrow groupBy, result bounded by 2^|channels| rows.
    """
    channels = channels or DEFAULT_CHANNELS
    gammas = [
        (F.col(f"s_{name}") >= F.lit(thr)).cast("int").alias(f"g_{name}")
        for name, thr in channels
    ]
    g = scored.select(*gammas)
    pattern = F.concat(*[F.col(f"g_{name}").cast("string") for name, _ in channels])
    return (
        g.groupBy(*[f"g_{name}" for name, _ in channels])
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .select(
            pattern.alias("pattern"),
            *[f"g_{name}" for name, _ in channels],
            "n_pairs",
        )
    )


def _em(
    patterns: list[tuple[str, int]],
    n_channels: int,
    iters: int,
    init_p: float,
    init_m: float,
    init_u: float,
) -> tuple[float, list[float], list[float]]:
    """EM on (pattern bit-string, count) rows; plain-float, sorted-order
    arithmetic (the twin mirrors the op order exactly)."""
    pats = sorted(patterns)
    total = float(sum(n for _, n in pats))
    if total == 0.0:
        # no scored pairs (e.g. blocking found no candidates at tiny SF):
        # EM has nothing to update — return the clamped initial params
        # instead of dividing by the zero pair total. The twin
        # (``pipeline.twin.fs_em_pd``) mirrors this exactly.
        return (
            min(max(init_p, _EPS), 1.0 - _EPS),
            [min(max(init_m, _EPS), 1.0 - _EPS)] * n_channels,
            [min(max(init_u, _EPS), 1.0 - _EPS)] * n_channels,
        )
    p = init_p
    m = [init_m] * n_channels
    u = [init_u] * n_channels
    for _ in range(iters):
        sum_g = 0.0
        sum_gm = [0.0] * n_channels
        sum_u = 0.0
        sum_uu = [0.0] * n_channels
        for pat, n in pats:
            pm, pu = p, 1.0 - p
            for i in range(n_channels):
                if pat[i] == "1":
                    pm *= m[i]
                    pu *= u[i]
                else:
                    pm *= 1.0 - m[i]
                    pu *= 1.0 - u[i]
            g = pm / (pm + pu) if pm + pu > 0.0 else 0.5
            sum_g += n * g
            sum_u += n * (1.0 - g)
            for i in range(n_channels):
                if pat[i] == "1":
                    sum_gm[i] += n * g
                    sum_uu[i] += n * (1.0 - g)
        p = min(max(sum_g / total, _EPS), 1.0 - _EPS)
        for i in range(n_channels):
            m[i] = min(max(sum_gm[i] / sum_g, _EPS), 1.0 - _EPS) if sum_g > 0 else _EPS
            u[i] = min(max(sum_uu[i] / sum_u, _EPS), 1.0 - _EPS) if sum_u > 0 else _EPS
    return p, m, u


_WEIGHTS_SCHEMA = StructType(
    [
        StructField("channel", StringType(), False),
        StructField("m_prob", DoubleType(), False),
        StructField("u_prob", DoubleType(), False),
        StructField("w_agree", DoubleType(), False),
        StructField("w_disagree", DoubleType(), False),
        StructField("match_prior", DoubleType(), False),
    ]
)


def em_weights(
    spark: SparkSession,
    scored: DataFrame,
    channels: list[tuple[str, float]] | None = None,
    iters: int = EM_ITERS,
    init_p: float = INIT_P,
    init_m: float = INIT_M,
    init_u: float = INIT_U,
) -> DataFrame:
    """Distributed pattern aggregation -> bounded collect -> EM ->
    per-channel weight table (rounded 6 dp; see module determinism note).
    """
    import math

    channels = channels or DEFAULT_CHANNELS
    rows = comparison_patterns(scored, channels).select("pattern", "n_pairs").collect()
    pats = [(r["pattern"], int(r["n_pairs"])) for r in rows]
    p, m, u = _em(pats, len(channels), iters, init_p, init_m, init_u)
    out = [
        (
            name,
            round(m[i], 6),
            round(u[i], 6),
            round(math.log2(m[i] / u[i]), 6),
            round(math.log2((1.0 - m[i]) / (1.0 - u[i])), 6),
            round(p, 6),
        )
        for i, (name, _thr) in enumerate(channels)
    ]
    return spark.createDataFrame(out, _WEIGHTS_SCHEMA)


def fs_score_col(weights: list[tuple[str, float, float, float]]):
    """Composite FS log-odds column: sum over channels of
    (agree ? w_agree : w_disagree). JVM-only — usable as an
    unsupervised is_match signal next to the cascade.

    ``weights``: one (channel, threshold, w_agree, w_disagree) tuple per
    channel — i.e. the ``em_weights`` table's (channel, w_agree,
    w_disagree) columns zipped with the channel thresholds the weights
    were fit at (the weight table itself does not carry thresholds)."""
    from pyspark.sql import Column

    total: Column | None = None
    for name, thr, w_agree, w_disagree in weights:
        term = F.when(
            F.col(f"s_{name}") >= F.lit(thr), F.lit(w_agree)
        ).otherwise(F.lit(w_disagree))
        total = term if total is None else total + term
    return total
