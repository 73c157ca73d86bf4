"""Dialogue-structure statistics over transcript tables (engine-new).

Transcripts are (conv_id, turn_idx, role, text, tool, ts) rows — the
engine's native input shape (BASELINE.json input_hint). These operators
summarize the conversational STRUCTURE rather than the text:

``role_transitions``: the Markov transition table over consecutive turns —
(from_role, to_role, cnt, prob) with prob row-normalized per from_role.
The per-conversation ordering is a window over conv_id (shuffle bounded by
conversation size); counts are map-side-combined groupBys; the
normalization join touches a roles²-sized table.

``turn_gaps``: response-latency statistics per (from_role, to_role) —
exact integer microsecond sums and counts (no distributed float sums, so
results are order-independent and cross-engine reproducible) plus the
derived mean for convenience.

Reference analog: none (the reference never looks at turn adjacency);
engine-new for the transcripts axis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def role_transitions(
    tr: DataFrame,
    conv_col: str = "conv_id",
    role_col: str = "role",
    order_cols: tuple[str, ...] = ("turn_idx",),
) -> DataFrame:
    """(from_role, to_role, cnt, prob): consecutive-turn role transition
    counts across all conversations, prob = cnt / Σ cnt over the same
    from_role (the Markov row normalization — one exact long division)."""
    w = Window.partitionBy(conv_col).orderBy(*[F.col(c) for c in order_cols])
    pairs = tr.select(
        F.col(role_col).alias("from_role"),
        F.lead(role_col).over(w).alias("to_role"),
    ).filter(F.col("to_role").isNotNull())
    counts = pairs.groupBy("from_role", "to_role").agg(
        F.count("*").alias("cnt")
    )
    tot = counts.groupBy("from_role").agg(F.sum("cnt").alias("_tot"))
    return (
        counts.join(F.broadcast(tot), "from_role")
        .select(
            "from_role",
            "to_role",
            "cnt",
            (F.col("cnt").cast("double") / F.col("_tot").cast("double")).alias(
                "prob"
            ),
        )
    )


def turn_gaps(
    tr: DataFrame,
    conv_col: str = "conv_id",
    role_col: str = "role",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = ("turn_idx",),
) -> DataFrame:
    """(from_role, to_role, n, sum_gap_us, mean_gap_us): response latency
    between consecutive turns. Gaps are exact integer microseconds (long),
    summed exactly — no distributed float accumulation — and the mean is a
    single final division."""
    w = Window.partitionBy(conv_col).orderBy(*[F.col(c) for c in order_cols])
    # parquet timestamps load as TIMESTAMP_NTZ; the session runs UTC
    # (session.py pins spark.sql.session.timeZone), so the NTZ→LTZ cast is
    # offset-free — and gaps are differences, so any constant offset cancels
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    pairs = (
        tr.select(
            F.col(role_col).alias("from_role"),
            F.lead(role_col).over(w).alias("to_role"),
            (F.lead(us).over(w) - us).alias("gap_us"),
        )
        .filter(F.col("to_role").isNotNull())
    )
    return pairs.groupBy("from_role", "to_role").agg(
        F.count("*").alias("n"),
        F.sum("gap_us").alias("sum_gap_us"),
    ).select(
        "from_role",
        "to_role",
        "n",
        "sum_gap_us",
        (F.col("sum_gap_us").cast("double") / F.col("n").cast("double")).alias(
            "mean_gap_us"
        ),
    )
