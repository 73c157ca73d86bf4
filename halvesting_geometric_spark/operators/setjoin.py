"""Prefix-filtered exact set-similarity join (AllPairs / PPJoin family:
Bayardo et al. WWW'07, Xiao et al. WWW'08 — public algorithms).

The third pillar of the dedup surface next to MinHash-LSH (probabilistic,
``dedup.lsh_candidate_pairs``) and the doc-frequency-capped inverted-index
join (``dedup._pair_intersections``): prefix filtering is EXACT — zero
recall loss at any threshold — while pruning the candidate space from
"every pair sharing ANY token" down to "every pair sharing a RARE token".

Principle: order each document's token set by ascending global document
frequency (rarest first, ties by token) and keep only the first
``p = |d| − ⌈t·|d|⌉ + 1`` tokens as its *prefix*.  Two sets with
Jaccard ≥ t must overlap in at least ⌈t·|d|⌉ tokens of either set, so by
pigeonhole every qualifying pair shares at least one PREFIX token — joining
on prefix tokens is a complete candidate generator.  Because prefixes are
rare-by-construction, the per-token join fan-out is bounded by the rare end
of the df distribution instead of its stop-word head.

Scale shape: one df aggregation, one per-doc sort of its own token list
(array_sort inside the row — no global rank, no single-partition window),
one equi-join on prefix tokens, then exact verification restricted to the
candidate pairs (work ∝ candidates · |d|, not all-pairs).  Thresholds are
rationals (num/den) compared in integer cross-multiplication — no float
boundary anywhere, so the DuckDB twin (brute-force all-pairs at gate scale)
matches bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from halvesting_geometric_spark.operators.dedup import jaccard_similarity


def prefix_filter_pairs(
    shingle_df: DataFrame, t_num: int, t_den: int
) -> DataFrame:
    """Complete candidate pairs (a < b) for Jaccard ≥ t_num/t_den.

    ``shingle_df``: (id, shingle) distinct pairs (``dedup.word_shingles``
    output shape).  Exact prefix-filter guarantee: every pair with
    Jaccard ≥ t appears; non-qualifying pairs may appear (verification
    prunes them).  Prefix length uses pure integer ceiling
    ⌈t·sz⌉ = (t_num·sz + t_den − 1) div t_den.
    """
    if not (0 < t_num <= t_den):
        raise ValueError(f"threshold must be in (0, 1]: {t_num}/{t_den}")
    df_counts = shingle_df.groupBy("shingle").agg(
        F.count("*").alias("df_cnt")
    )
    # per-doc token list sorted by (global df asc, token asc): rarest first.
    # The struct sort IS the canonical order — no global rank materialized.
    ranked = (
        shingle_df.join(df_counts, "shingle")
        .groupBy("id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("df_cnt", "shingle"))
            ).alias("ordered"),
            F.count("*").alias("sz"),
        )
    )
    prefix_len = (
        F.col("sz")
        - F.floor(
            (F.lit(t_num) * F.col("sz") + F.lit(t_den) - 1) / F.lit(t_den)
        )
        + 1
    ).cast("int")
    prefixes = ranked.select(
        "id",
        F.explode(
            F.slice(F.col("ordered").getField("shingle"), 1, prefix_len)
        ).alias("shingle"),
    )
    pa = prefixes.select(F.col("id").alias("a"), "shingle")
    pb = prefixes.select(F.col("id").alias("b"), "shingle")
    return (
        pa.join(pb, "shingle")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def similarity_join(
    shingle_df: DataFrame, t_num: int, t_den: int
) -> DataFrame:
    """All pairs with shingle-set Jaccard ≥ t_num/t_den — EXACT.

    Prefix-filtered candidates verified by the shared
    :func:`dedup.jaccard_similarity` kernel; the threshold test is the
    integer cross-multiplication ``inter · t_den ≥ t_num · union`` so engine
    and oracle agree on boundary pairs exactly.  Returns
    (a, b, inter, union_sz) with exact longs.
    """
    cand = prefix_filter_pairs(shingle_df, t_num, t_den)
    scored = jaccard_similarity(shingle_df, pairs=cand)
    return (
        scored.filter(
            F.col("inter") * t_den >= F.lit(t_num) * F.col("union_sz")
        )
        .select(
            "a",
            "b",
            F.col("inter").cast("long").alias("inter"),
            F.col("union_sz").cast("long").alias("union_sz"),
        )
    )
