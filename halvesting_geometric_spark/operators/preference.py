"""Preference-data aggregation: Bradley–Terry strengths and win-rate matrices.

Engine-new (no counterpart in the reference — its scope ends at link
prediction over the citation graph; see
``/root/reference/halvesting_geometric/trainers/link_prediction.py`` for the
closest analog, a pairwise ranking loss). A web-scale training-data pipeline
ingests pairwise preference judgments (RLHF comparisons, citation votes,
A/B outcomes) and needs a global item ranking; Bradley–Terry (1952) via
Hunter's MM algorithm (Annals of Statistics 2004) is the standard estimator:

    p_i  <-  W_i / Σ_{j: n_ij>0} n_ij / (p_i + p_j)

where W_i = total wins of item i and n_ij = comparisons between i and j,
followed by a rescale so mean strength is 1 (the update is scale-invariant,
so an explicit normalization pins the representative).

Dataflow shape (identical to one PageRank superstep): the symmetric pair
table (i, j, n_ij) is the loop-invariant "edge" table, the strength vector
(i, p) is the state; each iteration is gather (two equi-joins pulling p_i
and p_j onto the pair rows) + scatter (map-side-combined groupBy(i) sum),
then a 1-row broadcast aggregate for the rescale — no driver scalar per
iteration, one Spark job per superstep, lineage truncated with a lazy
``localCheckpoint`` exactly like operators/simrank.py. At 10^12 comparisons
the pair table shuffles once on (a, b) to aggregate multiplicities and the
per-iteration cost is two shuffles of the V-row state — never the raw
comparison log.

Determinism / oracle exactness: no RNG; the only floats are the MM division
chain, replayed by the DuckDB twin with the same unrolled expression tree
(sums are partition-order-dependent in the last ulp; the shared e6
fixed-point rounding absorbs that, same contract as the PageRank gate).
Zero-win items reach strength 0 after the first iteration and stay there —
the MM fixed point for items that never win; division is always safe because
any compared pair contains at least one item with a win (the winner of that
very comparison), so p_i + p_j > 0 whenever n_ij > 0.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["BradleyTerryResult", "bradley_terry", "win_rate_matrix"]

E6 = 1_000_000


@dataclass
class BradleyTerryResult:
    strengths: DataFrame  # (item, strength) doubles, mean 1 over items
    iterations: int
    num_items: int
    num_pairs: int  # distinct unordered compared pairs


def bradley_terry(
    comparisons: DataFrame,
    fixed_iters: int = 5,
    winner_col: str = "winner",
    loser_col: str = "loser",
) -> BradleyTerryResult:
    """Bradley–Terry strengths from a pairwise-outcome log, fixed MM steps.

    ``comparisons``: one row per judged comparison, ``winner_col`` beats
    ``loser_col`` (repeated rows = multiplicity; self-comparisons are
    dropped). Items are whatever the two columns hold (any hashable SQL
    type). Returns strengths normalized to mean 1; items that never win
    have strength 0 (the MM fixed point), ties are out of scope.

    ``fixed_iters`` MM steps, no convergence probe — the gate contract is a
    deterministic unrolled computation an external SQL engine replays
    exactly; callers wanting convergence wrap this with their own delta
    check over ``strengths``.
    """
    if fixed_iters < 1:
        raise ValueError(f"fixed_iters must be >= 1, got {fixed_iters}")
    c = comparisons.select(
        F.col(winner_col).alias("w"), F.col(loser_col).alias("l")
    ).where(F.col("w") != F.col("l"))

    # Loop invariants: wins per item, symmetric pair multiplicities, items.
    wins = c.groupBy(F.col("w").alias("i")).agg(
        F.count("*").cast("double").alias("wn")
    )
    und = (
        c.select(F.least("w", "l").alias("a"), F.greatest("w", "l").alias("b"))
        .groupBy("a", "b")
        .agg(F.count("*").cast("double").alias("n"))
    )
    sym = und.select(
        F.col("a").alias("i"), F.col("b").alias("j"), "n"
    ).unionByName(und.select(F.col("b").alias("i"), F.col("a").alias("j"), "n"))
    sym = sym.persist(StorageLevel.MEMORY_AND_DISK)
    items = sym.select("i").distinct().persist(StorageLevel.MEMORY_AND_DISK)
    num_items = items.count()
    num_pairs = und.count()

    p = items.select("i", F.lit(1.0).alias("p"))
    for _ in range(fixed_iters):
        denom = (
            sym.join(p.select(F.col("i"), F.col("p").alias("pi")), "i")
            .join(
                p.select(F.col("i").alias("j"), F.col("p").alias("pj")), "j"
            )
            .groupBy("i")
            .agg(F.sum(F.col("n") / (F.col("pi") + F.col("pj"))).alias("d"))
        )
        raw = denom.join(wins, "i", "left").select(
            "i", (F.coalesce("wn", F.lit(0.0)) / F.col("d")).alias("p")
        )
        # Rescale to mean 1 with an in-plan 1-row broadcast aggregate
        # (scale-invariant update -> pin the representative, no driver scalar).
        tot = raw.agg(F.sum("p").alias("s"))
        p = raw.crossJoin(F.broadcast(tot)).select(
            "i",
            (F.col("p") * F.lit(float(num_items)) / F.col("s")).alias("p"),
        )
        p = p.localCheckpoint(eager=False)

    out = p.select(F.col("i").alias("item"), F.col("p").alias("strength"))
    sym.unpersist()
    items.unpersist()
    return BradleyTerryResult(
        strengths=out,
        iterations=fixed_iters,
        num_items=num_items,
        num_pairs=num_pairs,
    )


def win_rate_matrix(
    comparisons: DataFrame,
    winner_col: str = "winner",
    loser_col: str = "loser",
    min_total: int = 1,
) -> DataFrame:
    """Per-pair win counts and exact fixed-point win rates.

    One row per unordered compared pair (a < b by SQL ordering):
    ``(item_a, item_b, a_wins, n_total, a_winrate_e6)`` where
    ``a_winrate_e6`` is round-half-up fixed point of a_wins / n_total —
    computed as ``floor((a_wins*2e6 + n_total) / (2*n_total))`` on values
    far inside the 2^53 double-exact window, so Spark and any ANSI-SQL
    oracle agree bit-for-bit. ``min_total`` drops thinly-compared pairs.

    Scale: one shuffle — groupBy on the canonical (a, b) key with map-side
    combine; output is bounded by the distinct compared-pair count.
    """
    c = comparisons.select(
        F.col(winner_col).alias("w"), F.col(loser_col).alias("l")
    ).where(F.col("w") != F.col("l"))
    g = (
        c.select(
            F.least("w", "l").alias("item_a"),
            F.greatest("w", "l").alias("item_b"),
            (F.col("w") == F.least("w", "l")).cast("long").alias("a_win"),
        )
        .groupBy("item_a", "item_b")
        .agg(
            F.sum("a_win").alias("a_wins"),
            F.count("*").alias("n_total"),
        )
        .where(F.col("n_total") >= F.lit(int(min_total)))
    )
    return g.select(
        "item_a",
        "item_b",
        "a_wins",
        "n_total",
        F.floor(
            (F.col("a_wins") * F.lit(2 * E6) + F.col("n_total"))
            / (F.lit(2.0) * F.col("n_total"))
        )
        .cast("long")
        .alias("a_winrate_e6"),
    )
