"""Preference/ranking family scale run.

20M pairwise comparisons over 2M items with power-law skew (hot items are
compared orders of magnitude more often — the regime where a naive global
ranking would hot-spot). Drives every operator in the family end-to-end and
reports wall time + comparisons/s. 100 TB evidence: each operator reduces
the raw log to the bounded pair/item tables in one map-side-combined
shuffle; the iterative estimators (Bradley–Terry MM, Rank Centrality walk)
then touch only V-row state per superstep, never the raw log.

Usage: python scripts/scale_preference.py [n_comparisons n_items]
Writes BENCH/raw/scale_preference_20m.json.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from halvesting_geometric_spark.datagen import generate_power_law_edges
from halvesting_geometric_spark.operators.evalmetrics import (
    spearman_correlation,
)
from halvesting_geometric_spark.operators.preference import (
    bradley_terry,
    dpo_pairs,
    rank_centrality,
    tournament_cycles,
    win_rate_matrix,
)

N_CMP = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
N_ITEMS = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000

spark = (
    SparkSession.builder.master("local[32]")
    .appName("scale_preference")
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.driver.memory", "48g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

comps = generate_power_law_edges(spark, N_ITEMS, N_CMP, seed=7).select(
    F.col("src").alias("winner"), F.col("dst").alias("loser")
)
comps = comps.persist()
n_raw = comps.count()

results: dict = {"n_comparisons": n_raw, "n_items": N_ITEMS, "ops": {}}


def run(name: str, fn):
    t0 = time.time()
    out = fn()
    wall = time.time() - t0
    results["ops"][name] = {
        "wall_s": round(wall, 2),
        "rows": out,
        "cmp_per_s": round(n_raw / wall),
    }
    print(f"{name:24s} {wall:8.1f}s  rows={out}")


run("win_rate_matrix", lambda: win_rate_matrix(comps).count())
run("dpo_pairs", lambda: dpo_pairs(comps).count())
run(
    "bradley_terry5",
    lambda: bradley_terry(comps, fixed_iters=5).strengths.count(),
)
run("rank_centrality5", lambda: rank_centrality(comps, fixed_iters=5).count())
run("tournament_cycles", lambda: tournament_cycles(comps).first()["n_cycles"])


def _spearman():
    indeg = comps.groupBy(F.col("loser").alias("item")).agg(
        F.count("*").alias("value")
    )
    outdeg = comps.groupBy(F.col("winner").alias("item")).agg(
        F.count("*").alias("value")
    )
    return spearman_correlation(indeg, outdeg).first()["spearman_e6"]


run("spearman_inout", _spearman)

with open("BENCH/raw/scale_preference_20m.json", "w") as f:
    json.dump(results, f, indent=2)
print(json.dumps(results))
spark.stop()
