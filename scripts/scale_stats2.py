"""Scale run for the round-4 continuation operators (part 2).

Poisson bootstrap at 10M rows x 64 replicates (640M weighted
observations folded map-side to |groups|*64 shuffle rows), JSD /
cross-entropy over two 500k-doc corpora (~40M tokens), Gini + power-law
MLE over 20M-edge degree tables, time-decay scores at 50M events,
DBSCAN-LSH over 200k 16-dim vectors (bucket-capped candidate pairs +
the scalable CC driver; 14 hyperplanes keep bucket cohorts small —
measured: 12 planes over random vectors gives ~670-vector buckets and
a quadratic pair scan).

Usage: python scripts/scale_stats2.py
Writes BENCH/raw/scale_stats2.json.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from halvesting_geometric_spark.datagen import generate_power_law_edges
from halvesting_geometric_spark.operators.clustering import (
    dbscan_embeddings,
)
from halvesting_geometric_spark.operators.diversity import (
    js_divergence,
    unigram_cross_entropy,
)
from halvesting_geometric_spark.operators.events import decayed_counts
from halvesting_geometric_spark.operators.metrics import (
    gini_coefficient,
    powerlaw_alpha,
)
from halvesting_geometric_spark.operators.stats import bootstrap_mean_ci

spark = (
    SparkSession.builder.master("local[32]")
    .appName("scale_stats2")
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.driver.memory", "48g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

results: dict = {"ops": {}}


def run(name: str, fn, base: int):
    t0 = time.monotonic()
    out = fn()
    rows = out.count()
    wall = round(time.monotonic() - t0, 2)
    results["ops"][name] = {
        "wall_s": wall,
        "rows": rows,
        "rows_per_s": int(base / wall),
    }
    print(name, results["ops"][name], flush=True)
    with open("BENCH/raw/scale_stats2.json", "w") as f:
        json.dump(results, f, indent=1)


# -- bootstrap: 10M rows, 8 groups, 64 replicates ------------------------
obs = (
    spark.range(10_000_000)
    .select(
        F.col("id").alias("rid"),
        F.concat(F.lit("g"), F.pmod(F.xxhash64("id"), 8)).alias("grp"),
        F.pmod(F.xxhash64("id", F.lit(1)), 1000).alias("v"),
    )
    .persist()
)
n_obs = obs.count()
run(
    "bootstrap_64r",
    lambda: bootstrap_mean_ci(
        obs, "v", ("rid",), ("grp",), replicates=64
    ),
    n_obs * 64,
)
obs.unpersist()

# -- corpus comparison: two 500k-doc corpora, 40 tokens each -------------
V = 50_000


def mk_docs(n: int, seed: int, skew: float):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(40)),
                lambda i: F.concat(
                    F.lit("t"),
                    F.floor(
                        V
                        * F.pow(
                            F.pmod(
                                F.xxhash64(F.col("id"), i, F.lit(seed)),
                                1_000_000,
                            ).cast("double")
                            / 1e6,
                            F.lit(skew),
                        )
                    ).cast("long"),
                ),
            ),
        ).alias("text"),
    )


da = mk_docs(500_000, 3, 4.0).persist()
db = mk_docs(500_000, 5, 3.0).persist()
da.count(), db.count()
run("jsd_1m_docs", lambda: js_divergence(da, db), 40_000_000)
run(
    "xent_1m_docs", lambda: unigram_cross_entropy(da, db), 40_000_000
)
da.unpersist(), db.unpersist()

# -- degree-shape metrics over a 20M-edge power-law graph ----------------
edges = generate_power_law_edges(spark, 2_000_000, 20_000_000, seed=7)
indeg = (
    edges.groupBy("dst").agg(F.count("*").alias("value")).persist()
)
indeg.count()
run("gini_20m_edges", lambda: gini_coefficient(indeg, "value"), 20_000_000)
run(
    "plaw_20m_edges",
    lambda: powerlaw_alpha(indeg, "value", xmin=1),
    20_000_000,
)
indeg.unpersist()

# -- time-decay scores at 50M events -------------------------------------
ev = spark.range(50_000_000).select(
    F.pmod(F.xxhash64("id"), 100_000).alias("user_id"),
    F.to_timestamp(
        F.lit(1800000000) - F.pmod(F.xxhash64("id", F.lit(2)), 10_000_000)
    ).alias("ts"),
).persist()
ev.count()
run(
    "decay_50m",
    lambda: decayed_counts(ev, "user_id", "ts", halflife_hours=168.0),
    50_000_000,
)
ev.unpersist()

# -- DBSCAN-LSH over 500k 16-dim vectors ---------------------------------
vecs = spark.range(200_000).select(
    F.col("id").alias("vec_id"),
    F.transform(
        F.sequence(F.lit(1), F.lit(16)),
        lambda i: (
            F.pmod(F.xxhash64(F.col("id"), i), 2000).cast("double")
            / 1000.0
            - 1.0
        ).cast("float"),
    ).alias("embedding"),
).persist()
vecs.count()
run(
    "dbscan_lsh_200k",
    lambda: dbscan_embeddings(
        vecs,
        dim=16,
        eps_e4=9000,
        min_pts=4,
        pairs="lsh",
        n_planes=14,
    ),
    200_000,
)
vecs.unpersist()

with open("BENCH/raw/scale_stats2.json", "w") as f:
    json.dump(results, f, indent=1)
print("WROTE BENCH/raw/scale_stats2.json")
spark.stop()
