#!/usr/bin/env python3
"""Stage decomposition of attention_aggregate at 20M edges (round-5 verdict
item 5: close the 310k-vs-1.27M edges/s gap to sage_mean or document the
floor). Times, with noop sinks on the same session:

  1. sage_mean reference (aggregate_neighbors mean) on the same graph;
  2. the scoring join alone (e ⋈ fu ⋈ fv → narrow scores);
  3. scores + softmax stats (max + partition function);
  4. the full attention_aggregate.

Writes BENCH/raw/attention_floor_r6_20m.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark import StorageLevel
from pyspark.sql import functions as F

from halvesting_geometric_spark.datagen import generate_power_law_edges
from halvesting_geometric_spark.operators.neighbors import (
    aggregate_neighbors,
    attention_aggregate,
)
from halvesting_geometric_spark.session import get_spark

N_V = int(os.environ.get("ATT_V", 2_000_000))
N_E = int(os.environ.get("ATT_E", 20_000_000))
DIM = int(os.environ.get("ATT_DIM", 32))

cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = get_spark(
    app_name="profile-attention", cores=cpus, shuffle_partitions=cpus * 8,
    extra_conf={"spark.sql.adaptive.advisoryPartitionSizeInBytes": "8m"},
)
sc = spark.sparkContext

edges = generate_power_law_edges(spark, N_V, N_E).persist(
    StorageLevel.MEMORY_AND_DISK
)
m = edges.count()
# deterministic dense features, dim cells in [-1, 1)
feats = (
    spark.range(N_V)
    .select(
        F.col("id").alias("vertex_id"),
        F.array(
            *[
                (F.pmod(F.xxhash64(F.col("id"), F.lit(j)), F.lit(2_000_000))
                 / 1_000_000.0 - 1.0)
                for j in range(DIM)
            ]
        ).alias("features"),
    )
    .persist(StorageLevel.MEMORY_AND_DISK)
)
feats.count()
out: dict = {"n_vertices": N_V, "n_edges": m, "dim": DIM, "cpus": cpus,
             "loadavg_before": list(os.getloadavg())}


def t(name, fn, reps=1):
    walls = []
    for _ in range(reps):
        sc.setJobDescription(name)
        t0 = time.monotonic()
        fn()
        walls.append(round(time.monotonic() - t0, 3))
    out[name] = min(walls)
    out[name + "_runs"] = walls
    print(name, walls, flush=True)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


# 1. sage_mean reference
t("sage_mean", lambda: noop(
    aggregate_neighbors(feats, edges, DIM, agg="mean")), reps=2)

# 2. scoring join alone (the first wide gather pair)
e = edges.select(F.col("src").alias("_u"), F.col("dst").alias("dst"))
fu = feats.select(F.col("vertex_id").alias("_u"), F.col("features").alias("_xu"))
fv = feats.select(F.col("vertex_id").alias("dst"), F.col("features").alias("_xv"))
xu, xv = F.col("_xu"), F.col("_xv")
dot = xu[0] * xv[0]
for i in range(1, DIM):
    dot = dot + xu[i] * xv[i]
dot = dot / float(DIM) ** 0.5
scores = e.join(fu, "_u").join(fv, "dst").select("_u", "dst", dot.alias("_s"))
t("scoring_join", lambda: noop(scores), reps=2)

# 3. scores + softmax stats
sc_ck = scores.localCheckpoint(eager=False)
mx = sc_ck.groupBy("dst").agg(F.max("_s").alias("_mx"))
stats = (
    sc_ck.join(mx, "dst").groupBy("dst")
    .agg(F.sum(F.exp(F.col("_s") - F.col("_mx"))).alias("_z"),
         F.max("_mx").alias("_mx"))
)
t("scores_plus_stats", lambda: noop(stats), reps=1)

# 4. full attention
t("attention_full", lambda: noop(
    attention_aggregate(feats, edges, DIM)), reps=2)

out["attention_edges_per_sec"] = round(m / out["attention_full"], 1)
out["sage_edges_per_sec"] = round(m / out["sage_mean"], 1)
out["loadavg_after"] = list(os.getloadavg())
print(json.dumps(out))
os.makedirs("BENCH/raw", exist_ok=True)
with open("BENCH/raw/attention_floor_r6_20m.json", "w") as fh:
    json.dump(out, fh, indent=1)
spark.stop()
