"""Scale run for the round-4 continuation wave, part 2: configuration
model, seeded label propagation, balanced partitioning, bond percolation
and Girvan–Newman edge betweenness on a 20M-edge / 2M-vertex power-law
graph (local[32]).

Usage: python scripts/scale_geometry2.py
Writes BENCH/raw/scale_geometry2.json.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from halvesting_geometric_spark.datagen import generate_power_law_edges
from halvesting_geometric_spark.operators.betweenness import (
    edge_betweenness_sampled,
)
from halvesting_geometric_spark.operators.labelprop import (
    seeded_label_propagation,
)
from halvesting_geometric_spark.operators.nullmodel import configuration_model
from halvesting_geometric_spark.operators.partition import balanced_partition
from halvesting_geometric_spark.operators.robustness import bond_percolation

spark = (
    SparkSession.builder.master("local[32]")
    .appName("scale_geometry2")
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.driver.memory", "48g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

N_EDGES = 20_000_000
N_VERTS = 2_000_000
results: dict = {"n_edges": N_EDGES, "n_vertices": N_VERTS, "ops": {}}

edges = generate_power_law_edges(spark, N_VERTS, N_EDGES, seed=19).persist()
n_raw = edges.count()
verts = spark.range(N_VERTS).select(F.col("id").alias("vertex_id")).persist()
verts.count()


def run(name: str, fn):
    t0 = time.monotonic()
    extra = fn()
    wall = round(time.monotonic() - t0, 2)
    results["ops"][name] = {
        "wall_s": wall,
        "edges_per_s": int(n_raw / wall),
        **extra,
    }
    print(name, results["ops"][name], flush=True)
    with open("BENCH/raw/scale_geometry2.json", "w") as f:
        json.dump(results, f, indent=1)


def _configmodel():
    out = configuration_model(edges, seed=7)
    n = out.count()
    loops = out.filter(F.col("src") == F.col("dst")).count()
    return {"rewired_edges": n, "self_loops": loops}


run("configuration_model", _configmodel)


def _sslp():
    seeds = verts.filter(F.col("vertex_id") % 1000 == 0).select(
        "vertex_id", (F.col("vertex_id") % 16).alias("label")
    )
    out = seeded_label_propagation(edges, seeds, verts, rounds=4)
    labeled = out.filter(F.col("label").isNotNull()).count()
    return {"seeds": 2000, "labeled_after_4_rounds": labeled}


run("seeded_lpa_4r", _sslp)


def _bpart():
    out = balanced_partition(edges, verts, k=32, rounds=3)
    loads = out.groupBy("label").agg(F.count("*").alias("n"))
    mx = loads.agg(F.max("n")).first()[0]
    return {"k": 32, "rounds": 3, "max_load": int(mx)}


run("balanced_partition_k32", _bpart)


def _perc():
    out = bond_percolation(edges, verts, (250, 500, 750), seed=7)
    rows = {
        int(r.retain_permille): int(r.giant_size) for r in out.collect()
    }
    return {"giant_by_permille": rows}


run("bond_percolation_3lv", _perc)


def _ebc():
    out = edge_betweenness_sampled(edges, verts, sources=[0, 1, 2], max_depth=4)
    return {"scored_edges": out.count()}


run("edge_betweenness_3src_d4", _ebc)

with open("BENCH/raw/scale_geometry2.json", "w") as f:
    json.dump(results, f, indent=1)
print("WROTE BENCH/raw/scale_geometry2.json")
spark.stop()
