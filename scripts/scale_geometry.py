"""Scale run for the edge-geometry operators (Forman curvature, local
Jaccard sparsification) on a 20M-edge / 2M-vertex power-law graph.

Both ride the degree-oriented edge-support wedge join (O(sqrt E)-bounded
work per edge, no adjacency buffering); the sparsifier adds a spillable
per-vertex row_number window over the 2|E| incident rows.  The run also
reports the sparsifier's keep ratio — the number that matters at 100 TB,
since every downstream job's input shrinks by it.

Usage: python scripts/scale_geometry.py
Writes BENCH/raw/scale_geometry.json.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from halvesting_geometric_spark.datagen import generate_power_law_edges
from halvesting_geometric_spark.operators.curvature import (
    forman_curvature,
    forman_vertex_curvature,
)
from halvesting_geometric_spark.operators.sparsify import local_jaccard_sparsify

spark = (
    SparkSession.builder.master("local[32]")
    .appName("scale_geometry")
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.driver.memory", "48g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

N_EDGES = 20_000_000
N_VERTS = 2_000_000
results: dict = {"n_edges": N_EDGES, "n_vertices": N_VERTS, "ops": {}}

edges = generate_power_law_edges(spark, N_VERTS, N_EDGES, seed=11).persist()
n_raw = edges.count()
results["raw_edges"] = n_raw

t0 = time.monotonic()
fc = forman_curvature(edges)
stats = fc.agg(
    F.count("*").alias("n"),
    F.min("curvature").alias("cmin"),
    F.max("curvature").alias("cmax"),
    F.sum(F.when(F.col("curvature") < 0, 1).otherwise(0)).alias("neg"),
).first()
wall = round(time.monotonic() - t0, 2)
results["ops"]["forman_curvature"] = {
    "wall_s": wall,
    "canonical_edges": stats["n"],
    "curv_min": stats["cmin"],
    "curv_max": stats["cmax"],
    "negative_edges": stats["neg"],
    "edges_per_s": int(n_raw / wall),
}
print("forman_curvature", results["ops"]["forman_curvature"], flush=True)

t0 = time.monotonic()
vc = forman_vertex_curvature(
    edges, spark.range(N_VERTS).select(F.col("id").alias("vertex_id"))
)
n_vc = vc.count()
wall = round(time.monotonic() - t0, 2)
results["ops"]["forman_vertex_curvature"] = {
    "wall_s": wall,
    "rows": n_vc,
    "edges_per_s": int(n_raw / wall),
}
print("forman_vertex_curvature", results["ops"]["forman_vertex_curvature"], flush=True)

t0 = time.monotonic()
sp = local_jaccard_sparsify(edges, alpha=0.5)
n_kept = sp.count()
wall = round(time.monotonic() - t0, 2)
results["ops"]["local_jaccard_sparsify"] = {
    "wall_s": wall,
    "kept_edges": n_kept,
    "keep_ratio": round(n_kept / results["ops"]["forman_curvature"]["canonical_edges"], 4),
    "edges_per_s": int(n_raw / wall),
}
print("local_jaccard_sparsify", results["ops"]["local_jaccard_sparsify"], flush=True)

# SCAN needs similarity structure to be non-degenerate at scale: a pure
# random power-law graph has near-zero neighborhood overlap, so every
# vertex is an outlier and the backbone CC runs on an empty set. Plant
# 20k K8 cliques (560k edges) on top of the noise so cores/borders/hubs
# all materialize and the CC driver does real work.
cliq = (
    spark.range(20_000)
    .select(
        F.col("id").alias("c"),
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("j"),
    )
    .select("c", "j", F.explode(F.sequence(F.lit(1), F.lit(7))).alias("k"))
    .filter(F.col("k") > F.col("j"))
    .select(
        (F.col("c") * 100 + F.col("j")).alias("src"),
        (F.col("c") * 100 + F.col("k")).alias("dst"),
    )
)
scan_in = edges.select("src", "dst").unionByName(cliq).persist()
scan_in.count()

t0 = time.monotonic()
from halvesting_geometric_spark.operators.scan import scan_clusters

sc_res = scan_clusters(
    scan_in,
    spark.range(N_VERTS).select(F.col("id").alias("vertex_id")),
    eps_e6=400_000,
    mu=3,
)
roles = {r["role"]: r["n"] for r in sc_res.groupBy("role").agg(F.count("*").alias("n")).collect()}
wall = round(time.monotonic() - t0, 2)
results["ops"]["scan_clusters"] = {
    "wall_s": wall,
    "roles": roles,
    "edges_per_s": int(n_raw / wall),
}
print("scan_clusters", results["ops"]["scan_clusters"], flush=True)

with open("BENCH/raw/scale_geometry.json", "w") as f:
    json.dump(results, f, indent=1)
print("WROTE BENCH/raw/scale_geometry.json")
spark.stop()
