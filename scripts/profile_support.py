#!/usr/bin/env python3
"""Isolate _support's internals (the sparsify hotspot) at bench scale."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark import StorageLevel
from pyspark.sql import functions as F

from halvesting_geometric_spark.datagen import generate_transcripts
from halvesting_geometric_spark.operators.graph import build_graph, canonical_edges
from halvesting_geometric_spark.operators.triangles import _oriented, triangle_listing
from halvesting_geometric_spark.session import get_spark, small_state_aqe_bypass

cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = get_spark(app_name="profile-support", cores=cpus, shuffle_partitions=cpus)
sc = spark.sparkContext

tr = generate_transcripts(spark, 20_000).persist(StorageLevel.MEMORY_AND_DISK)
tr.count()
g = build_graph(tr, scalable_ids=True)
g.edges.persist(StorageLevel.MEMORY_AND_DISK)
g.vertices.persist(StorageLevel.MEMORY_AND_DISK)
m = g.num_edges()
_aqe = small_state_aqe_bypass(spark, m)
_aqe.__enter__()


def t(name, fn):
    t0 = time.monotonic()
    r = fn()
    print(name, round(time.monotonic() - t0, 3), flush=True)
    return r


for rep in range(2):
    canon = t(f"canon_{rep}", lambda: canonical_edges(g.edges).localCheckpoint(eager=True))
    o = _oriented(canon).persist(StorageLevel.MEMORY_AND_DISK)
    t(f"o_count_{rep}", lambda: o.count())
    tri = triangle_listing(canon, oriented=o)
    t(f"tri_count_{rep}", lambda: tri.count())
    hits = (
        tri.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .unionByName(tri.select(F.col("a").alias("src"), F.col("c").alias("dst")))
        .unionByName(tri.select(F.col("b").alias("src"), F.col("c").alias("dst")))
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .groupBy("src", "dst")
        .agg(F.count("*").alias("support"))
    )
    t(f"hits_noop_{rep}", lambda: hits.write.format("noop").mode("overwrite").save())
    out = canon.join(hits, ["src", "dst"], "left").select(
        "src", "dst", F.coalesce("support", F.lit(0)).cast("long").alias("support")
    )
    t(f"out_ckpt_{rep}", lambda: out.localCheckpoint(eager=True))
    o.unpersist()

_aqe.__exit__(None, None, None)
spark.stop()
