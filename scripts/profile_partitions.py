#!/usr/bin/env python3
"""A/B spark.sql.shuffle.partitions at bench scale (139k edges) for the
superstep drivers — guide §2.2: partition count should track data size,
not core count. Runs pagerank/hits/cc/bt5 at several partition counts in
ONE session (warm JIT), one warmup + 2 reps each."""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark import StorageLevel
from pyspark.sql import functions as F

from halvesting_geometric_spark.datagen import generate_transcripts
from halvesting_geometric_spark.operators.centrality import hits
from halvesting_geometric_spark.operators.components import connected_components
from halvesting_geometric_spark.operators.graph import build_graph
from halvesting_geometric_spark.operators.pagerank import pagerank
from halvesting_geometric_spark.operators.preference import bradley_terry
from halvesting_geometric_spark.session import get_spark, small_state_aqe_bypass

cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = get_spark(app_name="prof-partitions", cores=cpus, shuffle_partitions=cpus)
sc = spark.sparkContext

tr = generate_transcripts(spark, 20_000).persist(StorageLevel.MEMORY_AND_DISK)
tr.count()
g = build_graph(tr, scalable_ids=True)
g.edges.persist(StorageLevel.MEMORY_AND_DISK)
g.vertices.persist(StorageLevel.MEMORY_AND_DISK)
m = g.num_edges()
_aqe = small_state_aqe_bypass(spark, m)
_aqe.__enter__()

cmp_df = g.edges.select(F.col("dst").alias("winner"), F.col("src").alias("loser"))

QUERIES = {
    "pagerank": lambda: pagerank(g.edges, g.vertices, tol=1e-6, max_iter=200,
                                 delta_check_every=6).ranks.count(),
    "hits5": lambda: hits(g.edges, g.vertices, fixed_iters=5).count(),
    "cc": lambda: connected_components(g.edges, g.vertices).components.count(),
    "bt5": lambda: bradley_terry(cmp_df, fixed_iters=5).strengths.count(),
}

# warm JIT once at the default
for name, fn in QUERIES.items():
    t0 = time.monotonic()
    fn()
    print(f"warmup {name} {time.monotonic()-t0:.3f}", flush=True)

for parts in (32, 16, 8, 4):
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    for name, fn in QUERIES.items():
        walls = []
        for _ in range(2):
            sc.setJobDescription(f"{name} p{parts}")
            t0 = time.monotonic()
            fn()
            walls.append(time.monotonic() - t0)
        print(f"parts={parts} {name} med={statistics.median(walls):.3f} "
              f"runs={[round(w,3) for w in walls]}", flush=True)

_aqe.__exit__(None, None, None)
spark.stop()
