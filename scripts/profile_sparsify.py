#!/usr/bin/env python3
"""Stage-by-stage isolation of local_jaccard_sparsify at bench scale
(guide §1.1/§1.4): times each sub-frame with a noop write, prints the
executed plan summary of the final count so the 16.5 s bench median can be
attributed to a specific operator.

Run:  python scripts/profile_sparsify.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark import StorageLevel
from pyspark.sql import Window
from pyspark.sql import functions as F

from halvesting_geometric_spark.datagen import generate_transcripts
from halvesting_geometric_spark.operators.graph import build_graph, canonical_edges
from halvesting_geometric_spark.operators.ktruss import _support
from halvesting_geometric_spark.session import get_spark, small_state_aqe_bypass

cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = get_spark(app_name="profile-sparsify", cores=cpus, shuffle_partitions=cpus)
sc = spark.sparkContext

tr = generate_transcripts(spark, 20_000).persist(StorageLevel.MEMORY_AND_DISK)
tr.count()
g = build_graph(tr, scalable_ids=True)
g.edges.persist(StorageLevel.MEMORY_AND_DISK)
g.vertices.persist(StorageLevel.MEMORY_AND_DISK)
m = g.num_edges()
print(f"edges={m}", flush=True)

_aqe = small_state_aqe_bypass(spark, m)
print("aqe_bypassed:", _aqe.__enter__(), flush=True)

out: dict = {}


def t(name, fn):
    sc.setJobDescription(name)
    t0 = time.monotonic()
    r = fn()
    out[name] = round(time.monotonic() - t0, 3)
    print(name, out[name], flush=True)
    return r


def noop(df):
    df.write.format("noop").mode("overwrite").save()


edges = g.edges

# stage 1: canonicalization
canon = t("canon_ckpt", lambda: canonical_edges(edges).localCheckpoint(eager=True))

# stage 2: support (triangle listing + per-edge credit)
sup = t("support_ckpt", lambda: _support(canon))

# stage 3: degree table
deg = (
    canon.select(F.col("src").alias("v"))
    .unionByName(canon.select(F.col("dst").alias("v")))
    .groupBy("v")
    .agg(F.count("*").alias("deg"))
)
t("deg_noop", lambda: noop(deg))

# stage 4: sim (two deg joins)
sim = (
    sup.join(deg.select(F.col("v").alias("src"), F.col("deg").alias("ds")), "src")
    .join(deg.select(F.col("v").alias("dst"), F.col("deg").alias("dd")), "dst")
    .select(
        "src", "dst",
        F.floor(
            F.col("support") * 1_000_000.0
            / (F.col("ds") + F.col("dd") - F.col("support"))
            + F.lit(0.5)
        ).cast("long").alias("jaccard_e6"),
    )
)
t("sim_noop", lambda: noop(sim))

# stage 5: incid union (sim evaluated twice)
incid = sim.select(
    F.col("src").alias("v"), F.col("dst").alias("other"), "src", "dst", "jaccard_e6"
).unionByName(
    sim.select(
        F.col("dst").alias("v"), F.col("src").alias("other"), "src", "dst",
        "jaccard_e6",
    )
)
t("incid_noop", lambda: noop(incid))

# stage 6: ranked (deg join + window)
quota = F.ceil(F.sqrt(F.col("deg")))
ranked = (
    incid.join(deg, "v")
    .withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("v").orderBy(
                F.col("jaccard_e6").desc(), F.col("other").asc()
            )
        ),
    )
    .filter(F.col("rk") <= quota)
)
t("ranked_noop", lambda: noop(ranked))

final = ranked.select("src", "dst", "jaccard_e6").distinct()
t("final_count", lambda: final.count())

# full operator, as the bench calls it
from halvesting_geometric_spark.operators.sparsify import local_jaccard_sparsify

for i in range(3):
    t(f"full_count_{i}", lambda: local_jaccard_sparsify(edges, alpha=0.5).count())

plan = final._jdf.queryExecution().executedPlan().toString()
with open("/tmp/sparsify_final_plan.txt", "w") as fh:
    fh.write(plan)
print(json.dumps(out))
_aqe.__exit__(None, None, None)
spark.stop()
