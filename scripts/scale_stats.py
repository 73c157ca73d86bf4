"""Statistical-testing + corpus-diversity family scale run.

50M numeric observations across two cohorts (plus 5x4 categorical
labels) drive the hypothesis-testing suite; 1M synthetic documents with
a ~50k-term Zipfian vocabulary (~40M tokens) drive the diversity suite.
100 TB evidence: every test aggregates to a value-histogram /
vocabulary whose state is bounded by CARDINALITY, not row count — KS and
MWU shuffle once into per-distinct-value counts, chi-square into a 20-
cell grid, Welch into two moment rows; the diversity ops aggregate to
the (n-gram) vocabulary with map-side combine, and Heaps uses the
two-phase prefix (no global sort of the token stream). The only
per-row-bytes op is the zlib kernel, a C call over Arrow batches.

Usage: python scripts/scale_stats.py [n_rows n_docs]
Writes BENCH/raw/scale_stats_50m.json.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from halvesting_geometric_spark.operators.diversity import (
    compression_ratio,
    distinct_ngrams,
    heaps_checkpoints,
    unigram_entropy,
    zipf_slope,
)
from halvesting_geometric_spark.operators.stats import (
    chi2_independence,
    mann_whitney_u,
    two_sample_ks,
    welch_ttest,
)

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000_000
N_DOCS = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000

spark = (
    SparkSession.builder.master("local[32]")
    .appName("scale_stats")
    .config("spark.sql.shuffle.partitions", "64")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.driver.memory", "48g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

# two cohorts with a small true location shift; ~100k distinct values
obs = (
    spark.range(N_ROWS)
    .select(
        (F.pmod(F.xxhash64("id", F.lit(1)), 2) == 0).alias("_a"),
        F.pmod(F.xxhash64("id", F.lit(2)), 100_000).alias("_u"),
        F.pmod(F.xxhash64("id", F.lit(3)), 5).alias("_c5"),
        F.pmod(F.xxhash64("id", F.lit(4)), 4).alias("_c4"),
    )
    .select(
        F.when(F.col("_a"), F.lit("A")).otherwise(F.lit("B")).alias("g"),
        (
            F.col("_u") + F.when(F.col("_a"), 500).otherwise(0)
        ).alias("v"),
        F.concat(F.lit("k"), F.col("_c5")).alias("ca"),
        F.concat(F.lit("m"), F.col("_c4") + F.col("_c5") % 2).alias("cb"),
    )
    .persist()
)
n_obs = obs.count()

# Zipfian docs: term = floor(V * u^4) concentrates mass on low ids
V = 50_000
TOKS = 40
docs = (
    spark.range(N_DOCS)
    .select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(TOKS)),
                lambda i: F.concat(
                    F.lit("t"),
                    F.floor(
                        V
                        * F.pow(
                            (
                                F.pmod(
                                    F.xxhash64(F.col("id"), i, F.lit(9)),
                                    1_000_000,
                                ).cast("double")
                                / 1_000_000.0
                            ),
                            F.lit(4.0),
                        )
                    ).cast("long"),
                ),
            ),
        ).alias("text"),
    )
    .persist()
)
n_docs = docs.count()

results: dict = {"n_rows": n_obs, "n_docs": n_docs, "ops": {}}


def run(name: str, fn, per_s_base: int):
    t0 = time.monotonic()
    out = fn()
    rows = out.count() if hasattr(out, "count") else int(out)
    wall = round(time.monotonic() - t0, 2)
    results["ops"][name] = {
        "wall_s": wall,
        "rows": rows,
        "rows_per_s": int(per_s_base / wall),
    }
    print(name, results["ops"][name], flush=True)


run(
    "ks_scalable",
    lambda: two_sample_ks(obs, "v", "g", "A", "B", scalable=True),
    n_obs,
)
run(
    "mwu_scalable",
    lambda: mann_whitney_u(obs, "v", "g", "A", "B", scalable=True),
    n_obs,
)
run("chi2_5x4", lambda: chi2_independence(obs, "ca", "cb"), n_obs)
run("welch", lambda: welch_ttest(obs, "v", "g", "A", "B"), n_obs)

n_tokens = n_docs * TOKS
run(
    "distinct_n123",
    lambda: distinct_ngrams(docs, ns=(1, 2, 3)),
    3 * n_tokens,
)
run("zipf_scalable", lambda: zipf_slope(docs, scalable=True), n_tokens)
run("unigram_entropy", lambda: unigram_entropy(docs), n_tokens)
run(
    "heaps",
    lambda: heaps_checkpoints(
        docs, checkpoints=(10**4, 10**5, 10**6, 10**7)
    ),
    n_tokens,
)
run("zlib_ratio", lambda: compression_ratio(docs), n_docs)

with open("BENCH/raw/scale_stats_50m.json", "w") as f:
    json.dump(results, f, indent=1)
print("WROTE BENCH/raw/scale_stats_50m.json")
spark.stop()
