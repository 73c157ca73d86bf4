"""Whole-graph structural metrics: reciprocity and rich-club coefficient.

Engine-new analytics (the reference — see
``/root/reference/halvesting_geometric/utils/data/link_prediction_dataset.py``
— builds the citation graph but computes no global structure metrics; these
extend the same edge-table surface the other operators consume).

Both are single-pass aggregations over the edge table:

- :func:`reciprocity` — fraction of directed edges (self-loops excluded)
  whose reverse edge also exists.  One equi self-join on (src, dst) keys +
  two counts; the join shuffles on the composite key, so it scales as an
  ordinary hash join (no broadcast of the full edge set, no driver state).
- :func:`rich_club` — for a degree threshold ``k``: the number of vertices
  with undirected degree > k, the number of undirected edges among them, and
  the normalized density phi(k) = 2·E_k / (N_k·(N_k−1)).  Two hash
  aggregations (degree count, edge count) + two semi-joins; the "rich" vertex
  set is usually tiny on power-law graphs, but the plan never assumes it —
  semi-joins degrade gracefully to shuffle joins when it is not.

Outputs are single rows of exact longs (ratios exported as round-half-up
e6 fixed-point), so the DuckDB gate twins are bit-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from halvesting_geometric_spark.operators.graph import canonical_edges


def _e6(num: F.Column | str, den: F.Column | str) -> F.Column:
    """Round-half-up fixed-point ratio: floor(1e6·num/den + 0.5), 0 on 0/0."""
    num_c = F.col(num) if isinstance(num, str) else num
    den_c = F.col(den) if isinstance(den, str) else den
    return F.when(den_c > 0, F.floor(num_c * 1_000_000.0 / den_c + F.lit(0.5)))\
        .otherwise(F.lit(0)).cast("long")


def reciprocity(edges: DataFrame) -> DataFrame:
    """Edge reciprocity of the directed simple graph.

    Self-loops are excluded and duplicate (src, dst) rows collapsed first, so
    the metric is well-defined regardless of upstream dedup guarantees.
    Returns ONE row ``(mutual, total, reciprocity_e6)`` — ``mutual`` counts
    directed edges whose reverse exists (a mutual pair contributes 2).
    """
    e = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    mutual = e.join(rev, ["src", "dst"], "left_semi")
    return (
        e.agg(F.count("*").alias("total"))
        .crossJoin(F.broadcast(mutual.agg(F.count("*").alias("mutual"))))
        .select(
            F.col("mutual").cast("long").alias("mutual"),
            F.col("total").cast("long").alias("total"),
            _e6("mutual", "total").alias("reciprocity_e6"),
        )
    )


def rich_club(edges: DataFrame, k: int) -> DataFrame:
    """Rich-club coefficient phi(k) on the undirected simple graph.

    ``N_k`` = vertices with undirected degree > k; ``E_k`` = undirected edges
    with BOTH endpoints in that set; phi(k) = 2·E_k / (N_k·(N_k−1)).
    Returns ONE row ``(n_rich, e_rich, phi_e6)``; phi_e6 is 0 when N_k < 2.

    Scale shape: one degree aggregation over the canonical edge table, one
    filter, two semi-joins keyed on single vertex ids — no step materializes
    more than the rich subgraph's edges.
    """
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    canon = canonical_edges(edges)
    deg = (
        canon.select(F.col("src").alias("v"))
        .unionByName(canon.select(F.col("dst").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("deg"))
    )
    rich = deg.filter(F.col("deg") > k).select("v")
    e_rich = (
        canon.join(rich.select(F.col("v").alias("src")), "src", "left_semi")
        .join(rich.select(F.col("v").alias("dst")), "dst", "left_semi")
    )
    return (
        rich.agg(F.count("*").alias("n_rich"))
        .crossJoin(F.broadcast(e_rich.agg(F.count("*").alias("e_rich"))))
        .select(
            F.col("n_rich").cast("long").alias("n_rich"),
            F.col("e_rich").cast("long").alias("e_rich"),
            _e6(
                F.col("e_rich") * 2.0,
                F.col("n_rich").cast("double")
                * (F.col("n_rich").cast("double") - 1.0),
            ).alias("phi_e6"),
        )
    )
