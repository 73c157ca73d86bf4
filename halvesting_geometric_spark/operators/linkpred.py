"""Classical link-prediction scores as relational operators (engine-new).

The reference's whole downstream task is link prediction on the citation
graph — it scores candidate author→paper edges with a GNN dot product
(``/root/reference/halvesting_geometric/modules/link_classifier.py:33-36``)
and evaluates splits built by ``RandomLinkSplit``
(``.../utils/data/link_prediction_datamodule.py:117-135``). This module
provides the standard *non-learned* heuristics over the same edge table —
the baselines every link-prediction paper compares against (Liben-Nowell &
Kleinberg 2003):

- common neighbors        |N(a) ∩ N(b)|
- Adamic–Adar             Σ_{z ∈ N(a)∩N(b)} 1/ln deg(z)
- resource allocation     Σ_{z ∈ N(a)∩N(b)} 1/deg(z)
- preferential attachment deg(a)·deg(b)
- neighborhood Jaccard    |N∩| / |N∪|

All five come out of ONE wedge self-join + one map-side-combinable aggregate
— the same degree-bounded shape as triangle counting. Scale notes:

- The wedge join fans out Σ_z deg(z)² rows; on power-law graphs hubs
  dominate that sum, so ``max_degree`` excludes super-hubs from wedge
  generation (the standard candidate-generation guard — a z with millions of
  neighbors contributes ~nothing to AA/RA anyway since 1/ln deg(z) → 0, but
  would alone produce 10¹² wedges at 100 TB).
- The aggregate is a hash groupBy on (a, b): partial aggregation map-side,
  AQE handles residual skew.
- No Python anywhere in the dataflow.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from halvesting_geometric_spark.operators.graph import canonical_edges


def _undirected_with_deg(
    edges: DataFrame, max_degree: int | None
) -> tuple[DataFrame, DataFrame]:
    """(symmetric (v, nbr, nbr_deg) adjacency, (v, deg) table) over the simple
    undirected graph. ``max_degree`` drops hub *centers* z from the adjacency
    used for wedge generation but never from the degree table."""
    canon = canonical_edges(edges)
    sym = canon.select(
        F.col("src").alias("v"), F.col("dst").alias("nbr")
    ).unionByName(canon.select(F.col("dst").alias("v"), F.col("src").alias("nbr")))
    # deg is referenced three times (zdeg, deg(a), deg(b)) and adj twice
    # (both wedge sides) — persist so the canon/sym subtree is computed once,
    # not re-scanned per plan branch
    deg = sym.groupBy("v").agg(F.count("*").alias("deg")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    adj = sym.join(
        deg.select(F.col("v").alias("nbr"), F.col("deg").alias("nbr_deg")), "nbr"
    )
    if max_degree is not None:
        if max_degree < 1:
            raise ValueError(f"max_degree must be >= 1, got {max_degree}")
        adj = adj.filter(F.col("nbr_deg") <= max_degree)
    adj = adj.persist(StorageLevel.MEMORY_AND_DISK)
    return adj, deg


def neighborhood_scores(
    edges: DataFrame,
    min_common: int = 1,
    max_degree: int | None = 1024,
    exclude_existing: bool = False,
) -> DataFrame:
    """All five neighborhood-overlap link-prediction scores per vertex pair.

    Returns (a, b, common_neighbors, adamic_adar, resource_allocation,
    preferential_attachment, jaccard) with a < b, one row per pair sharing at
    least ``min_common`` neighbors in the simple undirected graph.

    ``exclude_existing``: anti-join out pairs that are already edges — the
    link-prediction candidate mode (score only *potential* links).
    ``max_degree``: skip wedge centers whose degree exceeds the cap (scale
    guard; scores then lower-bound the exact values). The default cap of
    1024 is the measured-feasible setting (BENCH/BASELINE.md: uncapped was
    killed at 580s on 2M power-law edges; caps 64–1024 run in 11–15s) —
    pass ``max_degree=None`` to opt into the exact-but-quadratic-in-hubs
    computation explicitly.

    Computes eagerly (the result is localCheckpoint-ed) so the shared
    adjacency/degree caches can be released before returning — repeated
    calls in one session don't accumulate cached tables.
    """
    if min_common < 1:
        raise ValueError(f"min_common must be >= 1, got {min_common}")
    adj, deg = _undirected_with_deg(edges, max_degree)
    # wedge through common neighbor z = `nbr`-as-center: rows (z, a), (z, b)
    left = adj.select(
        F.col("nbr").alias("z"), F.col("v").alias("a"), F.col("nbr_deg").alias("zdeg")
    )
    right = adj.select(F.col("nbr").alias("z"), F.col("v").alias("b"))
    wedges = left.join(right, "z").filter(F.col("a") < F.col("b"))
    scores = wedges.groupBy("a", "b").agg(
        F.count("*").alias("common_neighbors"),
        F.sum(F.lit(1.0) / F.log(F.col("zdeg"))).alias("adamic_adar"),
        F.sum(F.lit(1.0) / F.col("zdeg")).alias("resource_allocation"),
    )
    if min_common > 1:
        scores = scores.filter(F.col("common_neighbors") >= min_common)
    out = (
        scores.join(deg.select(F.col("v").alias("a"), F.col("deg").alias("da")), "a")
        .join(deg.select(F.col("v").alias("b"), F.col("deg").alias("db")), "b")
        .select(
            "a",
            "b",
            "common_neighbors",
            "adamic_adar",
            "resource_allocation",
            (F.col("da") * F.col("db")).alias("preferential_attachment"),
            (
                F.col("common_neighbors")
                / (F.col("da") + F.col("db") - F.col("common_neighbors"))
            ).alias("jaccard"),
        )
    )
    if exclude_existing:
        out = out.join(
            canonical_edges(edges).select(
                F.col("src").alias("a"), F.col("dst").alias("b")
            ),
            ["a", "b"],
            "left_anti",
        )
    out = out.localCheckpoint(eager=True)
    adj.unpersist()
    deg.unpersist()
    return out


def clustering_coefficients(
    edges: DataFrame, vertices: DataFrame, triangles_per_vertex: DataFrame
) -> DataFrame:
    """Local clustering coefficient 2·tri(v) / (deg(v)·(deg(v)−1)).

    Takes the per-vertex triangle table from
    :func:`halvesting_geometric_spark.operators.triangles.triangle_count`
    (degree-oriented, O(√E)-bounded) so the heavy work is shared; this is a
    pure join + expression over it. Vertices with degree < 2 get coefficient
    0. Returns (vertex_id, degree, triangles, coeff).
    """
    canon = canonical_edges(edges)
    deg = (
        canon.select(F.col("src").alias("vertex_id"))
        .unionByName(canon.select(F.col("dst").alias("vertex_id")))
        .groupBy("vertex_id")
        .agg(F.count("*").alias("degree"))
    )
    return (
        vertices.select("vertex_id")
        .join(deg, "vertex_id", "left")
        .join(triangles_per_vertex, "vertex_id", "left")
        .select(
            "vertex_id",
            F.coalesce("degree", F.lit(0)).cast("long").alias("degree"),
            F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles"),
        )
        .withColumn(
            "coeff",
            F.when(
                F.col("degree") >= 2,
                2.0
                * F.col("triangles")
                / (F.col("degree") * (F.col("degree") - 1)),
            ).otherwise(F.lit(0.0)),
        )
    )


def four_cycles(edges: DataFrame, max_degree: int | None = 1024) -> DataFrame:
    """Exact 4-cycle (rectangle) count of the simple undirected graph.

    Every 4-cycle a–x–b–y–a is determined by its two diagonal pairs; with
    cn(a,b) = |N(a) ∩ N(b)|, each unordered pair contributes C(cn, 2)
    rectangles and each rectangle is counted by exactly its two diagonals,
    so #C4 = Σ_{a<b} C(cn(a,b), 2) / 2 — one wedge self-join + two
    aggregates, the same degree-bounded shape as the link-prediction scores
    (``max_degree`` applies the identical hub guard; counts then lower-bound
    the exact value; the default cap of 1024 matches
    :func:`neighborhood_scores` — pass ``None`` explicitly for the exact
    count, in which case the degree table isn't built at all).
    Returns one row (n_four_cycles: long), computed eagerly.
    """
    if max_degree is None:
        canon = canonical_edges(edges)
        adj = canon.select(
            F.col("dst").alias("z"), F.col("src").alias("v")
        ).unionByName(
            canon.select(F.col("src").alias("z"), F.col("dst").alias("v"))
        ).persist(StorageLevel.MEMORY_AND_DISK)
        deg = None
        left = adj.select("z", F.col("v").alias("a"))
        right = adj.select("z", F.col("v").alias("b"))
    else:
        adj, deg = _undirected_with_deg(edges, max_degree)
        left = adj.select(F.col("nbr").alias("z"), F.col("v").alias("a"))
        right = adj.select(F.col("nbr").alias("z"), F.col("v").alias("b"))
    cn = (
        left.join(right, "z")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("cn"))
    )
    total = cn.agg(
        (F.sum(F.col("cn") * (F.col("cn") - 1) / 2) / 2)
        .cast("long")
        .alias("n_four_cycles")
    ).localCheckpoint(eager=True)
    adj.unpersist()
    if deg is not None:
        deg.unpersist()
    return total


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """Newman's degree assortativity coefficient on the simple undirected
    graph: the Pearson correlation of (deg(u), deg(v)) over all directed
    stub pairs (both orientations of every edge, the standard convention).

    One edge pass + two degree joins + a single `corr` aggregate — all
    map-side combinable; no driver-side math beyond the final scalar.
    Returns a one-row DataFrame (assortativity: double); NaN→null when the
    graph is degree-regular (zero variance).
    """
    canon = canonical_edges(edges)
    sym = canon.select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    ).unionByName(
        canon.select(F.col("dst").alias("a"), F.col("src").alias("b"))
    )
    deg = sym.groupBy("a").agg(F.count("*").alias("deg"))
    paired = sym.join(
        deg.select(F.col("a"), F.col("deg").alias("da")), "a"
    ).join(
        deg.select(F.col("a").alias("b"), F.col("deg").alias("db")), "b"
    )
    return paired.agg(
        F.corr(F.col("da").cast("double"), F.col("db").cast("double")).alias(
            "assortativity"
        )
    )


def modularity(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """Newman modularity Q of a vertex partition on the simple undirected
    graph: Q = Σ_c [ e_c/m − (d_c/2m)² ] with e_c the intra-community edge
    count, d_c the community's degree sum, m the undirected edge count.

    The standard quality metric for community assignments (e.g. the label
    propagation output). ``labels``: (vertex_id, label). Two joins + two
    aggregates, all map-side combinable. Returns one row
    (m: long, n_communities: long, modularity: double).
    """
    canon = canonical_edges(edges)
    lab = labels.select("vertex_id", "label")
    # tagged feeds three aggregates (edge count, degree-union, intra count)
    # — cache it, not canon, and release only after the last one
    tagged = canon.join(
        lab.select(F.col("vertex_id").alias("src"), F.col("label").alias("la")),
        "src",
    ).join(
        lab.select(F.col("vertex_id").alias("dst"), F.col("label").alias("lb")),
        "dst",
    ).persist(StorageLevel.MEMORY_AND_DISK)
    m_row = tagged.agg(
        F.count("*").alias("m"),
        F.sum(F.when(F.col("la") == F.col("lb"), 1).otherwise(0)).alias(
            "intra"
        ),
    ).first()
    m = int(m_row["m"] or 0)
    spark = edges.sparkSession
    if m == 0:
        tagged.unpersist()
        return spark.createDataFrame(
            [(0, 0, 0.0)], "m long, n_communities long, modularity double"
        )
    # degree sum per community over the same simple graph
    deg = tagged.select(
        F.col("la").alias("label")
    ).unionByName(tagged.select(F.col("lb").alias("label")))
    per_c = deg.groupBy("label").agg(F.count("*").alias("d_c"))
    intra_c = (
        tagged.filter(F.col("la") == F.col("lb"))
        .groupBy("la")
        .agg(F.count("*").alias("e_c"))
        .select(F.col("la").alias("label"), "e_c")
    )
    q = (
        per_c.join(intra_c, "label", "left")
        .select(
            "label",
            F.coalesce("e_c", F.lit(0)).alias("e_c"),
            "d_c",
        )
        .agg(
            F.count("*").alias("n_communities"),
            F.sum(
                F.col("e_c") / F.lit(float(m))
                - (F.col("d_c") / F.lit(2.0 * m)) ** 2
            ).alias("modularity"),
        )
        .first()
    )
    tagged.unpersist()
    return spark.createDataFrame(
        [(m, int(q["n_communities"]), float(q["modularity"]))],
        "m long, n_communities long, modularity double",
    )


def graph_stats(edges: DataFrame, vertices: DataFrame) -> DataFrame:
    """One-row structural summary: |V|, |E| directed, |E| simple-undirected,
    self-loops, reciprocal directed pairs, max/avg out-degree, density.

    Three jobs total: one per-source aggregate over the edge table (edge
    count + self-loops + max out-degree, all map-side combinable), one
    canonical-pair aggregate (undirected count + reciprocity in the same
    pass: a normalized pair seen in both directions is reciprocal), and one
    count over vertices. No driver-side iteration. Reciprocity = directed
    pairs (u,v), u≠v, where (v,u) also exists (counted once per unordered
    pair).
    """
    e = edges.select("src", "dst").persist(StorageLevel.MEMORY_AND_DISK)
    n_vertices = vertices.select("vertex_id").distinct().count()
    per_src = e.groupBy("src").agg(
        F.count("*").alias("d"),
        F.sum(F.when(F.col("src") == F.col("dst"), 1).otherwise(0)).alias(
            "loops"
        ),
    )
    base = per_src.agg(
        F.sum("d").alias("n_edges"),
        F.sum("loops").alias("n_self_loops"),
        F.max("d").alias("max_out"),
    ).first()
    n_edges = int(base["n_edges"] or 0)
    n_self = int(base["n_self_loops"] or 0)
    max_out = int(base["max_out"] or 0)
    # one pass over normalized non-loop pairs: each distinct directed edge
    # contributes one row; a pair with both directions present is reciprocal
    pair_stats = (
        e.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            (F.col("src") < F.col("dst")).alias("fwd"),
        )
        .distinct()
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_dir"))
        .agg(
            F.count("*").alias("n_undirected"),
            F.sum(F.when(F.col("n_dir") == 2, 1).otherwise(0)).alias("recip"),
        )
        .first()
    )
    n_undirected = int(pair_stats["n_undirected"] or 0)
    recip = int(pair_stats["recip"] or 0)
    e.unpersist()
    spark = edges.sparkSession
    density = (
        float(n_edges) / (n_vertices * (n_vertices - 1)) if n_vertices > 1 else 0.0
    )
    return spark.createDataFrame(
        [
            (
                n_vertices,
                n_edges,
                n_undirected,
                n_self,
                recip,
                int(max_out),
                float(n_edges) / n_vertices if n_vertices else 0.0,
                density,
            )
        ],
        "n_vertices long, n_edges long, n_undirected long, n_self_loops long, "
        "n_reciprocal long, max_out_deg long, avg_out_deg double, density double",
    )


def citation_pair_counts(
    edges: DataFrame,
    mode: str = "cocitation",
    max_degree: int | None = 1024,
    min_count: int = 1,
) -> DataFrame:
    """Co-citation / bibliographic-coupling pair counts on the DIRECTED graph.

    ``mode="cocitation"``: for each unordered pair (a, b), how many vertices
    cite BOTH (shared in-neighbor count — wedge center c with c→a and c→b).
    ``mode="coupling"``: how many vertices both a and b cite (shared
    out-neighbor — wedge center t with a→t and b→t). The citation-analysis
    duals of Small 1973 / Kessler 1963, over the same edge table the
    link-prediction scores use.

    Scale shape: one wedge self-join keyed on the center, with the center's
    fan-out capped at ``max_degree`` (a center of degree d emits d·(d−1)/2
    pairs — the cap bounds the quadratic blowup exactly like the undirected
    wedge joins; ``None`` opts into uncapped). Returns (a, b, n) with a < b
    and n >= ``min_count``.
    """
    if mode not in ("cocitation", "coupling"):
        raise ValueError(f"mode must be cocitation|coupling, got {mode!r}")
    # center = the wedge apex: the citing doc for co-citation (its
    # out-neighbors get paired), the cited doc for coupling (in-neighbors)
    center, leaf = ("src", "dst") if mode == "cocitation" else ("dst", "src")
    e = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(F.col(center).alias("c"), F.col(leaf).alias("x"))
        .dropDuplicates(["c", "x"])
    )
    if max_degree is not None:
        deg = e.groupBy("c").agg(F.count("*").alias("_cd"))
        e = e.join(deg, "c").filter(F.col("_cd") <= max_degree).drop("_cd")
    pairs = (
        e.select("c", F.col("x").alias("a"))
        .join(e.select("c", F.col("x").alias("b")), "c")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("n"))
    )
    if min_count > 1:
        pairs = pairs.filter(F.col("n") >= min_count)
    return pairs
