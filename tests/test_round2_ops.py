"""Round-2 operators: typed graph, entity resolution, nested structs,
exact distributed top-n, portable hashing, multi-table LSH ANN."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from halvesting_geometric_spark.functions import (
    portable_hash64,
    portable_hash64_sql,
)
from halvesting_geometric_spark.operators.hetero import HeteroGraph
from halvesting_geometric_spark.operators.nested import (
    build_struct_array,
    flatten_struct_array,
)
from halvesting_geometric_spark.operators.resolve import resolve_entities
from halvesting_geometric_spark.operators.sampling import (
    negative_edges,
    sample_neighbors,
    take_smallest_exact,
)
from halvesting_geometric_spark.operators.similarity import (
    cosine_topk_bruteforce,
    lsh_ann_topk,
)


# -- portable hash ------------------------------------------------------------


def test_portable_hash_matches_duckdb(spark):
    import duckdb

    df = spark.createDataFrame(
        [("abc", 7), ("x y\tz", -3), ("", 0)], "s string, k long"
    )
    rows = df.select(
        "s", "k", portable_hash64("s", "k", seed=99).alias("h")
    ).collect()
    con = duckdb.connect()
    for r in rows:
        got = con.execute(
            f"SELECT {portable_hash64_sql('$s', '$k', seed=99)}",
            {"s": r["s"], "k": r["k"]},
        ).fetchone()[0]
        assert got == r["h"]
        assert 0 <= r["h"] < (1 << 60)


# -- exact distributed top-n --------------------------------------------------


@pytest.mark.parametrize("n", [0, 1, 17, 250, 1000])
def test_take_smallest_exact_equals_global_sort(spark, n):
    df = (
        spark.range(1000)
        .select(F.col("id").alias("k"))
        .withColumn("_h", F.xxhash64("k", F.lit(5)))
    )
    got = sorted(
        r["k"] for r in take_smallest_exact(df, n, tie_cols=("k",)).collect()
    )
    want = sorted(
        r["k"]
        for r in df.orderBy(F.col("_h").asc(), F.col("k").asc()).limit(n).collect()
    )
    assert got == want


# -- sampling rewrites --------------------------------------------------------


def _ring_edges(spark, n=40, extra=3):
    rows = [(i, (i + d) % n) for i in range(n) for d in range(1, extra + 1)]
    return spark.createDataFrame(rows, "src long, dst long")


def test_sample_neighbors_window_semantics(spark):
    edges = _ring_edges(spark)
    out = sample_neighbors(edges, fanout=2, hash_method="portable")
    pdf = out.toPandas()
    assert (pdf.groupby("src").size() <= 2).all()
    # subset of the input edge set
    all_edges = {(r["src"], r["dst"]) for r in edges.collect()}
    assert set(map(tuple, pdf.to_numpy())) <= all_edges
    # deterministic across recomputation
    pdf2 = sample_neighbors(edges, fanout=2, hash_method="portable").toPandas()
    assert sorted(map(tuple, pdf.to_numpy())) == sorted(map(tuple, pdf2.to_numpy()))


def test_negative_edges_disjoint_and_modes_agree(spark):
    edges = _ring_edges(spark)
    verts = spark.range(40).select(F.col("id").alias("vertex_id"))
    a = negative_edges(edges, verts, ratio=0.5, early_stop=True).toPandas()
    b = negative_edges(edges, verts, ratio=0.5, early_stop=False).toPandas()
    pos = {(r["src"], r["dst"]) for r in edges.collect()}
    got = set(map(tuple, a.to_numpy()))
    assert not (got & pos)
    assert not any(s == d for s, d in got)
    # both modes fill the exact quota (need = 0.5 × |E| here) and stay
    # disjoint from positives; the sets may differ (different candidate pools)
    need = int(edges.count() * 0.5)
    assert len(a) == need == len(b)
    got_b = set(map(tuple, b.to_numpy()))
    assert not (got_b & pos) and not any(s == d for s, d in got_b)
    # each mode is deterministic across recomputation
    b2 = negative_edges(edges, verts, ratio=0.5, early_stop=False).toPandas()
    assert sorted(map(tuple, b.to_numpy())) == sorted(map(tuple, b2.to_numpy()))


def test_negative_edges_rejects_sparse_ids(spark):
    edges = spark.createDataFrame([(10, 20)], "src long, dst long")
    verts = spark.createDataFrame([(10,), (20,)], "vertex_id long")
    with pytest.raises(ValueError, match="dense"):
        negative_edges(edges, verts)


# -- heterogeneous graph ------------------------------------------------------


def _typed_graph(spark) -> HeteroGraph:
    g = HeteroGraph()
    g.add_vertices(
        "author", spark.createDataFrame([(1,), (2,), (3,)], "id long")
    )
    g.add_vertices(
        "paper", spark.createDataFrame([("pA",), ("pB",)], "id string")
    )
    g.add_edges(
        "author",
        "writes",
        "paper",
        spark.createDataFrame(
            [(1, "pA"), (2, "pA"), (3, "pB")], "src long, dst string"
        ),
    )
    g.add_edges(
        "paper",
        "cites",
        "paper",
        spark.createDataFrame([("pA", "pB")], "src string, dst string"),
    )
    return g


def test_hetero_degrees_and_reverse(spark):
    g = _typed_graph(spark)
    deg = {r["id"]: r["degree"] for r in g.degrees("writes", side="dst").collect()}
    assert deg == {"pA": 2, "pB": 1}
    g2 = g.add_reverse()
    assert ("paper", "rev_writes", "author") in g2.edges
    rdeg = {
        r["id"]: r["degree"] for r in g2.degrees("rev_writes", side="src").collect()
    }
    assert rdeg == deg  # reverse src degree == forward dst degree


def test_hetero_meta_and_validate(spark):
    g = _typed_graph(spark)
    meta = {(r["kind"], r["name"]): r["n"] for r in g.meta_counts().collect()}
    assert meta[("vertex", "author")] == 3
    assert meta[("edge", "author-writes-paper")] == 3
    assert all(v == 0 for v in g.validate().values())
    # break it: edge to a paper that doesn't exist
    g.edges[("paper", "cites", "paper")] = spark.createDataFrame(
        [("pA", "pMISSING")], "src string, dst string"
    )
    assert g.validate()["paper-cites-paper"] == 1


def test_hetero_to_homogeneous_roundtrip(spark):
    g = _typed_graph(spark)
    verts, edges = g.to_homogeneous()
    vp = verts.toPandas()
    # dense ids 0..n-1, one per typed vertex
    assert sorted(vp["vertex_id"]) == list(range(5))
    assert set(zip(vp["vtype"], vp["id"])) == {
        ("author", "1"), ("author", "2"), ("author", "3"),
        ("paper", "pA"), ("paper", "pB"),
    }
    ep = edges.toPandas()
    assert len(ep) == 4 and set(ep["relation"]) == {"writes", "cites"}
    # endpoints must be valid dense ids
    assert set(ep["src"]) | set(ep["dst"]) <= set(vp["vertex_id"])


# -- nested structs -----------------------------------------------------------


def test_nested_build_flatten_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, 10, "a"), (1, 11, "b"), (2, 20, "c")], "g long, x long, s string"
    )
    nested = build_struct_array(df, ["g"], [F.col("x"), F.col("s")], out_col="items")
    assert dict(nested.dtypes)["items"].startswith("array<struct")
    flat = flatten_struct_array(nested, "items")
    assert sorted(map(tuple, flat.select("g", "x", "s").toPandas().to_numpy())) == [
        (1, 10, "a"), (1, 11, "b"), (2, 20, "c")
    ]
    # empty arrays vanish (inner-explode semantics)
    empty = nested.withColumn("items", F.filter("items", lambda s: F.lit(False)))
    assert flatten_struct_array(empty, "items").count() == 0


# -- entity resolution --------------------------------------------------------


def test_resolve_entities_normalized_composite(spark):
    catalog = spark.createDataFrame(
        [(100, "Deep  Learning!", 2015), (200, "deep learning", 2016),
         (300, "other work", 2015)],
        "doc_id long, title string, year int",
    )
    mentions = spark.createDataFrame(
        [(1, "DEEP LEARNING", 2015), (2, "deep learning", 2016),
         (3, "unknown title", 1999), (4, "Deep, Learning", 2015)],
        "mid long, title string, year int",
    )
    out = resolve_entities(
        mentions, catalog, keys=["title", "year"], right_id="doc_id"
    )
    got = {r["mid"]: r["resolved_id"] for r in out.collect()}
    assert got == {1: 100, 2: 200, 3: None, 4: 100}
    # drop policy removes the dangling mention
    kept = resolve_entities(
        mentions, catalog, keys=["title", "year"], right_id="doc_id",
        dangling="drop",
    )
    assert sorted(r["mid"] for r in kept.collect()) == [1, 2, 4]
    # ambiguous key resolves to min id deterministically
    cat2 = catalog.unionByName(
        spark.createDataFrame([(50, "deep learning", 2015)],
                              "doc_id long, title string, year int")
    )
    got2 = {r["mid"]: r["resolved_id"] for r in resolve_entities(
        mentions, cat2, keys=["title", "year"], right_id="doc_id").collect()}
    assert got2[1] == 50


def test_resolve_entities_portable_equals_xxhash(spark):
    catalog = spark.createDataFrame(
        [(i, f"t{i % 7}", i % 3) for i in range(30)],
        "doc_id long, title string, year int",
    )
    mentions = spark.createDataFrame(
        [(i, f"T{i % 9}", i % 3) for i in range(40)],
        "mid long, title string, year int",
    )
    a = resolve_entities(mentions, catalog, keys=["title", "year"],
                         right_id="doc_id", hash_method="xxhash64").toPandas()
    b = resolve_entities(mentions, catalog, keys=["title", "year"],
                         right_id="doc_id", hash_method="portable").toPandas()
    ka = sorted(map(tuple, a.fillna(-1).to_numpy().tolist()))
    kb = sorted(map(tuple, b.fillna(-1).to_numpy().tolist()))
    assert ka == kb  # hash choice can never change the resolution


# -- multi-table LSH ANN ------------------------------------------------------


def _emb_df(spark, n=120, dim=16, seed=11, clusters=10, noise=0.15):
    """Clustered embeddings: true nearest neighbors are same-cluster points
    (cosine ≈ 1-noise²) — the regime ANN is for. Uniform random vectors have
    no 'near' neighbors, so recall there measures nothing."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = (
        centers[np.arange(n) % clusters]
        + noise * rng.standard_normal((n, dim))
    ).astype("float32")
    return spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    )


def test_lsh_ann_multitable_recall_beats_single(spark):
    emb = _emb_df(spark)
    exact = cosine_topk_bruteforce(emb, emb, k=3)
    truth = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}

    def recall(n_tables):
        approx = lsh_ann_topk(
            emb, dim=16, k=3, n_planes=4, n_tables=n_tables
        )
        hits = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
        return len(hits & truth) / len(truth)

    # measured on this fixture: 1 table 0.536 → 4 tables 0.908 (COVERAGE.md)
    r1, r4 = recall(1), recall(4)
    assert r4 >= r1
    assert r4 >= 0.9  # the documented recall bar at bounded candidates


def test_lsh_ann_bucket_cap_bounds_candidates(spark):
    emb = _emb_df(spark, n=60)
    capped = lsh_ann_topk(emb, dim=16, k=5, n_planes=2, n_tables=1, bucket_cap=8)
    # with 2 planes there are ≤4 buckets of ~15 vectors; cap=8 keeps ≤8 per
    # bucket → every query returned must still have ≤ k neighbors and the
    # query set shrinks to capped entries only
    pdf = capped.toPandas()
    assert (pdf.groupby("query_id").size() <= 5).all()
    assert pdf["query_id"].nunique() <= 8 * 4


# -- round-2b: fingerprint portable path, embedding near-dups ------------------


def test_fingerprint_portable_matches_duckdb(spark):
    """The portable-hash fingerprint dataflow is bit-identical in DuckDB —
    the property the gate oracle for `fingerprints` relies on."""
    import duckdb

    from halvesting_geometric_spark.functions import portable_hash64_sql
    from halvesting_geometric_spark.operators.textstats import fingerprint

    rows = [
        (0, "Hello   World"),
        (1, "hello world"),
        (2, "x" * 600),  # longer than the 256-char head/tail probes
        (3, "  Mixed   CASE  and\tspacing "),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = (
        fingerprint(df, hash_method="portable")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE docs(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO docs VALUES (?, ?)", rows)
    norm = r"regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"
    want = con.execute(
        f"""WITH n AS (SELECT doc_id, {norm} AS nt FROM docs)
        SELECT doc_id,
               {portable_hash64_sql('nt', seed=0)} AS fp_full,
               {portable_hash64_sql('substr(nt, 1, 256)', seed=0)} AS fp_head,
               {portable_hash64_sql('reverse(substr(reverse(nt), 1, 256))', seed=0)}
                 AS fp_tail
        FROM n ORDER BY doc_id"""
    ).df()
    for c in ("fp_full", "fp_head", "fp_tail"):
        assert list(got[c]) == list(want[c]), c
    # invariance carried over from the xxhash64 path
    assert got.loc[0, "fp_full"] == got.loc[1, "fp_full"]


def test_embedding_near_dups_finds_planted_pair(spark):
    import numpy as np

    from halvesting_geometric_spark.operators.similarity import (
        embedding_near_dups,
    )

    rng = np.random.default_rng(3)
    base = rng.standard_normal(16)
    rows = [(0, base.tolist()), (1, (base + rng.standard_normal(16) * 0.01).tolist())]
    rows += [(i, rng.standard_normal(16).tolist()) for i in range(2, 40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = embedding_near_dups(emb, dim=16, threshold=0.95, n_planes=6).toPandas()
    assert (0, 1) in set(zip(got["a"], got["b"]))
    assert (got["cosine"] >= 0.95).all()
    assert (got["a"] < got["b"]).all()


def test_temporal_degree_evolution_matches_python(spark):
    """Temporal rollups vs a pandas twin on generated transcripts:
    per-bucket counts, distinct targets, and running totals."""
    import pandas as pd

    from halvesting_geometric_spark.datagen import generate_transcripts
    from halvesting_geometric_spark.operators.temporal import (
        degree_evolution,
        edge_events,
        graph_growth,
    )

    tr = generate_transcripts(spark, 60, seed=6)
    ev = edge_events(tr).toPandas()
    assert len(ev) > 0
    ev["bucket_start"] = ev["ts"].dt.floor("h")

    got = (
        degree_evolution(tr, bucket="hour")
        .toPandas()
        .sort_values(["src_conv", "bucket_start"])
        .reset_index(drop=True)
    )
    exp = (
        ev.groupby(["src_conv", "bucket_start"])
        .agg(
            n_refs=("dst_conv", "size"),
            n_distinct_dst=("dst_conv", "nunique"),
        )
        .reset_index()
        .sort_values(["src_conv", "bucket_start"])
        .reset_index(drop=True)
    )
    exp["cum_refs"] = exp.groupby("src_conv")["n_refs"].cumsum()
    pd.testing.assert_frame_equal(
        got[["src_conv", "bucket_start", "n_refs", "n_distinct_dst", "cum_refs"]],
        exp.astype({"n_refs": "int64", "n_distinct_dst": "int64",
                    "cum_refs": "int64"}),
        check_dtype=False,
    )

    growth = graph_growth(tr, bucket="hour").toPandas().sort_values(
        "bucket_start"
    )
    assert growth["cum_refs"].iloc[-1] == len(ev)
    assert (growth["cum_refs"].diff().dropna() > 0).all() or len(growth) == 1
