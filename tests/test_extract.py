"""Extraction stage + id assignment vs pandas oracles (SURVEY.md §5.2 items 1, 3)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from halvesting_geometric_spark.datagen import (
    generate_transcripts,
    generate_transcripts_pandas,
)
from halvesting_geometric_spark.operators.extract import (
    extract_conv_edges,
    ordered_turns,
)
from halvesting_geometric_spark.operators.graph import build_graph
from halvesting_geometric_spark.operators.ids import (
    build_vertices,
    dense_ids_scalable,
    dense_ids_window,
)
from tests.oracles import extract_edges_oracle

N_CONVS = 60
SEED = 7


def test_datagen_matches_pandas_oracle_per_turn(spark):
    """input_hint invariant: per-turn text equality under stable
    (conv_id, turn_idx) ordering, across partition layouts."""
    oracle = generate_transcripts_pandas(N_CONVS, SEED).sort_values(
        ["conv_id", "turn_idx"]
    )
    for parts in (1, 7):
        got = (
            ordered_turns(generate_transcripts(spark, N_CONVS, SEED, partitions=parts))
            .toPandas()
        )
        assert len(got) == len(oracle)
        assert (got["conv_id"].to_numpy() == oracle["conv_id"].to_numpy()).all()
        assert (got["turn_idx"].to_numpy() == oracle["turn_idx"].to_numpy()).all()
        assert (got["text"].to_numpy() == oracle["text"].to_numpy()).all()


def test_extract_conv_edges_matches_oracle(spark):
    tr = generate_transcripts(spark, N_CONVS, SEED)
    got = (
        extract_conv_edges(tr)
        .toPandas()
        .sort_values(["src_conv", "dst_conv"])
        .reset_index(drop=True)
    )
    exp = extract_edges_oracle(generate_transcripts_pandas(N_CONVS, SEED))
    pd.testing.assert_frame_equal(got, exp)
    assert got.duplicated().sum() == 0


def test_dangling_refs_become_vertices(spark):
    """Reference semantics: cited-but-absent ids augment the vertex set
    (link_prediction_metadata.py:312-319)."""
    tr = generate_transcripts(spark, N_CONVS, SEED)
    edges = extract_conv_edges(tr)
    verts = build_vertices(edges, transcripts=tr).toPandas()
    dst = edges.toPandas()["dst_conv"]
    dangling = {d for d in dst if d.startswith("x")}
    assert dangling, "fixture should produce dangling refs"
    assert dangling <= set(verts["conv_id"])
    # dense 0-based ids in conv_id order
    verts = verts.sort_values("vertex_id")
    assert verts["vertex_id"].tolist() == list(range(len(verts)))
    assert verts["conv_id"].is_monotonic_increasing


def test_dense_ids_scalable_equals_window(spark):
    tr = generate_transcripts(spark, N_CONVS, SEED)
    ids = tr.select("conv_id").distinct()
    w = dense_ids_window(ids, "conv_id").toPandas().sort_values("conv_id")
    s = (
        dense_ids_scalable(ids, "conv_id", num_partitions=5)
        .toPandas()
        .sort_values("conv_id")
    )
    assert (w["vertex_id"].to_numpy() == s["vertex_id"].to_numpy()).all()
    assert (w["conv_id"].to_numpy() == s["conv_id"].to_numpy()).all()


def test_build_graph_edge_ids_roundtrip(spark):
    tr = generate_transcripts(spark, N_CONVS, SEED)
    g = build_graph(tr, scalable_ids=False)
    verts = g.vertices.toPandas()
    id2conv = dict(zip(verts["vertex_id"], verts["conv_id"]))
    got = {
        (id2conv[s], id2conv[d])
        for s, d in g.edges.toPandas().itertuples(index=False)
    }
    exp_df = extract_edges_oracle(generate_transcripts_pandas(N_CONVS, SEED))
    exp = set(map(tuple, exp_df.to_numpy()))
    assert got == exp


def test_extraction_invariant_to_shuffle_partitions(spark):
    base = None
    for parts in ("1", "4"):
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        try:
            tr = generate_transcripts(spark, N_CONVS, SEED)
            e = (
                extract_conv_edges(tr)
                .toPandas()
                .sort_values(["src_conv", "dst_conv"])
                .reset_index(drop=True)
            )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", "4")
        if base is None:
            base = e
        else:
            pd.testing.assert_frame_equal(base, e)


def test_self_and_duplicate_refs_handling(spark):
    pdf = generate_transcripts_pandas(200, SEED)
    oracle_all = extract_edges_oracle(pdf)
    selfs = oracle_all[oracle_all.src_conv == oracle_all.dst_conv]
    assert len(selfs) > 0, "fixture should produce self-references"
    tr = generate_transcripts(spark, 200, SEED)
    no_self = extract_conv_edges(tr, drop_self=True).toPandas()
    assert (no_self["src_conv"] != no_self["dst_conv"]).all()
    assert len(no_self) == len(oracle_all) - len(selfs)
