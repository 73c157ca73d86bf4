"""Sampling (split / negatives / neighbor fanout) + source/sink layer."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from halvesting_geometric_spark.datagen import generate_transcripts
from halvesting_geometric_spark.operators.graph import build_graph
from halvesting_geometric_spark.operators.sampling import (
    negative_edges,
    sample_neighbors,
    split_edges,
)
from halvesting_geometric_spark.schemas import TRANSCRIPTS_SCHEMA
from halvesting_geometric_spark.sources.io import (
    read_transcripts_json,
    read_tsv,
    write_table,
    write_tsv_single,
)


def _graph(spark, n=150, seed=17):
    return build_graph(generate_transcripts(spark, n, seed=seed))


def test_split_edges_deterministic_partition_and_ratios(spark):
    g = _graph(spark)
    s1 = split_edges(g.edges).toPandas()
    s2 = split_edges(g.edges.repartition(7)).toPandas()
    m1 = {(r.src, r.dst): r.split for r in s1.itertuples()}
    m2 = {(r.src, r.dst): r.split for r in s2.itertuples()}
    assert m1 == m2  # partition-invariant assignment
    counts = s1["split"].value_counts(normalize=True)
    assert abs(counts.get("val", 0) - 0.1) < 0.05
    assert abs(counts.get("test", 0) - 0.2) < 0.06
    assert counts.get("train", 0) > 0.6


def test_negative_edges_are_nonedges_and_deterministic(spark):
    g = _graph(spark, n=100, seed=23)
    pos = {(r.src, r.dst) for r in g.edges.toPandas().itertuples()}
    n1 = negative_edges(g.edges, g.vertices, ratio=1.0, seed=5).toPandas()
    n2 = negative_edges(g.edges, g.vertices, ratio=1.0, seed=5).toPandas()
    neg = {(r.src, r.dst) for r in n1.itertuples()}
    assert neg.isdisjoint(pos)
    assert not any(s == d for s, d in neg)
    assert set(map(tuple, n1.to_numpy())) == set(map(tuple, n2.to_numpy()))
    assert len(n1) == g.edges.count()  # quota met at ratio=1.0


def test_sample_neighbors_fanout_cap_and_subset(spark):
    g = _graph(spark)
    full = g.edges.toPandas()
    samp = sample_neighbors(g.edges, fanout=3, seed=9).toPandas()
    per_src = samp.groupby("src").size()
    assert (per_src <= 3).all()
    pos = set(map(tuple, full.to_numpy()))
    assert set(map(tuple, samp.to_numpy())) <= pos
    # sources with <=3 neighbors keep all of them
    deg = full.groupby("src").size()
    for src, d in deg.items():
        if d <= 3:
            assert per_src.get(src, 0) == d


def test_json_and_tsv_roundtrip(spark, tmp_path):
    tr = generate_transcripts(spark, 20, seed=1)
    json_dir = str(tmp_path / "j")
    tr.write.mode("overwrite").json(json_dir)
    back = read_transcripts_json(spark, json_dir)
    # file reads force nullable=True; names+types are the schema contract
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in TRANSCRIPTS_SCHEMA.fields
    ]
    assert back.count() == tr.count()
    a = tr.orderBy("conv_id", "turn_idx").select("conv_id", "turn_idx", "text").toPandas()
    b = back.orderBy("conv_id", "turn_idx").select("conv_id", "turn_idx", "text").toPandas()
    assert (a.to_numpy() == b.to_numpy()).all()

    g = build_graph(tr)
    tsv_dir = str(tmp_path / "t")
    write_tsv_single(g.vertices, tsv_dir)
    back_v = read_tsv(spark, tsv_dir, g.vertices.schema)
    assert sorted(back_v.toPandas()["conv_id"]) == sorted(
        g.vertices.toPandas()["conv_id"]
    )


def test_zstd_parquet_sink(spark, tmp_path):
    g = _graph(spark, n=40, seed=2)
    out = str(tmp_path / "edges_pq")
    write_table(g.edges, out)
    import glob

    files = glob.glob(f"{out}/*.zstd.parquet") + glob.glob(f"{out}/*.parquet")
    assert files
    assert spark.read.parquet(out).count() == g.edges.count()


def test_json_scan_quarantines_corrupt_lines(spark, tmp_path):
    import json as _json

    jdir = tmp_path / "mixed_json"
    jdir.mkdir()
    good = {
        "conv_id": "c1", "turn_idx": 0, "role": "user",
        "text": "hello", "tool": None, "ts": "2024-01-01T00:00:00Z",
    }
    lines = [
        _json.dumps(good),
        '{"conv_id": "c2", "turn_idx": BROKEN',
        _json.dumps({**good, "conv_id": "c3", "turn_idx": 1}),
        "not json at all",
    ]
    (jdir / "part.json").write_text("\n".join(lines))

    clean = read_transcripts_json(spark, str(jdir))
    assert sorted(r["conv_id"] for r in clean.collect()) == ["c1", "c3"]
    assert "_corrupt_record" not in clean.columns

    kept = read_transcripts_json(spark, str(jdir), keep_corrupt=True)
    bad = kept.filter("_corrupt_record is not null").collect()
    assert len(bad) == 2
    assert any("BROKEN" in r["_corrupt_record"] for r in bad)


def test_sample_neighbors_layered_two_hop(spark):
    """Layered fanout: hop 1 equals the single-layer sampler; hop 2 expands
    only hop-1 destinations with its own fanout cap and derived seed;
    pinned against a python replay of both windowed hops."""
    import pytest

    from halvesting_geometric_spark.operators.sampling import (
        sample_neighbors_layered,
    )

    g = _graph(spark)
    got = sample_neighbors_layered(
        g.edges, fanouts=(3, 2), seed=9
    ).toPandas()
    h1 = got[got.hop == 1][["src", "dst"]]
    h2 = got[got.hop == 2][["src", "dst"]]

    # hop 1 == the single-layer sampler at the same seed
    single = sample_neighbors(g.edges, fanout=3, seed=9).toPandas()
    assert set(map(tuple, h1.to_numpy())) == set(map(tuple, single.to_numpy()))

    # hop 2: per-src cap, sources are exactly hop-1 dsts that have out-edges,
    # and every sampled row is a real edge
    edges = g.edges.toPandas()
    pos = set(map(tuple, edges[["src", "dst"]].to_numpy()))
    assert (h2.groupby("src").size() <= 2).all()
    assert set(map(tuple, h2.to_numpy())) <= pos
    frontier = set(h1["dst"])
    srcs_with_out = set(edges["src"])
    assert set(h2["src"]) == frontier & srcs_with_out

    # deterministic and partition-invariant
    again = sample_neighbors_layered(
        g.edges.repartition(13), fanouts=(3, 2), seed=9
    ).toPandas()
    assert set(map(tuple, got.to_numpy())) == set(map(tuple, again.to_numpy()))

    # seeds restriction: layer-1 sources confined to the seed set
    seeds = spark.createDataFrame(
        [(v,) for v in sorted(srcs_with_out)[:5]], "vertex_id long"
    )
    rooted = sample_neighbors_layered(
        g.edges, fanouts=(3, 2), seeds=seeds, seed=9
    ).toPandas()
    assert set(rooted[rooted.hop == 1]["src"]) <= set(
        seeds.toPandas()["vertex_id"]
    )

    with pytest.raises(ValueError, match="fanouts"):
        sample_neighbors_layered(g.edges, fanouts=())
    with pytest.raises(ValueError, match="fanouts"):
        sample_neighbors_layered(g.edges, fanouts=(3, 0))
