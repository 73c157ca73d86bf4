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


# --------------------------------------------------------------------------
# weighted_sample (Efraimidis–Spirakis A-ES)
# --------------------------------------------------------------------------


def test_weighted_sample_partition_invariant_and_reference(spark):
    import hashlib
    import math

    from halvesting_geometric_spark.operators.sampling import weighted_sample

    rows = [(i, "g%d" % (i % 2), float(1 + (i * 7) % 13)) for i in range(60)]
    df = spark.createDataFrame(rows, "rid long, grp string, w double")

    got1 = weighted_sample(
        df.repartition(1), 4, "w", ("rid",), ("grp",), seed=9,
        hash_method="portable",
    )
    got7 = weighted_sample(
        df.repartition(7), 4, "w", ("rid",), ("grp",), seed=9,
        hash_method="portable",
    )
    s1 = sorted((r["grp"], r["rid"], r["priority_e6"]) for r in got1.collect())
    s7 = sorted((r["grp"], r["rid"], r["priority_e6"]) for r in got7.collect())
    assert s1 == s7 and len(s1) == 8

    # python replica of the portable priority
    span = 1 << 60

    def pri(rid, w):
        s = "\x1f".join([str(rid), "9"])
        h = int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % span
        u = (h + 1.0) / float(span + 2)
        return math.floor(-math.log(u) / w * 1_000_000 + 0.5)

    want = []
    for g in ("g0", "g1"):
        members = [(pri(i, w), i) for i, gg, w in rows if gg == g]
        for p, i in sorted(members)[:4]:
            want.append((g, i, p))
    assert s1 == sorted(want)


def test_weighted_sample_bias_and_guards(spark):
    from halvesting_geometric_spark.operators.sampling import weighted_sample

    rows = [(i, 1.0 if i else 100000.0) for i in range(50)]
    df = spark.createDataFrame(rows, "rid long, w double")
    # the 100000x-weight row must win a seat in a 5-of-50 sample
    picked = {
        r["rid"]
        for r in weighted_sample(df, 5, "w", ("rid",), seed=1).collect()
    }
    assert 0 in picked and len(picked) == 5

    # nonpositive / null weights are excluded
    bad = spark.createDataFrame(
        [(1, 0.0), (2, -3.0), (3, None), (4, 2.0)], "rid long, w double"
    )
    out = weighted_sample(bad, 10, "w", ("rid",), seed=1).collect()
    assert [r["rid"] for r in out] == [4]
