"""Round-3d operators: bursts, group quantiles, ego subgraph, 4-cliques,
snapshot diff, stratified sampling. Each checked against an independent
pure-Python twin on small deterministic fixtures."""

from __future__ import annotations

import datetime as dt
import itertools
import math
import random

import pytest
from pyspark.sql import functions as F

from halvesting_geometric_spark.operators.events import burst_windows
from halvesting_geometric_spark.operators.quantiles import group_quantiles
from halvesting_geometric_spark.operators.sampling import stratified_sample
from halvesting_geometric_spark.operators.temporal import snapshot_diff
from halvesting_geometric_spark.operators.traversal import ego_subgraph
from halvesting_geometric_spark.operators.triangles import four_clique_total


def _verts(spark, n):
    return spark.range(n).select(F.col("id").alias("vertex_id"))


# ---------------------------------------------------------------- bursts


def test_burst_windows_z_twin(spark):
    rng = random.Random(7)
    rows = []
    base = dt.datetime(2026, 1, 1)
    for h in range(48):
        n = 5 if h != 30 else 50  # burst at hour 30
        for i in range(n):
            rows.append(
                (h * 1000 + i, base + dt.timedelta(hours=h, minutes=i % 60),
                 rng.randrange(10), "click", 1.0)
            )
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, "
              "event_type string, value double"
    )
    out = {
        r["hour"].hour + 24 * (r["hour"].day - 1): r
        for r in burst_windows(ev, trailing=24, min_history=6).collect()
    }
    # python twin for the burst hour
    prev = [5] * 24
    mean = sum(prev) / 24
    var = sum((x - mean) ** 2 for x in prev) / 23
    assert var == 0  # all-equal baseline: stddev 0 -> z must be null
    assert out[30]["z"] is None and out[30]["n"] == 50
    # perturb: first 5 hours have no 6-history -> null z
    for h in range(6):
        assert out[h]["z"] is None
    # hour 31's trailing window now contains the burst; twin-check its z
    hist = [5] * 23 + [50]
    m = sum(hist) / 24
    sd = math.sqrt(sum((x - m) ** 2 for x in hist) / 23)
    assert out[31]["z"] == pytest.approx((5 - m) / sd, rel=1e-12)


# ---------------------------------------------------------- group quantiles


def _type1(vals, p):
    s = sorted(vals)
    return s[math.floor((len(s) - 1) * p)]


def test_group_quantiles_twin(spark):
    rng = random.Random(11)
    rows = [(("a" if i % 3 else "b"), rng.randrange(1000)) for i in range(500)]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {r["g"]: r for r in
           group_quantiles(df, "g", "v", (0.5, 0.9, 0.99)).collect()}
    for g in ("a", "b"):
        vals = [v for gg, v in rows if gg == g]
        assert got[g]["n"] == len(vals)
        assert got[g]["q_50"] == _type1(vals, 0.5)
        assert got[g]["q_90"] == _type1(vals, 0.9)
        assert got[g]["q_99"] == _type1(vals, 0.99)


def test_group_quantiles_duplicates_and_small(spark):
    df = spark.createDataFrame(
        [("g", 7)] * 10 + [("h", 1), ("h", 2)], "g string, v long"
    )
    got = {r["g"]: r for r in group_quantiles(df, "g", "v", (0.5,)).collect()}
    assert got["g"]["q_50"] == 7
    assert got["h"]["q_50"] == 1  # floor((2-1)*0.5)+1 = rank 1


# ------------------------------------------------------------ ego subgraph


def test_ego_subgraph_twin(spark):
    # path 0-1-2-3-4 plus triangle 2-5-6, seed {0}
    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (2, 5), (5, 6), (2, 6)],
        "src long, dst long",
    )
    members, induced = ego_subgraph(e, _verts(spark, 7), [0], hops=2,
                                    directed=False)
    dists = {r["vertex_id"]: r["dist"] for r in members.collect()}
    assert dists == {0: 0, 1: 1, 2: 2}
    got_edges = {(r["src"], r["dst"]) for r in induced.collect()}
    assert got_edges == {(0, 1), (1, 2)}  # 2-3 / 2-5 / 2-6 endpoints outside


# ------------------------------------------------------------- 4-cliques


def _k4_brute(edges, n):
    es = {frozenset(e) for e in edges if e[0] != e[1]}
    cnt = 0
    for quad in itertools.combinations(range(n), 4):
        if all(frozenset(p) in es for p in itertools.combinations(quad, 2)):
            cnt += 1
    return cnt


def test_four_cliques_twin_random(spark):
    rng = random.Random(3)
    n = 14
    edges = [(a, b) for a in range(n) for b in range(a + 1, n)
             if rng.random() < 0.45]
    e = spark.createDataFrame(edges, "src long, dst long")
    got = four_clique_total(e).collect()[0]["four_cliques"]
    assert got == _k4_brute(edges, n)


def test_four_cliques_k5(spark):
    # K5 contains C(5,4)=5 four-cliques; duplicate/reversed edges ignored
    edges = [(a, b) for a in range(5) for b in range(5) if a != b]
    e = spark.createDataFrame(edges, "src long, dst long")
    assert four_clique_total(e).collect()[0]["four_cliques"] == 5


# ----------------------------------------------------------- snapshot diff


def test_snapshot_diff_twin(spark):
    base = dt.datetime(2026, 1, 1)
    rows = [
        ("c1", 0, "u", "see [[ref:c2]] end", "", base),
        ("c1", 1, "u", "see [[ref:c3]] end", "", base + dt.timedelta(days=2)),
        ("c2", 0, "u", "see [[ref:c3]] end", "", base + dt.timedelta(days=4)),
        ("c1", 2, "u", "see [[ref:c2]] end", "", base + dt.timedelta(days=5)),
    ]
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp_ntz"
    )
    out = snapshot_diff(t, base + dt.timedelta(days=1),
                        base + dt.timedelta(days=6))
    got = {(r["src_conv"], r["dst_conv"], r["status"]) for r in out.collect()}
    # at t_old only c1->c2 exists; at t_new all three distinct edges exist
    assert got == {("c1", "c3", "added"), ("c2", "c3", "added")}


# ------------------------------------------------------ stratified sample


def test_stratified_sample_quota_and_determinism(spark):
    rows = [(f"d{i}", "big" if i < 80 else "small") for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id string, g string")
    out1 = stratified_sample(df, "g", 7, ("doc_id",), seed=5)
    out2 = stratified_sample(df, "g", 7, ("doc_id",), seed=5)
    got1 = sorted((r["g"], r["doc_id"]) for r in out1.collect())
    got2 = sorted((r["g"], r["doc_id"]) for r in out2.collect())
    assert got1 == got2  # deterministic
    from collections import Counter
    c = Counter(g for g, _ in got1)
    assert c == {"big": 7, "small": 7}
    # different seed -> (almost surely) different draw from the big stratum
    out3 = stratified_sample(df, "g", 7, ("doc_id",), seed=6)
    got3 = sorted((r["g"], r["doc_id"]) for r in out3.collect())
    assert got3 != got1


def test_stratified_sample_small_groups_kept_whole(spark):
    df = spark.createDataFrame([("x", "g1"), ("y", "g2")], "id string, g string")
    out = stratified_sample(df, "g", 10, ("id",))
    assert sorted(r["id"] for r in out.collect()) == ["x", "y"]


# ---------------------------------------------------------------------------
# decontaminate
# ---------------------------------------------------------------------------


def test_decontaminate_flags_only_ngram_overlap(spark):
    from halvesting_geometric_spark.operators.dedup import decontaminate

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "a completely different sentence with no overlap at all"),
            (3, "I saw the quick brown fox yesterday evening"),
            (4, "quick brown unrelated fox"),  # shares words, not a 3-gram
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "watch the quick brown fox run")], "doc_id long, text string"
    )
    got = {
        r["id"]: (r["hits"], r["contaminated"])
        for r in decontaminate(docs, bench, n=3).collect()
    }
    # doc1: 'the quick brown' + 'quick brown fox' = 2 hits; doc3 same 2
    assert got[1] == (2, True)
    assert got[3] == (2, True)
    assert got[2] == (0, False)
    assert got[4] == (0, False)


def test_decontaminate_min_hits_threshold(spark):
    from halvesting_geometric_spark.operators.dedup import decontaminate

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma epsilon zeta")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(9, "alpha beta gamma delta")], "doc_id long, text string"
    )
    got = {
        r["id"]: r["contaminated"]
        for r in decontaminate(docs, bench, n=2, min_hits=3).collect()
    }
    # doc1 shares 3 bigrams -> contaminated; doc2 shares 2 -> clean
    assert got == {1: True, 2: False}


def test_decontaminate_shuffle_path_matches_broadcast(spark):
    from halvesting_geometric_spark.operators.dedup import decontaminate

    docs = spark.createDataFrame(
        [(i, f"w{i} w{i+1} w{i+2} w{i+3} shared tail phrase") for i in range(20)],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(0, "shared tail phrase")], "doc_id long, text string"
    )
    a = sorted(map(tuple, decontaminate(docs, bench, n=3).collect()))
    b = sorted(
        map(
            tuple,
            decontaminate(
                docs, bench, n=3, broadcast_benchmark=False
            ).collect(),
        )
    )
    assert a == b and all(r[2] for r in a)


# ---------------------------------------------------------------------------
# dedup_lines
# ---------------------------------------------------------------------------


def test_dedup_lines_removes_corpus_boilerplate(spark):
    from halvesting_geometric_spark.operators.dedup import dedup_lines

    boiler = "all rights reserved"
    docs = spark.createDataFrame(
        [
            (1, f"alpha one\n{boiler}\nbody text A"),
            (2, f"{boiler}\nbody text B"),
            (3, f"body text C\n{boiler}"),
            (4, "unique doc with no boilerplate"),
        ],
        "doc_id long, text string",
    )
    got = {
        r["id"]: (r["text"], r["n_lines"], r["n_removed"])
        for r in dedup_lines(docs, max_occurrences=2).collect()
    }
    assert got[1] == ("alpha one\nbody text A", 2, 1)
    assert got[2] == ("body text B", 1, 1)
    assert got[3] == ("body text C", 1, 1)
    assert got[4] == ("unique doc with no boilerplate", 1, 0)


def test_dedup_lines_preserves_order_and_empty_lines(spark):
    from halvesting_geometric_spark.operators.dedup import dedup_lines

    docs = spark.createDataFrame(
        [(1, "z last\n\na first\n\nz last again")],
        "doc_id long, text string",
    )
    got = dedup_lines(docs, max_occurrences=5).first()
    assert got["text"] == "z last\n\na first\n\nz last again"
    assert got["n_removed"] == 0


def test_dedup_lines_normalization_folds_case(spark):
    from halvesting_geometric_spark.operators.dedup import dedup_lines

    docs = spark.createDataFrame(
        [(1, "Click Here\nkeep me"), (2, "  click here  \nother")],
        "doc_id long, text string",
    )
    got = {
        r["id"]: r["text"]
        for r in dedup_lines(docs, max_occurrences=1).collect()
    }
    assert got == {1: "keep me", 2: "other"}
    raw = {
        r["id"]: r["n_removed"]
        for r in dedup_lines(docs, max_occurrences=1, normalize=False).collect()
    }
    assert raw == {1: 0, 2: 0}


def test_dedup_lines_fully_boilerplate_doc_becomes_empty(spark):
    from halvesting_geometric_spark.operators.dedup import dedup_lines

    docs = spark.createDataFrame(
        [(i, "same line") for i in range(5)], "doc_id long, text string"
    )
    rows = dedup_lines(docs, max_occurrences=3).collect()
    assert all(r["text"] == "" and r["n_lines"] == 0 and r["n_removed"] == 1
               for r in rows)
