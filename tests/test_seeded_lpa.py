"""Seeded (clamped) label propagation for semi-supervised classification."""

from __future__ import annotations

import random
from collections import defaultdict

import pytest

from halvesting_geometric_spark.operators.labelprop import (
    seeded_label_propagation,
)


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def _seeds_df(spark, seeds):
    return spark.createDataFrame(
        [(int(v), int(l)) for v, l in seeds.items()], "vertex_id long, label long"
    )


def test_path_spread_and_tie(spark):
    pairs = [(0, 1), (1, 2), (2, 3), (3, 4)]
    out = {
        r.vertex_id: (r.label, r.is_seed)
        for r in seeded_label_propagation(
            _edges_df(spark, pairs), _seeds_df(spark, {0: 10, 4: 20}), rounds=2
        ).collect()
    }
    assert out[0] == (10, True)
    assert out[4] == (20, True)
    assert out[1] == (10, False)
    assert out[3] == (20, False)
    # the middle vertex hears 10 and 20 with equal counts: min label wins
    assert out[2] == (10, False)


def test_seed_clamped_against_majority(spark):
    # seed 0 labeled 99, every neighbor labeled 1: seed must not flip
    pairs = [(0, i) for i in range(1, 5)]
    seeds = {0: 99, 1: 1, 2: 1, 3: 1, 4: 1}
    out = {
        r.vertex_id: r.label
        for r in seeded_label_propagation(
            _edges_df(spark, pairs), _seeds_df(spark, seeds), rounds=3
        ).collect()
    }
    assert out[0] == 99


def test_unreachable_stays_null(spark):
    pairs = [(0, 1), (5, 6)]  # component {5,6} has no seed
    out = {
        r.vertex_id: r.label
        for r in seeded_label_propagation(
            _edges_df(spark, pairs), _seeds_df(spark, {0: 3}), rounds=4
        ).collect()
    }
    assert out[5] is None and out[6] is None
    assert out[1] == 3


def test_rounds_validation(spark):
    with pytest.raises(ValueError):
        seeded_label_propagation(
            _edges_df(spark, [(0, 1)]), _seeds_df(spark, {0: 1}), rounds=0
        )


def _python_sslp(pairs, seeds, rounds):
    adj = defaultdict(set)
    verts = set(seeds)
    for a, b in pairs:
        if a == b:
            continue
        adj[a].add(b)
        adj[b].add(a)
        verts |= {a, b}
    lab = {v: seeds.get(v) for v in verts}
    for _ in range(rounds):
        new = {}
        for v in verts:
            if v in seeds:
                new[v] = seeds[v]
                continue
            cnt = defaultdict(int)
            for o in adj[v]:
                if lab[o] is not None:
                    cnt[lab[o]] += 1
            if cnt:
                best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
                new[v] = best[0]
            else:
                new[v] = lab[v]
        lab = new
    return lab


def test_random_vs_python_twin(spark):
    rng = random.Random(31)
    pairs = list({(rng.randrange(40), rng.randrange(40)) for _ in range(120)})
    pairs = [(a, b) for a, b in pairs if a != b]
    seeds = {v: v % 5 for v in range(40) if v % 7 == 0}
    want = _python_sslp(pairs, seeds, 4)
    got = {
        r.vertex_id: r.label
        for r in seeded_label_propagation(
            _edges_df(spark, pairs), _seeds_df(spark, seeds), rounds=4
        ).collect()
    }
    assert got == want


def test_conflicting_seed_rows_take_min_label(spark):
    seeds = spark.createDataFrame(
        [(0, 7), (0, 2), (0, 9)], "vertex_id long, label long"
    )
    out = {
        r.vertex_id: r.label
        for r in seeded_label_propagation(
            _edges_df(spark, [(0, 1)]), seeds, rounds=1
        ).collect()
    }
    assert out[0] == 2
    assert out[1] == 2
