"""Configuration-model rewiring: degree preservation + portable-hash twin."""

from __future__ import annotations

import hashlib
import random
from collections import Counter, defaultdict

from halvesting_geometric_spark.operators.nullmodel import configuration_model


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def _multigraph(seed, n=30, m=120):
    rng = random.Random(seed)
    return [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]


def test_degree_sequences_preserved(spark):
    pairs = _multigraph(1)
    out = configuration_model(_edges_df(spark, pairs), seed=7).collect()
    assert len(out) == len(pairs)
    assert Counter(a for a, _ in pairs) == Counter(r.src for r in out)
    assert Counter(b for _, b in pairs) == Counter(r.dst for r in out)


def test_seed_determinism_and_variation(spark):
    pairs = _multigraph(2)
    e = _edges_df(spark, pairs)
    r1 = Counter((r.src, r.dst) for r in configuration_model(e, seed=7).collect())
    r2 = Counter((r.src, r.dst) for r in configuration_model(e, seed=7).collect())
    r3 = Counter((r.src, r.dst) for r in configuration_model(e, seed=8).collect())
    assert r1 == r2
    assert r1 != r3  # a different seed rewires differently


def _ph(parts, seed):
    s = "\x1f".join(str(p) for p in parts) + "\x1f" + str(seed)
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _python_config_model(pairs, seed):
    occ_ctr: dict[tuple[int, int], int] = defaultdict(int)
    rows = []
    for a, b in pairs:
        occ_ctr[(a, b)] += 1
        rows.append((a, b, occ_ctr[(a, b)]))
    ss = sorted(rows, key=lambda r: (_ph(r, seed * 2), r))
    ds = sorted(rows, key=lambda r: (_ph(r, seed * 2 + 1), r))
    return Counter((s[0], d[1]) for s, d in zip(ss, ds))


def test_portable_vs_python_twin(spark):
    pairs = _multigraph(3)
    got = Counter(
        (r.src, r.dst)
        for r in configuration_model(
            _edges_df(spark, pairs), seed=11, hash_method="portable"
        ).collect()
    )
    assert got == _python_config_model(pairs, 11)


def test_partitioning_invariance(spark):
    pairs = _multigraph(4)
    e = _edges_df(spark, pairs)
    a = Counter(
        (r.src, r.dst)
        for r in configuration_model(
            e, seed=5, hash_method="portable", num_partitions=2
        ).collect()
    )
    b = Counter(
        (r.src, r.dst)
        for r in configuration_model(
            e.repartition(13), seed=5, hash_method="portable", num_partitions=64
        ).collect()
    )
    assert a == b
