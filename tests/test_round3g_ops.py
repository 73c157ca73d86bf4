"""Round-3g batch #2: frequent sequences, time-respecting reachability,
structural holes — each against a brute-force pure-Python twin."""

from __future__ import annotations

from itertools import product

import pytest

from halvesting_geometric_spark.operators.behavior import frequent_sequences
from halvesting_geometric_spark.operators.structural import structural_holes
from halvesting_geometric_spark.operators.temporal import (
    temporal_reachability,
)

_E12 = 1_000_000_000_000


# ------------------------------------------------------- frequent sequences


def _seq_df(spark, sessions):
    rows = [
        (sid, i, item)
        for sid, items in sessions.items()
        for i, item in enumerate(items)
    ]
    return spark.createDataFrame(rows, "conv_id string, turn_idx long, role string")


def _brute_support(sessions, pattern):
    """#sessions containing pattern as a (gap-allowed) subsequence."""

    def contains(seq, pat):
        i = 0
        for x in seq:
            if x == pat[i]:
                i += 1
                if i == len(pat):
                    return True
        return False

    return sum(1 for s in sessions.values() if contains(s, pattern))


def test_frequent_sequences_matches_bruteforce(spark):
    sessions = {
        "c1": ["u", "a", "t", "a", "u", "a"],
        "c2": ["u", "a", "u", "a"],
        "c3": ["a", "t", "t", "u"],
        "c4": ["u", "u"],
        "c5": ["t"],
    }
    got = {
        (r["pattern"], r["length"]): r["support"]
        for r in frequent_sequences(
            _seq_df(spark, sessions), min_support=1, max_len=3
        ).collect()
    }
    vocab = ["u", "a", "t"]
    want = {}
    for pat in product(vocab, repeat=2):
        s = _brute_support(sessions, pat)
        if s >= 1:
            want[(">".join(pat), 2)] = s
    for pat in product(vocab, repeat=3):
        s = _brute_support(sessions, pat)
        if s >= 1:
            want[(">".join(pat), 3)] = s
    assert got == want


def test_frequent_sequences_min_support_prunes(spark):
    sessions = {"c1": ["a", "b"], "c2": ["a", "b"], "c3": ["b", "a"]}
    out = frequent_sequences(
        _seq_df(spark, sessions), min_support=2, max_len=2
    ).collect()
    got = {r["pattern"]: r["support"] for r in out}
    assert got == {"a>b": 2}


def test_frequent_sequences_validates_args(spark):
    df = _seq_df(spark, {"c": ["a"]})
    with pytest.raises(ValueError):
        frequent_sequences(df, min_support=0)
    with pytest.raises(ValueError):
        frequent_sequences(df, max_len=4)


def test_frequent_sequences_vocab_guard(spark):
    # 5 distinct items: blocked at max_vocab=4, allowed at 5 or None —
    # the len-3 join is |occ|*|V|^2 per session, so high-cardinality item
    # columns must be an explicit opt-in.
    sessions = {"c": ["a", "b", "cc", "d", "e"]}
    df = _seq_df(spark, sessions)
    with pytest.raises(ValueError, match="max_vocab"):
        frequent_sequences(df, max_vocab=4)
    assert frequent_sequences(df, max_len=2, max_vocab=5).count() > 0
    assert frequent_sequences(df, max_len=2, max_vocab=None).count() > 0


# ------------------------------------------------- temporal reachability


def _tedges(spark, triples):
    return spark.createDataFrame(triples, "src long, dst long, t long")


def _verts(spark, ids):
    return spark.createDataFrame([(int(i),) for i in ids], "vertex_id long")


def _brute_earliest(triples, seeds, start):
    """Label-correcting fixpoint on the edge-occurrence list."""
    arr = {s: start for s in seeds}
    changed = True
    while changed:
        changed = False
        for s, d, t in triples:
            if s == d or t < start:
                continue
            if s in arr and t >= arr[s] and t < arr.get(d, float("inf")):
                arr[d] = t
                changed = True
    return arr


def test_temporal_reachability_matches_bruteforce(spark):
    # 0 -(5)-> 1 -(3)-> 2 is NOT time-respecting (3 < 5); 1 -(7)-> 2 is.
    # 3 reachable only via the late edge 2 -(9)-> 3; 4 isolated.
    triples = [
        (0, 1, 5),
        (1, 2, 3),
        (1, 2, 7),
        (2, 3, 9),
        (3, 0, 1),
        (0, 0, 2),
    ]
    got = {
        r["vertex_id"]: r["arrival"]
        for r in temporal_reachability(
            _tedges(spark, triples), _verts(spark, range(5)), [0], start=0
        ).collect()
    }
    assert got == _brute_earliest(triples, [0], 0)
    assert 4 not in got and got[2] == 7 and got[3] == 9


def test_temporal_reachability_start_filters_old_edges(spark):
    triples = [(0, 1, 5), (1, 2, 7)]
    got = {
        r["vertex_id"]: r["arrival"]
        for r in temporal_reachability(
            _tedges(spark, triples), _verts(spark, range(3)), [0], start=6
        ).collect()
    }
    # the 0->1 edge at t=5 predates start=6, so nothing beyond the seed
    assert got == {0: 6}


def test_temporal_reachability_time_bands_match_global(spark):
    # correction chain: 2 first arrives at 10 (direct), later improves to 2
    # via 1, which re-opens the (2,3,t=5) edge — the banded pass must get
    # the same fixpoint while exhausting each time band exactly once
    triples = [(0, 2, 10), (0, 1, 1), (1, 2, 2), (2, 3, 5)]
    want = _brute_earliest(triples, [0], 0)
    for b in (1, 2, 4, 16):
        got = {
            r["vertex_id"]: r["arrival"]
            for r in temporal_reachability(
                _tedges(spark, triples),
                _verts(spark, range(4)),
                [0],
                start=0,
                time_buckets=b,
            ).collect()
        }
        assert got == want, f"time_buckets={b}"
    assert want == {0: 0, 1: 1, 2: 2, 3: 5}


def test_temporal_reachability_bands_bound_rounds(spark):
    # 6-hop chain, one edge per band: per-band fixpoint needs only 2
    # rounds (1 relax + 1 empty-confirm), so max_rounds=2 succeeds banded
    # while the global pass needs 7 and raises at the same cap
    triples = [(i, i + 1, i + 1) for i in range(6)]
    got = {
        r["vertex_id"]: r["arrival"]
        for r in temporal_reachability(
            _tedges(spark, triples),
            _verts(spark, range(7)),
            [0],
            max_rounds=2,
            time_buckets=6,
        ).collect()
    }
    assert got == _brute_earliest(triples, [0], 0)
    with pytest.raises(RuntimeError):
        temporal_reachability(
            _tedges(spark, triples),
            _verts(spark, range(7)),
            [0],
            max_rounds=2,
        )


def test_temporal_reachability_raises_on_truncation(spark):
    # 3-hop chain cannot converge in 1 superstep
    triples = [(0, 1, 1), (1, 2, 2), (2, 3, 3)]
    with pytest.raises(RuntimeError):
        temporal_reachability(
            _tedges(spark, triples),
            _verts(spark, range(4)),
            [0],
            max_rounds=1,
        )
    with pytest.raises(ValueError):
        temporal_reachability(
            _tedges(spark, triples), _verts(spark, range(4)), []
        )


# ------------------------------------------------------- structural holes


def _brute_holes(und_edges):
    """Integer-quantized Burt constraint / Borgatti effective size twin."""
    nbrs: dict[int, set[int]] = {}
    for a, b in und_edges:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    out = {}
    for i, ni in nbrs.items():
        di = len(ni)
        constraint = 0
        tri2 = 0
        for j in ni:
            s_e12 = 0
            for q in ni & nbrs[j]:
                s_e12 += _E12 // (di * len(nbrs[q]))
                tri2 += 1
            c_e6 = (_E12 // di + s_e12) // 1_000_000
            constraint += c_e6 * c_e6
        out[i] = (di, constraint, di * 1_000_000 - (tri2 * 1_000_000) // di)
    return out


def test_structural_holes_matches_bruteforce(spark):
    # kite-ish graph: a 4-clique {0,1,2,3} with pendant 4-5 path off 3
    und = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 4), (4, 5)]
    e = spark.createDataFrame(und, "src long, dst long")
    got = {
        r["vertex_id"]: (r["degree"], r["constraint_e12"], r["effsize_e6"])
        for r in structural_holes(e, max_degree=None).collect()
    }
    assert got == _brute_holes(und)
    # broker 4 spans the hole between the clique and 5: lowest constraint
    deep_clique = got[0][1]
    assert got[4][1] < deep_clique


def test_structural_holes_cap_drops_hub_centers(spark):
    # star center 0 (deg 4) + ring among leaves; cap=2 removes every wedge
    # whose CENTER has degree > 2 — constraint falls back to the direct term
    und = [(0, i) for i in range(1, 5)] + [(1, 2)]
    e = spark.createDataFrame(und, "src long, dst long")
    exact = {
        r["vertex_id"]: r["constraint_e12"]
        for r in structural_holes(e, max_degree=None).collect()
    }
    capped = {
        r["vertex_id"]: r["constraint_e12"]
        for r in structural_holes(e, max_degree=2).collect()
    }
    assert set(capped) == set(exact)
    # capped is a lower bound, and strictly lower where a deg-4 center
    # (vertex 0) mediated an indirect path: dyad (1,2) loses its 0-term
    assert all(capped[v] <= exact[v] for v in exact)
    assert capped[1] < exact[1] and capped[2] < exact[2]


# ------------------------------------------------------- sequence packing


def _brute_pack(lengths, L):
    """(id, n, bin, bin_off, len_in_bin, doc_off) via literal replay."""
    out, pos = [], 0
    for i, n in sorted(lengths.items()):
        doc_pos = 0
        while doc_pos < n:
            b = pos // L
            take = min(n - doc_pos, (b + 1) * L - pos)
            out.append((i, n, b, pos - b * L, take, doc_pos))
            pos += take
            doc_pos += take
    return sorted(out)


def test_pack_sequences_matches_bruteforce(spark):
    from halvesting_geometric_spark.operators.mixing import pack_sequences

    lengths = {0: 7, 1: 3, 2: 12, 3: 1, 4: 5, 5: 10, 6: 2}
    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n)) for i, n in lengths.items()],
        "doc_id long, text string",
    )
    want = _brute_pack(lengths, 5)
    for scalable in (False, True):
        got = sorted(
            tuple(r) for r in pack_sequences(
                docs, bin_size=5, scalable=scalable, buckets=4
            ).collect()
        )
        assert got == want, f"scalable={scalable}"
    # invariants: every bin except the last is exactly full; per-doc
    # spans cover the document contiguously
    import collections

    per_bin = collections.Counter()
    for _, _, b, _, ln, _ in want:
        per_bin[b] += ln
    last = max(per_bin)
    assert all(v == 5 for b, v in per_bin.items() if b != last)
    per_doc = collections.defaultdict(int)
    for i, n, _, _, ln, _ in want:
        per_doc[i] += ln
    assert per_doc == lengths


def test_pack_sequences_drops_empty_and_validates(spark):
    from halvesting_geometric_spark.operators.mixing import pack_sequences

    docs = spark.createDataFrame(
        [(0, "a b c"), (1, "   "), (2, "")], "doc_id long, text string"
    )
    got = pack_sequences(docs, bin_size=2).collect()
    assert sorted(r["doc_id"] for r in got) == [0, 0]
    with pytest.raises(ValueError):
        pack_sequences(docs, bin_size=0)


# -------------------------------------------------------- feature hashing


def _phash(s, seed=None):
    import hashlib

    parts = [s] + ([str(seed)] if seed is not None else [])
    payload = chr(31).join(parts).encode()
    return int(hashlib.md5(payload).hexdigest()[:15], 16)


def test_hashing_tf_matches_hash_replica(spark):
    from collections import defaultdict

    from halvesting_geometric_spark.operators.bm25 import hashing_tf

    texts = {0: "a b a c", 1: "b b", 2: "  ", 3: "c"}
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got = sorted(
        tuple(r) for r in hashing_tf(
            docs, num_features=8, signed=True, seed=0
        ).collect()
    )
    want = defaultdict(int)
    for i, t in texts.items():
        for tok in t.split():
            f = _phash(tok, seed=0) % 8
            s = 1 if _phash(tok, seed=1) % 2 == 0 else -1
            want[(i, f)] += s
    assert got == sorted(
        (i, f, v) for (i, f), v in want.items() if v != 0
    )


def test_hashing_tf_unsigned_counts(spark):
    from halvesting_geometric_spark.operators.bm25 import hashing_tf
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(0, "x y x"), (1, "y")], "doc_id long, text string"
    )
    out = hashing_tf(docs, num_features=4, signed=False)
    # unsigned values are raw occurrence counts: totals match token counts
    assert out.agg(F.sum("value")).first()[0] == 4
    assert all(r["value"] >= 1 for r in out.collect())
    import pytest as _pytest

    with _pytest.raises(ValueError):
        hashing_tf(docs, num_features=0)
