"""PPR-Nibble sweep cut (localcluster.ppr_sweep): planted two-clique graph."""

import pytest

from halvesting_geometric_spark.operators.localcluster import ppr_sweep


def _two_cliques(spark):
    # K4 {0,1,2,3} + K4 {4,5,6,7} joined by the single bridge (3,4)
    und = []
    for grp in ([0, 1, 2, 3], [4, 5, 6, 7]):
        for i in grp:
            for j in grp:
                if i < j:
                    und.append((i, j))
    und.append((3, 4))
    both = und + [(b, a) for a, b in und]
    edges = spark.createDataFrame(both, "src long, dst long")
    verts = spark.createDataFrame([(i,) for i in range(8)], "vertex_id long")
    return edges, verts


def test_ppr_sweep_finds_planted_clique(spark):
    edges, verts = _two_cliques(spark)
    prof = ppr_sweep(edges, verts, seeds=[0], fixed_iters=5, k=8)
    rows = {r["pos"]: r for r in prof.collect()}
    assert set(rows) == set(range(1, 9))
    # the first four admitted vertices are exactly the seed's clique
    assert {rows[p]["vertex_id"] for p in range(1, 5)} == {0, 1, 2, 3}
    r4 = rows[4]
    # vol = deg sum 3+3+3+4, cut = the single bridge, phi = 1/13
    assert (r4["vol"], r4["cut"]) == (13, 1)
    assert r4["phi_e6"] == 76923  # floor(1e6/13 + 0.5)
    # the planted community is the sweep's conductance minimum among
    # proper prefixes (the full graph reports phi 0 by the 0-denominator
    # convention and is not a candidate community)
    proper = [r for r in rows.values() if 0 < r["vol"] < 2 * 13]
    assert min(proper, key=lambda r: (r["phi_e6"], r["pos"]))["pos"] == 4
    # full-graph prefix: cut 0, phi 0 (denominator min(vol, 2m-vol) = 0)
    r8 = rows[8]
    assert (r8["cut"], r8["phi_e6"]) == (0, 0)
    assert r8["vol"] == 2 * 13  # 2m


def test_ppr_sweep_monotone_vol_and_cut_consistency(spark):
    edges, verts = _two_cliques(spark)
    prof = ppr_sweep(edges, verts, seeds=[0, 4], fixed_iters=4, k=8)
    rows = sorted(prof.collect(), key=lambda r: r["pos"])
    vols = [r["vol"] for r in rows]
    assert vols == sorted(vols) and all(r["cut"] >= 0 for r in rows)


def test_ppr_sweep_validates_k(spark):
    edges, verts = _two_cliques(spark)
    with pytest.raises(ValueError, match="k must be"):
        ppr_sweep(edges, verts, seeds=[0], k=0)
    with pytest.raises(ValueError, match="k must be"):
        ppr_sweep(edges, verts, seeds=[0], k=5000)
