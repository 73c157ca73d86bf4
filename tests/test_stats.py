from __future__ import annotations

import collections
import math

import numpy as np
import pytest

from halvesting_geometric_spark.operators.stats import (
    chi2_independence,
    mann_whitney_u,
    two_sample_ks,
    welch_ttest,
)


@pytest.fixture(scope="module")
def two_groups(spark):
    rng = np.random.RandomState(7)
    xa = rng.randint(0, 50, 400)
    xb = rng.randint(5, 60, 300)
    rows = [(int(v), "A") for v in xa] + [(int(v), "B") for v in xb]
    return spark.createDataFrame(rows, "v int, g string"), xa, xb


@pytest.mark.parametrize("scalable", [False, True])
def test_ks_matches_bruteforce(two_groups, scalable):
    df, xa, xb = two_groups
    vals = np.unique(np.concatenate([xa, xb]))
    fa = np.searchsorted(np.sort(xa), vals, side="right") / len(xa)
    fb = np.searchsorted(np.sort(xb), vals, side="right") / len(xb)
    d_true = float(np.abs(fa - fb).max())
    r = two_sample_ks(df, "v", "g", "A", "B", scalable=scalable).first()
    assert r.d_e6 == math.floor(d_true * 1e6 + 0.5)
    assert (r.n_a, r.n_b) == (400, 300)


def test_ks_identical_distributions(spark):
    rows = [(i % 10, g) for i in range(100) for g in ("A", "B")]
    df = spark.createDataFrame(rows, "v int, g string")
    assert two_sample_ks(df, "v", "g", "A", "B").first().d_e6 == 0


@pytest.mark.parametrize("scalable", [False, True])
def test_mwu_matches_bruteforce(two_groups, scalable):
    df, xa, xb = two_groups
    pooled = np.concatenate([xa, xb])
    order = np.argsort(pooled, kind="mergesort")
    ranks = np.empty(len(pooled))
    sp = pooled[order]
    i = 0
    while i < len(sp):
        j = i
        while j < len(sp) and sp[j] == sp[i]:
            j += 1
        ranks[order[i:j]] = (i + 1 + j) / 2.0
        i = j
    na, nb = len(xa), len(xb)
    n = na + nb
    ua = ranks[:na].sum() - na * (na + 1) / 2
    _, cnts = np.unique(pooled, return_counts=True)
    ties = float((cnts.astype(float) ** 3 - cnts).sum())
    var = na * nb / 12.0 * ((n + 1) - ties / (n * (n - 1)))
    z = (ua - na * nb / 2.0) / math.sqrt(var)
    r = mann_whitney_u(df, "v", "g", "A", "B", scalable=scalable).first()
    assert r.u2_a == int(round(2 * ua))
    assert r.z_e6 == math.floor(z * 1e6 + 0.5)


def test_mwu_auroc_identity(two_groups):
    # U_a / (n_a * n_b) == P(a > b) + 0.5 P(a == b): the AUROC identity.
    df, xa, xb = two_groups
    r = mann_whitney_u(df, "v", "g", "A", "B").first()
    wins = (xa[:, None] > xb[None, :]).sum()
    ties = (xa[:, None] == xb[None, :]).sum()
    assert r.u2_a == 2 * wins + ties


def test_chi2_matches_bruteforce(spark):
    rng = np.random.RandomState(11)
    ca = rng.choice(["x", "y", "z"], 500)
    cb = rng.choice(["p", "q"], 500)
    df = spark.createDataFrame(
        list(zip(ca.tolist(), cb.tolist())), "a string, b string"
    )
    obs = collections.Counter(zip(ca, cb))
    ra = collections.Counter(ca)
    cm = collections.Counter(cb)
    n = 500
    tot = 0
    for av in ra:
        for bv in cm:
            o = obs.get((av, bv), 0)
            num = (o * n - ra[av] * cm[bv]) ** 2
            tot += math.floor(float(num) / float(n * ra[av] * cm[bv]) * 1e6 + 0.5)
    r = chi2_independence(df, "a", "b").first()
    assert r.chi2_e6 == tot
    assert r.dof == (len(ra) - 1) * (len(cm) - 1)
    assert r.n == n


def test_chi2_zero_cells_counted(spark):
    # (x, q) never observed: the grid must still include its expected mass.
    rows = [("x", "p")] * 30 + [("y", "p")] * 10 + [("y", "q")] * 20
    df = spark.createDataFrame(rows, "a string, b string")
    r = chi2_independence(df, "a", "b").first()
    # brute force including the zero cell
    tot = 0
    margins_a = {"x": 30, "y": 30}
    margins_b = {"p": 40, "q": 20}
    obs = {("x", "p"): 30, ("y", "p"): 10, ("y", "q"): 20}
    for av, rv in margins_a.items():
        for bv, cv in margins_b.items():
            o = obs.get((av, bv), 0)
            tot += math.floor(
                float((o * 60 - rv * cv) ** 2) / float(60 * rv * cv) * 1e6 + 0.5
            )
    assert r.chi2_e6 == tot
    assert r.dof == 1


def test_welch_matches_bruteforce(two_groups):
    df, xa, xb = two_groups
    na, nb = len(xa), len(xb)
    va, vb = xa.var(ddof=1), xb.var(ddof=1)
    t = (xa.mean() - xb.mean()) / math.sqrt(va / na + vb / nb)
    dof = (va / na + vb / nb) ** 2 / (
        (va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1)
    )
    r = welch_ttest(df, "v", "g", "A", "B").first()
    assert abs(r.t_e6 - math.floor(t * 1e6 + 0.5)) <= 1
    assert abs(r.dof_e6 - math.floor(dof * 1e6 + 0.5)) <= 1
    assert r.mean_a_e6 == math.floor(xa.mean() * 1e6 + 0.5)


def test_welch_symmetric_sign(two_groups):
    df, _, _ = two_groups
    fwd = welch_ttest(df, "v", "g", "A", "B").first()
    rev = welch_ttest(df, "v", "g", "B", "A").first()
    assert fwd.t_e6 == -rev.t_e6 or abs(fwd.t_e6 + rev.t_e6) <= 1
    assert fwd.dof_e6 == rev.dof_e6


def test_powerlaw_alpha_bruteforce(spark):
    from halvesting_geometric_spark.operators.metrics import powerlaw_alpha

    rng = np.random.RandomState(3)
    # discrete power-law-ish degrees via inverse transform
    deg = np.clip((1.0 / rng.uniform(0.001, 1.0, 2000)).astype(int), 1, None)
    df = spark.createDataFrame([(int(d),) for d in deg], "value int")
    hist = collections.Counter(int(d) for d in deg)
    s = sum(
        c * math.floor(math.log(x / 0.5) * 1e9 + 0.5)
        for x, c in hist.items()
    )
    n = float(len(deg))
    alpha = 1 + n / (float(s) / 1e9)
    sigma = (alpha - 1) / math.sqrt(n)
    r = powerlaw_alpha(df, "value", xmin=1).first()
    assert r.alpha_e6 == math.floor(alpha * 1e6 + 0.5)
    assert r.sigma_e6 == math.floor(sigma * 1e6 + 0.5)
    assert r.n_tail == 2000


def test_powerlaw_alpha_xmin_filters_tail(spark):
    from halvesting_geometric_spark.operators.metrics import powerlaw_alpha

    df = spark.createDataFrame(
        [(1,)] * 50 + [(5,)] * 10 + [(50,)] * 2, "value int"
    )
    r = powerlaw_alpha(df, "value", xmin=5).first()
    assert r.n_tail == 12 and r.xmin == 5


def test_bootstrap_mean_ci_matches_bruteforce(spark):
    import hashlib

    from halvesting_geometric_spark.operators.stats import (
        POISSON_CUM60,
        bootstrap_mean_ci,
    )

    rows = [(i, "g%d" % (i % 2), (i * 37) % 100) for i in range(1000)]
    df = spark.createDataFrame(rows, "rid long, grp string, v int")

    def phash(*vals):
        s = "\x1f".join(str(v) for v in vals)
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    reps = 32
    acc: dict = collections.defaultdict(lambda: [0, 0])
    for rid, grp, v in rows:
        for r in range(reps):
            u = phash(rid, r)
            w = sum(1 for t in POISSON_CUM60 if u >= t)
            acc[(grp, r)][0] += v * w
            acc[(grp, r)][1] += w
    means: dict = collections.defaultdict(list)
    for (grp, r), (swx, sw) in acc.items():
        if sw > 0:
            means[grp].append(float(swx) / float(sw))
    want = {}
    for grp, ms in means.items():
        ms.sort()
        b = len(ms)
        lo = ms[int(math.floor(b * 0.025))]
        hi = ms[int(math.ceil(b * 0.975)) - 1]
        xs = [v for _, g, v in rows if g == grp]
        want[grp] = (
            math.floor(sum(xs) / len(xs) * 1e6 + 0.5),
            math.floor(lo * 1e6 + 0.5),
            math.floor(hi * 1e6 + 0.5),
            len(xs),
        )
    got = {
        r.grp: (r.mean_e6, r.lo_e6, r.hi_e6, r.n)
        for r in bootstrap_mean_ci(
            df,
            "v",
            ("rid",),
            ("grp",),
            replicates=reps,
            hash_method="portable",
        ).collect()
    }
    assert got == want
    for _, (m, lo, hi, _n) in got.items():
        assert lo < m < hi


def test_bootstrap_ci_narrows_with_n(spark):
    from halvesting_geometric_spark.operators.stats import (
        bootstrap_mean_ci,
    )

    small = spark.createDataFrame(
        [(i, (i * 13) % 50) for i in range(100)], "rid long, v int"
    )
    big = spark.createDataFrame(
        [(i, (i * 13) % 50) for i in range(10_000)], "rid long, v int"
    )
    rs = bootstrap_mean_ci(small, "v", ("rid",), replicates=32).first()
    rb = bootstrap_mean_ci(big, "v", ("rid",), replicates=32).first()
    assert (rb.hi_e6 - rb.lo_e6) < (rs.hi_e6 - rs.lo_e6)


def test_bootstrap_mean_ci_ignores_null_values(spark):
    from halvesting_geometric_spark.operators.stats import (
        bootstrap_mean_ci,
    )

    rows = [(i, (i % 7) + 1) for i in range(200)]
    clean = spark.createDataFrame(rows, "rid long, v long")
    dirty = clean.unionByName(
        spark.createDataFrame(
            [(1000 + i, None) for i in range(50)], "rid long, v long"
        )
    )
    # NULL rows carry the same ids in both inputs' hash space? No — the
    # NULL rows have distinct ids, so after filtering they vanish and the
    # resampled population is identical to the clean input's.
    a = bootstrap_mean_ci(clean, "v", ("rid",), replicates=32).first()
    b = bootstrap_mean_ci(dirty, "v", ("rid",), replicates=32).first()
    assert (a.mean_e6, a.lo_e6, a.hi_e6, a.n) == (
        b.mean_e6,
        b.lo_e6,
        b.hi_e6,
        b.n,
    )
