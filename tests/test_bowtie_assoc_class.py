"""Round-3g batch: bow-tie decomposition, association rules, classification
report — each against a hand-computed or pure-Python twin."""

from __future__ import annotations

from collections import Counter

from halvesting_geometric_spark.operators.behavior import association_rules
from halvesting_geometric_spark.operators.bowtie import bowtie_decomposition
from halvesting_geometric_spark.operators.evalmetrics import (
    classification_report,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _verts(spark, ids):
    return spark.createDataFrame([(int(i),) for i in ids], "vertex_id long")


# ------------------------------------------------------------------ bow-tie


def test_bowtie_classes(spark):
    # core cycle {1,2,3}; 0 and 5 feed it (IN); 4 drains it (OUT);
    # 6 hangs off the IN side (TENDRIL); {7,8} live elsewhere.
    e = _edges(
        spark,
        [(1, 2), (2, 3), (3, 1), (0, 1), (5, 0), (3, 4), (0, 6), (7, 8)],
    )
    v = _verts(spark, range(9))
    out = {
        r["vertex_id"]: r["bowtie_class"]
        for r in bowtie_decomposition(e, v).collect()
    }
    assert out == {
        0: "IN",
        1: "CORE",
        2: "CORE",
        3: "CORE",
        4: "OUT",
        5: "IN",
        6: "TENDRIL",
        7: "DISCONNECTED",
        8: "DISCONNECTED",
    }
    # {7,8} is itself an SCC-free chain: 7 trims to its own singleton SCC,
    # and neither reaches nor is reached from the core's WCC.


def test_bowtie_all_core(spark):
    e = _edges(spark, [(0, 1), (1, 2), (2, 0)])
    v = _verts(spark, range(3))
    out = bowtie_decomposition(e, v).collect()
    assert {r["bowtie_class"] for r in out} == {"CORE"}


def test_bowtie_core_tiebreak_min_scc_id(spark):
    # two 2-cycles: {0,1} and {2,3} — equal sizes, min scc_id (0) wins.
    e = _edges(spark, [(0, 1), (1, 0), (2, 3), (3, 2)])
    v = _verts(spark, range(4))
    out = {
        r["vertex_id"]: r["bowtie_class"]
        for r in bowtie_decomposition(e, v).collect()
    }
    assert out[0] == "CORE" and out[1] == "CORE"
    # the loser cycle is unreachable from the winner: DISCONNECTED
    assert out[2] == "DISCONNECTED" and out[3] == "DISCONNECTED"


# ------------------------------------------- association rules


def _rules_twin(baskets, min_support):
    """Pure-Python replica: baskets is {basket_key: set(items)}."""
    n = len(baskets)
    isup = Counter()
    for items in baskets.values():
        for i in items:
            isup[i] += 1
    pair = Counter()
    for items in baskets.values():
        for a in items:
            for b in items:
                if a != b:
                    pair[(a, b)] += 1
    out = {}
    for (a, b), s in pair.items():
        if s < min_support:
            continue
        conf = int(s * 1_000_000.0 / isup[a] + 0.5)
        lift = int((s * n) * 1_000_000.0 / (isup[a] * isup[b]) + 0.5)
        out[(a, b)] = (s, conf, lift)
    return out


def test_association_rules_exact(spark):
    rows = []
    baskets = {
        1: {"a", "b", "c"},
        2: {"a", "b"},
        3: {"b", "c"},
        4: {"a"},
        5: {"a", "b", "d"},
    }
    for k, items in baskets.items():
        for it in items:
            rows.append((k, it))
            rows.append((k, it))  # duplicates must not inflate support
    df = spark.createDataFrame(rows, "bk long, item string")
    got = {
        (r["antecedent"], r["consequent"]): (
            r["support"],
            r["confidence_e6"],
            r["lift_e6"],
        )
        for r in association_rules(
            df, basket_cols=("bk",), item_col="item", min_support=2
        ).collect()
    }
    assert got == _rules_twin(baskets, 2)


def test_association_rules_min_support_filters(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "a"), (2, "c")], "bk long, item string"
    )
    out = association_rules(
        df, basket_cols=("bk",), item_col="item", min_support=2
    ).collect()
    assert out == []  # every pair co-occurs exactly once


# ------------------------------------------- classification report


def test_classification_report_exact(spark):
    # confusion: a->a 3, a->b 1, b->b 2, b->c 1, c->a 1
    rows = (
        [("a", "a")] * 3
        + [("a", "b")]
        + [("b", "b")] * 2
        + [("b", "c")]
        + [("c", "a")]
    )
    df = spark.createDataFrame(rows, "actual string, predicted string")
    got = {
        r["cls"]: r.asDict() for r in classification_report(df).collect()
    }
    n = 8
    trace = 5
    # rows: a=4, b=3, c=1; cols: a=4, b=3, c=1 -> S = 16 + 9 + 1 = 26
    s_rc = 26
    kappa = int((n * trace - s_rc) * 1_000_000.0 / (n * n - s_rc) + 0.5)
    acc = int(trace * 1_000_000.0 / n + 0.5)
    assert set(got) == {"a", "b", "c"}
    a = got["a"]
    assert (a["support"], a["tp"], a["fp"], a["fn"]) == (4, 3, 1, 1)
    assert a["precision_e6"] == 750000
    assert a["recall_e6"] == 750000
    assert a["f1_e6"] == 750000
    b = got["b"]
    assert (b["support"], b["tp"], b["fp"], b["fn"]) == (3, 2, 1, 1)
    assert b["f1_e6"] == int(4 * 1_000_000.0 / 6 + 0.5)  # 2tp/(2tp+fp+fn)
    c = got["c"]
    assert (c["support"], c["tp"], c["fp"], c["fn"]) == (1, 0, 1, 1)
    assert c["precision_e6"] == 0 and c["recall_e6"] == 0 and c["f1_e6"] == 0
    for r in got.values():
        assert r["accuracy_e6"] == acc
        assert r["kappa_e6"] == kappa


def test_classification_report_unseen_predicted_class(spark):
    # a class that only ever appears as a prediction still gets a row
    df = spark.createDataFrame(
        [("x", "x"), ("x", "zz")], "actual string, predicted string"
    )
    got = {r["cls"]: r.asDict() for r in classification_report(df).collect()}
    assert got["zz"]["support"] == 0
    assert got["zz"]["fp"] == 1
    assert got["zz"]["precision_e6"] == 0
