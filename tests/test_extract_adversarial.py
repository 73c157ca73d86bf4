"""Adversarial extraction inputs: marker edge cases the datagen never emits."""

from __future__ import annotations

import datetime

from halvesting_geometric_spark.operators.extract import extract_conv_edges
from halvesting_geometric_spark.schemas import TRANSCRIPTS_SCHEMA

TS = datetime.datetime(2024, 1, 1)


def _tr(spark, rows):
    full = [
        (cid, i, "user", text, "", TS) for i, (cid, text) in enumerate(rows)
    ]
    return spark.createDataFrame(full, TRANSCRIPTS_SCHEMA)


def test_adversarial_marker_shapes(spark):
    rows = [
        ("a", "plain [[ref:x1]] end"),                 # normal
        ("a", "[[ref:x1]][[ref:x2]]"),                 # adjacent, no spaces
        ("b", "[[ref:]] empty target"),                 # empty ref → no match ([^\]]+)
        ("b", "[[ref:x3]"),                             # unterminated → no match
        ("b", "[ref:x4]] half-open"),                   # malformed → no match
        ("c", "nested [[ref:[[ref:x5]]]] chaos"),       # inner match only
        ("c", "unicode [[ref:cönv-ü]] ok"),             # unicode target
        ("d", "[[REF:x6]] wrong case"),                 # case-sensitive → no match
        ("d", "marker at end [[ref:x7]]"),
        ("e", None),                                    # null text
        ("e", ""),                                      # empty text
        ("f", "[[ref:x8]] dup [[ref:x8]]"),             # in-row duplicate
    ]
    got = {
        (r.src_conv, r.dst_conv)
        for r in _tr(spark, rows).transform(extract_conv_edges).collect()
    }
    assert got == {
        ("a", "x1"),
        ("a", "x2"),
        ("c", "[[ref:x5"),  # regex matches the inner-most opener's content
        ("c", "cönv-ü"),
        ("d", "x7"),
        ("f", "x8"),
    }


def test_adversarial_matches_python_oracle(spark):
    """The Spark regex and the oracle regex agree on every adversarial row."""
    import re

    rows = [
        ("g", "[[ref:a]] [[ref:b]] [[ref:a]]"),
        ("h", "]] [[ [[ref:weird]]"),
        ("i", "[[ref:x]]extra]]"),
        ("j", "[[ ref:spaced]] no"),
    ]
    pat = re.compile(r"\[\[ref:([^\]]+)\]\]")
    exp = set()
    for cid, text in rows:
        for m in pat.findall(text):
            exp.add((cid, m))
    got = {
        (r.src_conv, r.dst_conv)
        for r in _tr(spark, rows).transform(extract_conv_edges).collect()
    }
    assert got == exp
