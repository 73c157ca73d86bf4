"""Windowed word co-occurrence counts + PMI (engine-new).

The word2vec/GloVe-style corpus statistic: for every unordered token pair
within ``window`` positions of each other, the skip-gram occurrence count,
and from it pointwise mutual information

    PMI(a, b) = ln( p(a,b) / (p(a)·p(b)) ),
    p(a,b) = cnt(a,b) / C,  p(w) = cnt(w) / T

with C = total pair occurrences and T = total token occurrences.

Scale shape: pairs are built INSIDE each row — the token array zipped
against itself shifted by 1..window (the ngram_lm trick), so there is no
positional self-join and no per-document quadratic work; the only wide ops
are the two groupBy counts (map-side combined) and two broadcast-sized
joins against the unigram table. The corpus totals ride along as a
broadcast cross join — no driver collect.

Reference analog: none; engine-new per the training-data-pipeline brief
(embedding-corpus statistics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from halvesting_geometric_spark.operators.ngram_lm import _token_array


def cooccurrence_counts(
    docs: DataFrame,
    window: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 1,
) -> DataFrame:
    """(a, b, cnt): unordered pair counts within ``window`` positions, a ≤ b
    lexicographically (a == b when a word co-occurs with itself). Tokens are
    the whitespace-split lowercased words the other text operators use."""
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    toks = docs.select(F.col(id_col), _token_array(text_col).alias("tok"))
    arrs = [
        F.filter(
            F.zip_with(
                "tok",
                F.slice(
                    F.col("tok"),
                    o + 1,
                    F.greatest(F.size("tok") - o, F.lit(0)),
                ),
                lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
            ),
            lambda p: p["w2"].isNotNull(),
        )
        for o in range(1, window + 1)
    ]
    pl = F.concat(*arrs) if len(arrs) > 1 else arrs[0]
    pairs = toks.select(F.explode(pl).alias("p")).select(
        F.least("p.w1", "p.w2").alias("a"),
        F.greatest("p.w1", "p.w2").alias("b"),
    )
    out = pairs.groupBy("a", "b").agg(F.count("*").alias("cnt"))
    if min_count > 1:
        out = out.filter(F.col("cnt") >= min_count)
    return out


def cooccurrence_pmi(
    docs: DataFrame,
    window: int = 2,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(a, b, cnt, ratio, pmi): co-occurrence counts plus the PMI ratio
    p(a,b) / (p(a)·p(b)) and its natural log. ``ratio`` is pure IEEE
    division/multiplication in a fixed order — bit-reproducible across
    engines (the gate pins it); ``pmi`` = ln(ratio) for consumers (libm ln
    may differ in the last ulp across engines, so the gate checks the ratio,
    and a pytest checks pmi against numpy)."""
    pairs = cooccurrence_counts(
        docs, window=window, text_col=text_col, id_col=id_col,
        min_count=min_count,
    )
    toks = docs.select(F.explode(_token_array(text_col)).alias("w"))
    uni = toks.groupBy("w").agg(F.count("*").alias("c"))
    tot = uni.agg(F.sum("c").cast("double").alias("T"))
    # pair total BEFORE min_count (the estimator's C covers all pairs)
    all_pairs = cooccurrence_counts(
        docs, window=window, text_col=text_col, id_col=id_col, min_count=1
    )
    ptot = all_pairs.agg(F.sum("cnt").cast("double").alias("C"))
    ratio = (F.col("cnt").cast("double") / F.col("C")) / (
        (F.col("ca") / F.col("T")) * (F.col("cb") / F.col("T"))
    )
    return (
        # unigram joins carry no hint: AQE broadcasts a small vocab and
        # falls back to shuffle joins when the vocabulary itself is large
        pairs.join(
            uni.select(F.col("w").alias("a"), F.col("c").alias("ca")), "a"
        )
        .join(
            uni.select(F.col("w").alias("b"), F.col("c").alias("cb")), "b"
        )
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(ptot))
        .select(
            "a",
            "b",
            "cnt",
            ratio.alias("ratio"),
            F.log(ratio).alias("pmi"),
        )
    )
