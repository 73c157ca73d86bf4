"""Corpus n-gram language-model quality scoring — the CCNet-style filter
signal (Wenzek et al. 2020, public paper): train token-bigram statistics on
the corpus itself, then score each document by its mean bigram
log-likelihood under add-α smoothing. Low scores flag boilerplate, encoding
damage, and out-of-domain text; the score is the standard cheap proxy for
LM perplexity in large-scale training-data pipelines.

Dataflow (all Catalyst, no UDF): whitespace tokens → in-array bigram build
(``zip_with`` against the array shifted by one — O(len) per row,
codegen'd) → explode → two hash aggregates (bigram counts, prefix counts)
→ join back → per-document mean of ``ln((c(w1,w2)+α)/(c(w1·)+α·V))``.

Scale: the counts tables shuffle on the gram key (heavy-tailed but
bounded by vocabulary, not corpus size — partial aggregation collapses
each partition's duplicates map-side); the score join is a plain equi-join
on the same key, so the whole job is two shuffles over token-frequency
data plus one over documents. The vocabulary size ``V`` enters the plan as
a 1-row broadcast cross join, not a driver collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["ngram_counts", "bigram_logprob"]


def _token_array(text_col: str):
    return F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda t: t != ""
    )


def _bigram_rows(
    docs: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """(id, w1, w2) — one row per bigram occurrence. The pair array is built
    inside the row (zip_with the token array against itself shifted by one;
    Spark pads the shorter side with null, which the filter drops) so the
    only explode is the final one."""
    toks = docs.select(F.col(id_col), _token_array(text_col).alias("tok"))
    pairs = toks.select(
        id_col,
        F.filter(
            F.zip_with(
                "tok",
                F.slice(F.col("tok"), 2, F.greatest(F.size("tok") - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
            ),
            lambda p: p["w2"].isNotNull(),
        ).alias("pl"),
    )
    return pairs.select(id_col, F.explode("pl").alias("p")).select(
        id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )


def ngram_counts(
    docs: DataFrame,
    n: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus n-gram occurrence counts: (gram, cnt), gram = tokens joined by
    a single space. n = 1 or 2 (the LM scorer consumes 2)."""
    if n == 1:
        toks = docs.select(F.explode(_token_array(text_col)).alias("gram"))
        return toks.groupBy("gram").agg(F.count("*").alias("cnt"))
    if n != 2:
        raise ValueError(f"only n in (1, 2) supported, got {n}")
    bg = _bigram_rows(docs, text_col, id_col)
    return (
        bg.select(F.concat_ws(" ", "w1", "w2").alias("gram"))
        .groupBy("gram")
        .agg(F.count("*").alias("cnt"))
    )


def bigram_logprob(
    docs: DataFrame,
    alpha: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document mean bigram log-likelihood under the corpus bigram model
    with add-α smoothing: mean over positions of
    ``ln((c(w1 w2) + α) / (c(w1 ·) + α·V))``, V = corpus vocabulary size.

    Returns (id, n_bigrams, logprob) for documents with ≥ 2 tokens (a
    document with no bigram has no likelihood and is absent — filter side
    of the pipeline treats absence as reject)."""
    bg = _bigram_rows(docs, text_col, id_col)
    cb = bg.groupBy("w1", "w2").agg(F.count("*").alias("cb"))
    cp = bg.groupBy("w1").agg(F.count("*").alias("cp"))
    vocab = (
        docs.select(F.explode(_token_array(text_col)).alias("t"))
        .agg(F.count_distinct("t").alias("v"))
    )
    scored = (
        bg.join(cb, ["w1", "w2"])
        .join(cp, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            id_col,
            F.log(
                (F.col("cb") + F.lit(alpha))
                / (F.col("cp") + F.lit(alpha) * F.col("v"))
            ).alias("lp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        F.avg("lp").alias("logprob"),
    )
