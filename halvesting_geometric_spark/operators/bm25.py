"""Okapi BM25 relevance scoring over the documents table (Robertson &
Spärck Jones lineage; the standard lexical ranking function — public
algorithm). The training-data-pipeline use: given a fixed probe-term set
(e.g. a topic definition), score every document for retrieval-style
filtering or domain weighting.

Dataflow (all Catalyst): whitespace tokens → explode → per-(doc, term)
term frequencies restricted to the query terms (the filter lands BEFORE
the aggregation, so the shuffle carries |query| terms per doc, not the
vocabulary) → document frequencies per term (broadcast back — |query|
rows) → per-doc score sum. Document length and corpus-average length are
computed from the same token arrays; ``avgdl`` enters the plan as a 1-row
broadcast cross join.

Determinism contract: tf, df, dl, N are exact integers in any engine;
only idf's log and the final sum float — the gate rounds at 1e-4 like
every similarity gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bm25_scores"]


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, score): Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))
    with idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)). Every document
    appears (score 0.0 when it contains no query term)."""
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    terms = [t.lower() for t in query_terms]
    tok = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda t: t != ""
    )
    base = docs.select(F.col(id_col), tok.alias("tok")).select(
        id_col, "tok", F.size("tok").cast("long").alias("dl")
    )
    stats = base.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    hits = (
        base.select(id_col, "dl", F.explode("tok").alias("t"))
        .filter(F.col("t").isin(terms))
        .groupBy(id_col, "dl", "t")
        .agg(F.count("*").alias("tf"))
    )
    df_t = hits.groupBy("t").agg(F.count("*").alias("df"))
    scored = (
        hits.join(F.broadcast(df_t), "t")
        .crossJoin(F.broadcast(stats))
        .select(
            id_col,
            (
                F.log(
                    F.lit(1.0)
                    + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                    / (F.col("df") + F.lit(0.5))
                )
                * (F.col("tf") * F.lit(k1 + 1.0))
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (
                        F.lit(1.0 - b)
                        + F.lit(b) * F.col("dl") / F.col("avgdl")
                    )
                )
            ).alias("part"),
        )
        .groupBy(id_col)
        .agg(F.sum("part").alias("score"))
    )
    return (
        base.select(id_col)
        .join(scored, id_col, "left")
        .select(id_col, F.coalesce("score", F.lit(0.0)).alias("score"))
    )
