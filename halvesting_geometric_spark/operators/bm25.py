"""Lexical weighting over the documents table: Okapi BM25 probe-term
relevance (Robertson & Spärck Jones lineage) and TF-IDF top-k keyterm
extraction — both standard public algorithms. The training-data-pipeline
use: score documents against a topic definition (BM25) and surface each
document's most characteristic terms (TF-IDF) for clustering, labeling,
or domain analysis.

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

__all__ = ["bm25_scores", "hashing_tf", "tfidf_top_terms"]


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


def tfidf_top_terms(
    docs: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k characteristic terms per document by TF-IDF.

    tfidf(d, t) = tf(d, t) · ln((1 + N) / (1 + df(t))) — the smoothed idf
    (sklearn's convention, public), which never divides by zero and keeps
    corpus-wide terms near weight 0. Ranking per document is on the
    1e-4-rounded score with lexicographic term tie-break, so the ordering
    is bit-portable across engines. Returns (id, term, rank, tfidf_e4).

    Scale shape: one explode + one (doc, term) count aggregate (the tf
    table, corpus-token bounded), a term-keyed df aggregate (vocabulary
    bounded) joined back on the term key, then a per-document top-k
    window — the same shuffle pattern as every top-k gate in the repo.
    """
    from pyspark.sql import Window

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    tok = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda t: t != ""
    )
    terms = docs.select(F.col(id_col), F.explode(tok).alias("term"))
    tf = terms.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    df_t = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.select(id_col).agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df_t, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            id_col,
            "term",
            F.floor(
                F.col("tf")
                * F.log(
                    (F.lit(1.0) + F.col("n_docs"))
                    / (F.lit(1.0) + F.col("df"))
                )
                * 10_000
                + F.lit(0.5)
            )
            .cast("long")
            .alias("tfidf_e4"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf_e4").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", F.col("rank").cast("long").alias("rank"), "tfidf_e4")
    )


def hashing_tf(
    docs: DataFrame,
    num_features: int = 1024,
    signed: bool = True,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Feature hashing ("hashing trick", Weinberger et al. ICML 2009; the
    fixed-dimension term-vector step of classic text-ML pipelines —
    Spark MLlib's HashingTF re-expressed as a relational plan over the
    engine-portable hash, so the result is identical on any engine or
    cluster size).

    Each whitespace token maps to ``feature = portable_hash(token) %
    num_features``; ``signed=True`` additionally multiplies each
    occurrence by a ±1 sign hash (second independent hash), which makes
    hash-collision noise zero-mean — the unbiased estimator variant.
    Returns the sparse vectors as (doc_id, feature, value) rows with
    exact BIGINT values (zero entries dropped — signed cancellation
    included), empty documents dropped.

    One explode + one map-side-combinable groupBy; the shuffle carries at
    most ``num_features`` rows per document.
    """
    if num_features < 1:
        raise ValueError(f"num_features must be >= 1, got {num_features}")
    from halvesting_geometric_spark.functions import portable_hash64

    toks = docs.filter(F.length(F.trim(F.col(text_col))) > 0).select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("_tok"),
    )
    feature = F.pmod(
        portable_hash64(F.col("_tok"), seed=seed), F.lit(int(num_features))
    )
    if signed:
        sgn = F.when(
            F.pmod(portable_hash64(F.col("_tok"), seed=seed + 1), F.lit(2))
            == 0,
            F.lit(1),
        ).otherwise(F.lit(-1))
    else:
        sgn = F.lit(1)
    return (
        toks.select(
            id_col,
            feature.cast("long").alias("feature"),
            sgn.cast("long").alias("_sgn"),
        )
        .groupBy(id_col, "feature")
        .agg(F.sum("_sgn").cast("long").alias("value"))
        .filter(F.col("value") != 0)
    )
