"""Winnowing document fingerprints (Schleimer, Wilkerson, Aiken — SIGMOD'03).

The MOSS local fingerprinting scheme: hash every word k-gram, slide a window
of ``window`` consecutive k-gram hashes, and in each window select the
minimum hash (rightmost position on ties — the original paper's rule, which
makes the selection a pure function of the document). The selected
(position, hash) set fingerprints the document with the guarantee that any
shared substring of at least ``window + k − 1`` tokens produces at least one
shared fingerprint — unlike MinHash (a global sketch), winnowing localizes
matches, which is why it's the standard plagiarism/citation-overlap scheme.

Scale shape: k-gram hashing happens in-row (transform over a sequence — one
explode only); window selection is a per-document sort window
(``min(struct(h, −pos)) OVER (ROWS BETWEEN CURRENT AND w−1 FOLLOWING)``,
sort-based and spillable, bounded by document length); the pair stage is an
inverted-index self-join on the fingerprint hash with a document-frequency
cap — the same no-cross-join discipline as MinHash banding (dedup.py).

``hash_method="portable"`` selects the md5-derived cross-engine hash so the
DuckDB gate replicates the whole dataflow bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from halvesting_geometric_spark.operators.ngram_lm import _token_array
from halvesting_geometric_spark.operators.sampling import hash64


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 3,
    window: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_method: str = "xxhash64",
) -> DataFrame:
    """(id, pos, fp): the selected winnowing fingerprints — pos is the
    0-based k-gram position, fp the k-gram hash. Documents shorter than k
    tokens yield no rows; documents with fewer than ``window`` k-grams get
    one window covering what exists (the frame truncates at the end)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    toks = docs.select(
        F.col(id_col), _token_array(text_col).alias("tok")
    ).filter(F.size("tok") >= k)
    grams = toks.select(
        id_col,
        (F.size("tok") - k + 1).alias("m"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.size("tok") - k),
                lambda i: F.concat_ws(
                    " ", F.slice("tok", i + 1, F.lit(k))
                ),
            )
        ).alias("pos", "gram"),
    )
    hashed = grams.select(
        id_col, "m", "pos", hash64(hash_method, "gram").alias("h")
    )
    # rightmost-min tie rule: min of (h, -pos) picks smallest h, then
    # LARGEST pos — the paper's deterministic selection
    wfn = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.currentRow, window - 1)
    )
    sel = hashed.select(
        id_col,
        "pos",
        "m",
        F.min(F.struct(F.col("h"), (-F.col("pos")).alias("np"))).over(
            wfn
        ).alias("_sel"),
    ).filter(F.col("pos") <= F.greatest(F.col("m") - window, F.lit(0)))
    return (
        sel.select(
            id_col,
            (-F.col("_sel.np")).cast("long").alias("pos"),
            F.col("_sel.h").alias("fp"),
        )
        .distinct()
    )


def winnow_pairs(
    docs: DataFrame,
    k: int = 3,
    window: int = 4,
    min_shared: int = 2,
    max_doc_freq: int | None = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_method: str = "xxhash64",
) -> DataFrame:
    """(a, b, shared) with a < b: document pairs sharing ≥ ``min_shared``
    winnowing fingerprints — the localized-overlap candidate set.
    ``max_doc_freq`` drops fingerprints present in more than that many
    documents before the self-join (a boilerplate fingerprint is quadratic
    and carries no signal — same rationale as the shingle doc-frequency cap
    in dedup.py)."""
    if min_shared < 1:
        raise ValueError(f"min_shared must be >= 1, got {min_shared}")
    fps = winnow_fingerprints(
        docs, k=k, window=window, text_col=text_col, id_col=id_col,
        hash_method=hash_method,
    ).select(F.col(id_col).alias("id"), "fp").distinct()
    if max_doc_freq is not None:
        if max_doc_freq < 1:
            raise ValueError(
                f"max_doc_freq must be >= 1, got {max_doc_freq}"
            )
        keep = (
            fps.groupBy("fp")
            .agg(F.count("*").alias("df"))
            .filter(F.col("df") <= max_doc_freq)
            .select("fp")
        )
        fps = fps.join(keep, "fp")
    left = fps.select(F.col("id").alias("a"), "fp")
    right = fps.select(F.col("id").alias("b"), "fp")
    pairs = (
        left.join(right, "fp")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("shared"))
    )
    return pairs.filter(F.col("shared") >= min_shared)
