"""Byte-pair-encoding subword vocabulary training over the corpus
(Sennrich et al. 2016 — the standard subword tokenizer trainer; public
algorithm), as a vocabulary-bounded iterative DataFrame job.

The trick that makes corpus-scale BPE cheap: after the initial word-count
aggregation, EVERYTHING runs over the distinct-word table (vocabulary-
bounded — ~10⁵–10⁷ rows regardless of corpus size), with each word
carrying its corpus frequency as a weight. Per merge round:

1. adjacent-symbol pair counts — one in-array zip (codegen'd) + one
   weighted hash aggregate over the vocabulary;
2. the argmax pair (count DESC, pair ASC — the deterministic, portable
   tie-break) — a 1-row collect, the only driver state (num_merges pairs);
3. the merge applied to every word's symbol array as a greedy
   left-to-right ``aggregate`` fold (pure Catalyst, no UDF) — identical
   fold semantics to the DuckDB oracle's ``list_reduce`` twin.

Segmentation re-applies the learned merges in rank order to the distinct
words and broadcast-joins the word → subwords table back onto the corpus,
so the corpus is touched exactly twice (count + final join) however many
merges are trained.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["bpe_train", "bpe_segment", "word_counts"]


def _token_array(text_col: str) -> Column:
    return F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda t: t != ""
    )


def word_counts(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(word, n) corpus frequencies — the vocabulary-bounded table every
    BPE round runs over."""
    return (
        docs.select(F.explode(_token_array(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def _merge_fold(sym_col: Column, a: str, b: str) -> Column:
    """Greedy left-to-right single-merge pass: rebuild the symbol array,
    fusing every non-overlapping adjacent (a, b) into a||b. Overlaps
    resolve leftmost-first because the fused symbol (a||b ≠ a for
    non-empty b) can never re-match as the left element."""
    return F.aggregate(
        sym_col,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(a + b))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _pair_counts(syms: DataFrame) -> DataFrame:
    pairs = F.filter(
        F.zip_with(
            "s",
            F.slice(F.col("s"), 2, F.greatest(F.size("s") - 1, F.lit(0))),
            lambda a, b: F.struct(a.alias("a"), b.alias("b")),
        ),
        lambda p: p["b"].isNotNull(),
    )
    return (
        syms.select("n", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("n").alias("cnt"))
    )


def bpe_train(
    docs: DataFrame,
    num_merges: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn ``num_merges`` merges; returns (merges, word_syms) where
    merges = [(left, right, weighted_count)] in rank order and word_syms =
    (word, n, s: array<string>) — every distinct word segmented under the
    learned merges."""
    wc = word_counts(docs, text_col, id_col).persist(StorageLevel.MEMORY_AND_DISK)
    syms = wc.select(
        "word",
        "n",
        F.filter(F.split(F.col("word"), ""), lambda c: c != "").alias("s"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    syms.count()
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        best = (
            _pair_counts(syms)
            .orderBy(F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc())
            .limit(1)
            .collect()
        )
        if not best:
            break
        a, b, cnt = best[0]["a"], best[0]["b"], best[0]["cnt"]
        merges.append((a, b, int(cnt)))
        prev = syms
        syms = (
            syms.select("word", "n", _merge_fold(F.col("s"), a, b).alias("s"))
            .localCheckpoint(eager=False)
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        syms.count()
        prev.unpersist()
    wc.unpersist()
    return merges, syms


def bpe_segment(
    docs: DataFrame,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    word_syms: DataFrame | None = None,
) -> DataFrame:
    """(id, word, subwords) — one row per token occurrence, segmented
    under ``merges`` (applied in rank order). Pass ``word_syms`` from
    ``bpe_train`` to skip recomputing the per-word segmentation; the
    word → subwords table broadcast-joins onto the exploded corpus."""
    toks = docs.select(F.col(id_col), F.explode(_token_array(text_col)).alias("word"))
    if word_syms is None:
        sym_expr: Column = F.filter(F.split(F.col("word"), ""), lambda c: c != "")
        for m in merges:
            sym_expr = _merge_fold(sym_expr, m[0], m[1])
        word_syms = toks.select("word").distinct().select(
            "word", sym_expr.alias("s")
        )
    return toks.join(
        F.broadcast(word_syms.select("word", F.col("s").alias("subwords"))),
        "word",
    ).select(id_col, "word", "subwords")
