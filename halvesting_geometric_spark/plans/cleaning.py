"""End-to-end corpus cleaning: the training-data operators composed into
one declarative plan (engine-new).

The individual stages (PII scrubbing, quality scoring, language ID, exact
dedup) each have their own operator and gate entry; this module wires them
into the pipeline a data-curation job actually runs, in the canonical
order:

1. scrub PII-style patterns (URLs/emails/IPs/long digit runs);
2. score quality + language on the SCRUBBED text (placeholders shouldn't
   count as words, so scoring after scrubbing is the right order);
3. filter by quality threshold and optional language allowlist;
4. exact-dedup on the scrubbed text (deterministic min-id keeper).

Everything stays one Catalyst plan until the final aggregation — no
intermediate materialization, so column pruning and predicate pushdown
reach the parquet scan. Returns both the surviving rows and a one-row
per-stage audit (the numbers a curation run reports).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from halvesting_geometric_spark.operators.textstats import (
    language_id,
    quality_score,
    scrub_text,
)


@dataclass
class CleaningResult:
    docs: DataFrame  # (doc_id, text) — scrubbed survivors, dedup keepers
    audit: DataFrame  # one row: per-stage counts


def clean_corpus(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_quality: float = 0.5,
    languages: list[str] | None = None,
) -> CleaningResult:
    """Scrub → score → filter → exact-dedup. ``languages=None`` keeps every
    language (including 'und'). Dedup keeps the smallest id per distinct
    scrubbed text."""
    scrubbed = scrub_text(docs, text_col=text_col, id_col=id_col).select(
        F.col(id_col), F.col("scrubbed").alias(text_col)
    )
    q = quality_score(scrubbed, text_col=text_col, id_col=id_col).select(
        id_col, "quality"
    )
    lang = language_id(scrubbed, text_col=text_col, id_col=id_col).select(
        id_col, "lang_pred"
    )
    scored = scrubbed.join(q, id_col).join(lang, id_col)
    kept = scored.filter(F.col("quality") >= min_quality)
    if languages is not None:
        kept = kept.filter(F.col("lang_pred").isin(list(languages)))
    # one materialization of the regex-heavy scoring chain: the audit counts
    # and the returned survivors all read the cached/truncated frames
    # instead of re-running scrub+score per action
    from pyspark import StorageLevel

    kept = kept.persist(StorageLevel.MEMORY_AND_DISK)
    keepers = (
        kept.groupBy(text_col)
        .agg(F.min(id_col).alias(id_col))
        .select(id_col, text_col)
        .localCheckpoint(eager=True)
    )
    n_input = docs.count()
    n_kept = kept.count()
    n_out = keepers.count()
    kept.unpersist()
    spark = docs.sparkSession
    audit = spark.createDataFrame(
        [(n_input, n_kept, n_kept - n_out, n_out)],
        "n_input long, n_quality_pass long, n_dup_removed long, n_output long",
    )
    return CleaningResult(docs=keepers, audit=audit)
