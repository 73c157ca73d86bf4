"""Training-data mixing and context chunking — the corpus-assembly step of
an LLM data pipeline (domain/language re-weighting as in public recipes:
The Pile, Gopher, LLaMA data mixtures; chunking as in every long-context
training/RAG pipeline).

- :func:`budget_mix` — deterministic budgeted downsampling per group: each
  group (language, domain, source …) gets a token budget; the group's keep
  rate is ``min(1, budget / group_tokens)`` and membership is decided by an
  engine-portable hash of the document id, so the sample is reproducible
  across runs, engines, AND cluster sizes (no RNG state, no per-partition
  dependence).  Two aggregations + one broadcast-joined filter — nothing
  materializes beyond one row per group before the final filter.
- :func:`chunk_tokens` — fixed-size whitespace-token windows with overlap
  via pure array arithmetic (split → sequence of starts → slice per start →
  explode): one narrow map stage, no shuffle at all, no Python.

Rates are integer parts-per-million and the hash is
``functions.portable_hash64``, so the DuckDB correctness twin reproduces
every kept row bit-for-bit (same reason the edge-split gate is exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from halvesting_geometric_spark.functions import portable_hash64

_PPM = 1_000_000


def budget_mix(
    docs: DataFrame,
    group_col: str,
    token_budget: int,
    budgets: dict[str, int] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: int = 0,
) -> DataFrame:
    """Sampled corpus meeting per-group token budgets (in expectation).

    ``token_budget`` is the default per-group budget; ``budgets`` overrides
    it for specific group values.  Returns the kept rows of ``docs`` plus
    ``(group_tokens, rate_ppm)`` — the group's total whitespace-token count
    and its keep rate in parts-per-million (exact integer division, so the
    oracle twin matches on boundaries).  A group under budget keeps all its
    rows (rate 1e6).
    """
    if token_budget < 0:
        raise ValueError(f"token_budget must be >= 0, got {token_budget}")
    n_tok = F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("long")
    per_group = (
        docs.select(F.col(group_col).alias("_g"), n_tok.alias("_t"))
        .groupBy("_g")
        .agg(F.sum("_t").alias("group_tokens"))
    )
    if budgets:
        budget_expr = F.coalesce(
            *[
                F.when(F.col("_g") == F.lit(g), F.lit(int(b)))
                for g, b in sorted(budgets.items())
            ],
            F.lit(int(token_budget)),
        )
    else:
        budget_expr = F.lit(int(token_budget))
    rates = per_group.select(
        "_g",
        "group_tokens",
        F.least(
            F.lit(_PPM),
            F.floor(
                # cast BEFORE the multiply: Spark 4 runs ANSI mode, and
                # budget·1e6 overflows int32 for any budget > 2147
                (budget_expr.cast("long") * F.lit(_PPM).cast("long"))
                / F.col("group_tokens")
            ),
        )
        .cast("long")
        .alias("rate_ppm"),
    )
    return (
        docs.join(
            F.broadcast(rates),
            docs[group_col] == rates["_g"],
        )
        .filter(
            F.pmod(portable_hash64(F.col(id_col), seed=seed), F.lit(_PPM))
            < F.col("rate_ppm")
        )
        .drop("_g")
    )


def chunk_tokens(
    docs: DataFrame,
    chunk_size: int,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, chunk_idx, n_tokens, chunk) fixed-size whitespace-token windows.

    Window k starts at token ``1 + k·(chunk_size − overlap)`` (1-based) for
    every start ≤ the document's token count — the final window may be
    shorter than ``chunk_size`` (never empty).  Pure array expressions:
    split → sequence → per-start slice+join → posexplode; no shuffle.
    """
    if chunk_size < 1:
        raise ValueError(f"chunk_size must be >= 1, got {chunk_size}")
    if not 0 <= overlap < chunk_size:
        raise ValueError(
            f"overlap must be in [0, chunk_size): {overlap} vs {chunk_size}"
        )
    stride = chunk_size - overlap
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    starts = F.sequence(F.lit(1), F.size(toks), F.lit(stride))
    chunks = F.transform(
        starts, lambda s: F.concat_ws(" ", F.slice(toks, s, chunk_size))
    )
    return (
        docs.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(
            F.col(id_col),
            F.posexplode(chunks).alias("chunk_idx", "chunk"),
        )
        .select(
            id_col,
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.size(F.split(F.col("chunk"), r"\s+"))
            .cast("long")
            .alias("n_tokens"),
            "chunk",
        )
    )
