"""Deterministic synthetic transcripts generator (FIXTURES.md §1).

A pure function of ``(seed, n_convs)`` — no wall-clock, no external data.
Generation is *distributed*: ``spark.range(n_convs)`` → ``mapInPandas`` with a
per-conversation RNG seeded by ``(seed, conv_index)``, so the output is
identical regardless of partition count or executor layout, and scales to any
``n_convs`` without a driver-side materialization.

The text column embeds reference markers ``[[ref:<conv_id>]]``; destination
conversations are drawn from a Zipf(s≈1.5) distribution so a few conversations
are cited by a large fraction of others (exercises the skew path), plus ~5%
dangling references to non-existent conv_ids (which become new vertices —
reference analog: cited-paper vertex-set augmentation at
``/root/reference/halvesting_geometric/utils/data/link_prediction_metadata.py:312-319``),
duplicate markers within a conversation (dedupe analog: PyG ``coalesce`` at
``.../link_prediction_dataset.py:211``), and occasional self-references.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from halvesting_geometric_spark.schemas import TRANSCRIPTS_SCHEMA

ROLES = ("user", "assistant", "tool")
TOOLS = ("", "search", "calculator", "browser")
_EPOCH_US = 1_700_000_000_000_000  # fixed base timestamp (2023-11-14T22:13:20Z)


def conv_name(i: int) -> str:
    return f"c{i:08d}"


def dangling_name(i: int) -> str:
    return f"x{i:08d}"


def _gen_conversations(
    idx: np.ndarray, seed: int, n_convs: int
) -> pd.DataFrame:
    rows_conv: list[str] = []
    rows_turn: list[int] = []
    rows_role: list[str] = []
    rows_text: list[str] = []
    rows_tool: list[str] = []
    rows_ts: list[int] = []
    for i in idx:
        rng = np.random.default_rng((seed, int(i)))
        n_turns = int(rng.integers(3, 21))
        cid = conv_name(int(i))
        for t in range(n_turns):
            n_refs = int(rng.choice([0, 0, 0, 1, 1, 2, 3]))
            parts = [f"turn {t} of {cid}:"]
            for _ in range(n_refs):
                r = rng.random()
                if r < 0.05:
                    dst = dangling_name(int(rng.integers(0, max(n_convs // 10, 1))))
                elif r < 0.08:
                    dst = cid  # self-reference
                else:
                    z = int(rng.zipf(1.5))
                    dst = conv_name((z - 1) % n_convs)
                parts.append(f"see [[ref:{dst}]] for context.")
            parts.append("lorem ipsum " * int(rng.integers(1, 4)))
            rows_conv.append(cid)
            rows_turn.append(t)
            rows_role.append(ROLES[t % 3])
            rows_text.append(" ".join(parts))
            rows_tool.append(TOOLS[int(rng.integers(0, 4))])
            rows_ts.append(_EPOCH_US + int(i) * 3_600_000_000 + t * 60_000_000)
    return pd.DataFrame(
        {
            "conv_id": rows_conv,
            "turn_idx": np.asarray(rows_turn, dtype=np.int32),
            "role": rows_role,
            "text": rows_text,
            "tool": rows_tool,
            "ts": pd.to_datetime(np.asarray(rows_ts, dtype=np.int64), unit="us"),
        }
    )


def generate_transcripts(
    spark: SparkSession, n_convs: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Distributed deterministic transcripts table of ``n_convs`` conversations."""
    partitions = partitions or max(spark.sparkContext.defaultParallelism, 1)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf):
                yield _gen_conversations(pdf["id"].to_numpy(), seed, n_convs)

    base = spark.range(0, n_convs, numPartitions=min(partitions, max(1, n_convs)))
    return base.mapInPandas(gen, schema=TRANSCRIPTS_SCHEMA)


def generate_transcripts_pandas(n_convs: int, seed: int = 42) -> pd.DataFrame:
    """Driver-side oracle twin of :func:`generate_transcripts` (tests only)."""
    return _gen_conversations(np.arange(n_convs), seed, n_convs)


def generate_power_law_edges(
    spark: SparkSession,
    n_vertices: int,
    n_edges: int,
    exponent: float = 3.0,
    seed: int = 42,
    partitions: int | None = None,
):
    """Pure-expression synthetic edge table with power-law in-degree skew.

    For throughput benchmarks at sizes where the transcript generator's
    Python loops would dominate: everything here is JVM codegen
    (hash → uniform → inverse-CDF), generating tens of millions of edges in
    seconds, deterministic in ``seed`` and independent of partitioning.
    ``dst = floor(V · u^exponent)`` concentrates mass near vertex 0 — a few
    hot destinations receive a large fraction of edges (the skew the engine's
    scatter path must absorb).
    """
    from pyspark.sql import functions as F

    partitions = partitions or spark.sparkContext.defaultParallelism
    p = 1_000_000_007
    base = spark.range(0, n_edges, numPartitions=partitions)
    u_src = F.pmod(F.xxhash64(F.col("id"), F.lit(seed)), F.lit(p)) / float(p)
    u_dst = F.pmod(F.xxhash64(F.col("id"), F.lit(seed + 1)), F.lit(p)) / float(p)
    src = F.least(
        F.floor(F.lit(float(n_vertices)) * u_src), F.lit(n_vertices - 1)
    ).cast("long")
    dst = F.least(
        F.floor(F.lit(float(n_vertices)) * F.pow(u_dst, F.lit(exponent))),
        F.lit(n_vertices - 1),
    ).cast("long")
    return base.select(src.alias("src"), dst.alias("dst"))
