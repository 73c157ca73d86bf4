"""Dialogue-structure statistics over transcript tables (engine-new).

Transcripts are (conv_id, turn_idx, role, text, tool, ts) rows — the
engine's native input shape (BASELINE.json input_hint). These operators
summarize the conversational STRUCTURE rather than the text:

``role_transitions``: the Markov transition table over consecutive turns —
(from_role, to_role, cnt, prob) with prob row-normalized per from_role.
The per-conversation ordering is a window over conv_id (shuffle bounded by
conversation size); counts are map-side-combined groupBys; the
normalization join touches a roles²-sized table.

``turn_gaps``: response-latency statistics per (from_role, to_role) —
exact integer microsecond sums and counts (no distributed float sums, so
results are order-independent and cross-engine reproducible) plus the
derived mean for convenience.

``tool_sequences``: frequent n-grams over the TOOL column of tool-bearing
turns — "what does the agent call after X?" mined as one window + one
map-side-combined groupBy. The window shuffle is bounded by conversation
size (a conversation fits a partition buffer by construction — turns per
conversation is thousands, not billions), so the op scales linearly in
conversations.

``tool_runs``: maximal runs of consecutive identical tool calls inside a
conversation — the classic gaps-and-islands rewrite (two ``row_number``s
whose difference is constant within a run), used to flag agent retry
loops. The two windows partition by (conv) and (conv, tool): the second
exchange hash-partitions on a superset key of the first, so data already
grouped by conversation co-locates and both sorts are bounded by
conversation size.

Reference analog: none (the reference never looks at turn adjacency);
engine-new for the transcripts axis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def role_transitions(
    tr: DataFrame,
    conv_col: str = "conv_id",
    role_col: str = "role",
    order_cols: tuple[str, ...] = ("turn_idx",),
) -> DataFrame:
    """(from_role, to_role, cnt, prob): consecutive-turn role transition
    counts across all conversations, prob = cnt / Σ cnt over the same
    from_role (the Markov row normalization — one exact long division)."""
    w = Window.partitionBy(conv_col).orderBy(*[F.col(c) for c in order_cols])
    pairs = tr.select(
        F.col(role_col).alias("from_role"),
        F.lead(role_col).over(w).alias("to_role"),
    ).filter(F.col("to_role").isNotNull())
    counts = pairs.groupBy("from_role", "to_role").agg(
        F.count("*").alias("cnt")
    )
    tot = counts.groupBy("from_role").agg(F.sum("cnt").alias("_tot"))
    return (
        counts.join(F.broadcast(tot), "from_role")
        .select(
            "from_role",
            "to_role",
            "cnt",
            (F.col("cnt").cast("double") / F.col("_tot").cast("double")).alias(
                "prob"
            ),
        )
    )


def turn_gaps(
    tr: DataFrame,
    conv_col: str = "conv_id",
    role_col: str = "role",
    ts_col: str = "ts",
    order_cols: tuple[str, ...] = ("turn_idx",),
) -> DataFrame:
    """(from_role, to_role, n, sum_gap_us, mean_gap_us): response latency
    between consecutive turns. Gaps are exact integer microseconds (long),
    summed exactly — no distributed float accumulation — and the mean is a
    single final division."""
    w = Window.partitionBy(conv_col).orderBy(*[F.col(c) for c in order_cols])
    # parquet timestamps load as TIMESTAMP_NTZ; the session runs UTC
    # (session.py pins spark.sql.session.timeZone), so the NTZ→LTZ cast is
    # offset-free — and gaps are differences, so any constant offset cancels
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    pairs = (
        tr.select(
            F.col(role_col).alias("from_role"),
            F.lead(role_col).over(w).alias("to_role"),
            (F.lead(us).over(w) - us).alias("gap_us"),
        )
        .filter(F.col("to_role").isNotNull())
    )
    return pairs.groupBy("from_role", "to_role").agg(
        F.count("*").alias("n"),
        F.sum("gap_us").alias("sum_gap_us"),
    ).select(
        "from_role",
        "to_role",
        "n",
        "sum_gap_us",
        (F.col("sum_gap_us").cast("double") / F.col("n").cast("double")).alias(
            "mean_gap_us"
        ),
    )

def tool_sequences(
    tr: DataFrame,
    n: int = 2,
    conv_col: str = "conv_id",
    tool_col: str = "tool",
    order_cols: tuple[str, ...] = ("turn_idx",),
    min_count: int = 1,
) -> DataFrame:
    """(gram, cnt): frequency of every n-gram of consecutive TOOL calls.

    Rows whose ``tool`` is empty/null (non-tool turns) are dropped FIRST, so
    adjacency is over the tool-call subsequence of each conversation — the
    sequence an agent-behaviour analyst actually asks about. The gram is the
    '>'-joined tool chain (e.g. ``t1>t4``); grams never span conversations.

    Plan shape: filter (pushed to the scan) → one window partitioned by
    conversation → groupBy with map-side partial aggregation. No UDFs.
    """
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    w = Window.partitionBy(conv_col).orderBy(*[F.col(c) for c in order_cols])
    t = tr.filter(
        F.col(tool_col).isNotNull() & (F.col(tool_col) != "")
    ).select(conv_col, *order_cols, tool_col)
    steps = [F.col(tool_col)] + [
        F.lead(tool_col, i).over(w) for i in range(1, n)
    ]
    grams = t.select(F.concat_ws(">", *steps).alias("gram"), *[
        s.alias(f"_s{i}") for i, s in enumerate(steps)
    ][n - 1:])
    # the last lead is null on the tail of each conversation: drop partials
    grams = grams.filter(F.col(f"_s{n - 1}").isNotNull()).select("gram")
    out = grams.groupBy("gram").agg(F.count("*").alias("cnt"))
    if min_count > 1:
        out = out.filter(F.col("cnt") >= min_count)
    return out


def tool_runs(
    tr: DataFrame,
    min_len: int = 2,
    conv_col: str = "conv_id",
    tool_col: str = "tool",
    order_cols: tuple[str, ...] = ("turn_idx",),
) -> DataFrame:
    """(conv_id, tool, start_idx, run_len): maximal runs of >= min_len
    CONSECUTIVE identical tool calls within a conversation — the retry-loop
    detector. Gaps-and-islands: among tool-bearing turns ordered by turn,
    ``row_number() - row_number() per tool`` is constant exactly within a
    run; grouping on that island id yields one row per maximal run.
    """
    if min_len < 1:
        raise ValueError(f"min_len must be >= 1, got {min_len}")
    order = [F.col(c) for c in order_cols]
    w_all = Window.partitionBy(conv_col).orderBy(*order)
    w_tool = Window.partitionBy(conv_col, tool_col).orderBy(*order)
    t = tr.filter(
        F.col(tool_col).isNotNull() & (F.col(tool_col) != "")
    ).select(conv_col, *order_cols, tool_col)
    islands = t.select(
        F.col(conv_col).alias("conv_id"),
        F.col(tool_col).alias("tool"),
        F.col(order_cols[0]).alias("_ord"),
        (F.row_number().over(w_all) - F.row_number().over(w_tool)).alias(
            "_isl"
        ),
    )
    return (
        islands.groupBy("conv_id", "tool", "_isl")
        .agg(
            F.min("_ord").alias("start_idx"),
            F.count("*").alias("run_len"),
        )
        .filter(F.col("run_len") >= min_len)
        .select("conv_id", "tool", "start_idx", "run_len")
    )


def topic_boundaries(transcripts: DataFrame, w: int = 3) -> DataFrame:
    """TextTiling-style topic-shift scores at every turn boundary.

    For the boundary between turn ``b`` and ``b+1`` of each conversation,
    compare the DISTINCT token sets of the ``w`` turns ending at ``b``
    (left window) and the ``w`` turns starting at ``b+1`` (right window):
    low Jaccard overlap marks a topic shift (Hearst, "TextTiling",
    Computational Linguistics 1997 — the lexical-cohesion signal, computed
    set-exactly instead of via smoothed cosine). Windows truncate at
    conversation edges. Returns one row per interior boundary:
    (conv_id, boundary, inter, union_sz, jaccard_e6) with
    ``jaccard_e6 = (inter * 1e6) div union_sz`` — exact integers.

    Scale shape — NO per-conversation buffers anywhere: tokens explode to
    (conv, turn, token) distinct rows; each token row fans out to at most
    ``2w`` boundary keys (``sequence`` + explode, a constant); presence
    and overlap are two map-side-combined groupBys on (conv, boundary[,
    token]). The only join is the per-conversation max-turn table for
    edge trimming. Work is O(tokens · w), independent of conversation
    count or length skew.
    """
    if w < 1:
        raise ValueError(f"w must be >= 1, got {w}")
    toks = (
        transcripts.select(
            "conv_id",
            F.col("turn_idx").cast("long").alias("turn_idx"),
            F.explode(F.split(F.col("text"), " ")).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .distinct()
    )
    lhs = toks.select(
        "conv_id",
        F.explode(
            F.sequence(F.col("turn_idx"), F.col("turn_idx") + (w - 1))
        ).alias("b"),
        "tok",
        F.lit(1).alias("l"),
        F.lit(0).alias("r"),
    )
    rhs = toks.select(
        "conv_id",
        F.explode(
            F.sequence(F.col("turn_idx") - w, F.col("turn_idx") - 1)
        ).alias("b"),
        "tok",
        F.lit(0).alias("l"),
        F.lit(1).alias("r"),
    )
    pres = (
        lhs.unionByName(rhs)
        .groupBy("conv_id", "b", "tok")
        .agg(F.max("l").alias("l"), F.max("r").alias("r"))
    )
    agg = pres.groupBy("conv_id", "b").agg(
        F.sum((F.col("l") * F.col("r"))).cast("long").alias("inter"),
        F.count("*").cast("long").alias("union_sz"),
    )
    nmax = transcripts.groupBy("conv_id").agg(
        F.max(F.col("turn_idx").cast("long")).alias("_mx")
    )
    return (
        agg.join(nmax, "conv_id")
        .filter((F.col("b") >= 0) & (F.col("b") < F.col("_mx")))
        .select(
            "conv_id",
            F.col("b").cast("long").alias("boundary"),
            "inter",
            "union_sz",
            F.expr("(inter * 1000000) div union_sz").cast("long").alias(
                "jaccard_e6"
            ),
        )
    )


def context_windows(
    transcripts: DataFrame, k: int = 4, sep: str = "\x1f"
) -> DataFrame:
    """SFT training-pair construction: each turn paired with the
    concatenation of its previous ``k`` turns (in order, ``sep``-joined).

    The conversation → (context, target) flattening every supervised
    fine-tuning pipeline needs. One ordered window per conversation with a
    ``k``-row frame — per-row state is bounded by k texts, NOT by
    conversation length, so a 10^12-turn corpus with million-turn
    conversations still plans as a single sort-based window (spillable)
    with no unbounded collect buffers. First turns get an empty context.

    Returns (conv_id, turn_idx, role, text, context).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(-k, -1)
    )
    return transcripts.select(
        "conv_id",
        F.col("turn_idx").cast("long").alias("turn_idx"),
        "role",
        "text",
        F.array_join(F.collect_list("text").over(w), sep).alias("context"),
    )


def conversation_stats(transcripts: DataFrame) -> DataFrame:
    """Per-conversation rollup — the first table any transcript pipeline
    materializes: turn/role/tool counts, role entropy, text volume,
    wall-clock span.

    Role entropy (bits) uses the engine's quantized-log convention
    (diversity.unigram_entropy): per-(conv, role) counts, ``log2(c)``
    e9-quantized per count before the order-free integer sum, one scalar
    double chain per conversation. Everything else is exact integers
    (chars, tool turns, epoch-second spans). Two shuffles, both keyed on
    conv_id — state per group is role-cardinality-bounded.

    Returns ``(conv_id, n_turns, n_roles, role_entropy_e6,
    n_tool_turns, tool_rate_e6, total_chars, mean_chars_e6,
    duration_s)``.
    """
    rc = transcripts.groupBy("conv_id", "role").agg(
        F.count("*").cast("long").alias("c")
    )
    ent = rc.groupBy("conv_id").agg(
        F.sum(
            F.col("c").cast("decimal(38,0)")
            * F.floor(
                F.log2(F.col("c").cast("double")) * 1_000_000_000
                + F.lit(0.5)
            ).cast("decimal(38,0)")
        ).alias("_s"),
        F.sum("c").cast("long").alias("n_turns"),
        F.count("*").cast("long").alias("n_roles"),
    )
    n_d = F.col("n_turns").cast("double")
    ent = ent.select(
        "conv_id",
        "n_turns",
        "n_roles",
        F.floor(
            (
                F.log2(n_d)
                - F.col("_s").cast("double") / (n_d * F.lit(1e9))
            )
            * 1_000_000
            + F.lit(0.5)
        )
        .cast("long")
        .alias("role_entropy_e6"),
    )
    base = transcripts.groupBy("conv_id").agg(
        F.sum(
            F.when(F.col("tool") != "", 1).otherwise(0)
        )
        .cast("long")
        .alias("n_tool_turns"),
        F.sum(F.length("text").cast("long")).cast("long").alias(
            "total_chars"
        ),
        (
            F.max(F.unix_timestamp("ts").cast("long"))
            - F.min(F.unix_timestamp("ts").cast("long"))
        ).alias("duration_s"),
    )
    return ent.join(base, "conv_id").select(
        "conv_id",
        "n_turns",
        "n_roles",
        "role_entropy_e6",
        "n_tool_turns",
        F.floor(
            F.col("n_tool_turns").cast("double")
            * F.lit(1e6)
            / F.col("n_turns").cast("double")
            + F.lit(0.5)
        )
        .cast("long")
        .alias("tool_rate_e6"),
        "total_chars",
        F.floor(
            F.col("total_chars").cast("double")
            * F.lit(1e6)
            / F.col("n_turns").cast("double")
            + F.lit(0.5)
        )
        .cast("long")
        .alias("mean_chars_e6"),
        "duration_s",
    )
