"""Behavioral / product analytics over the event stream: funnels, cohort
retention, session paths.

Engine-new surface (the reference processes static citation metadata — its
closest shape is the per-domain rollup in ``/root/reference/
halvesting_geometric/utils/data/link_prediction_metadata.py``); a
transcript/event corpus at 10^12-turn scale needs exactly these three
questions answered: do users progress through an ordered set of actions
(funnel), do they come back (cohorts), and what do their sessions look like
(paths).

All three are single-shuffle-per-stage DataFrame plans: conditional
aggregations for the funnel (one groupBy per step, each a map-side partial
agg), one groupBy + join for cohorts, a per-session sorted collect bounded
by session length for paths. No UDFs, no collects, no windows over
unbounded partitions.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from halvesting_geometric_spark.operators.events import sessionize


def funnel_steps(
    events: DataFrame, steps: Sequence[str]
) -> DataFrame:
    """Ordered funnel completion per user.

    A user completes step i when an event of type ``steps[i]`` occurs at or
    after their completion time of step i-1 (classic unordered-window
    funnel: earliest valid completion per step, ties allowed at equal
    timestamps). Returns (user_id, steps_completed, t_1..t_k) with the
    completion timestamp per reached step (null past the last).

    The plan is k conditional-min aggregations: step 1 is a plain groupBy;
    each later step filters events to the step's type, joins the (small,
    one-row-per-user) frontier, and takes the min eligible timestamp —
    every stage shuffles once on user_id and AQE broadcasts the frontier
    when it fits.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    cur = (
        events.filter(F.col("event_type") == steps[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_1"))
    )
    for i, step in enumerate(steps[1:], start=2):
        nxt = (
            events.filter(F.col("event_type") == step)
            .select("user_id", "ts")
            .join(cur.select("user_id", F.col(f"t_{i-1}").alias("_prev")), "user_id")
            .filter(F.col("ts") >= F.col("_prev"))
            .groupBy("user_id")
            .agg(F.min("ts").alias(f"t_{i}"))
        )
        cur = cur.join(nxt, "user_id", "left")
    completed = F.lit(0)
    for i in range(1, len(steps) + 1):
        completed = completed + F.when(F.col(f"t_{i}").isNotNull(), 1).otherwise(0)
    return cur.select(
        "user_id",
        completed.cast("long").alias("steps_completed"),
        *[f"t_{i}" for i in range(1, len(steps) + 1)],
    )


def cohort_retention(events: DataFrame, bucket: str = "week") -> DataFrame:
    """Cohort retention table: users grouped by first-activity bucket, then
    counted per later activity bucket.

    Returns (cohort, offset, n_users): ``cohort`` is each user's first
    ``date_trunc(bucket)`` period, ``offset`` the whole-period distance of
    an active bucket from the cohort start, ``n_users`` the distinct users
    of that cohort active at that offset (offset 0 row = cohort size).
    Two shuffles: first-activity groupBy, then the (user, bucket) distinct
    + join + count — the join side of cohorts is one row per user.

    Supported buckets: hour/day/week (fixed-width, offset = whole-period
    seconds distance) and month/year (calendar-width, offset via
    ``months_between`` — month starts are not a fixed number of seconds
    apart, so a seconds divisor would silently miscount them). Any other
    unit raises ``ValueError`` rather than producing wrong offsets.
    """
    _SECONDS = {"hour": 3600, "day": 86400, "week": 604800}
    if bucket not in _SECONDS and bucket not in ("month", "year"):
        raise ValueError(
            f"cohort_retention: unsupported bucket {bucket!r}; "
            "expected one of hour/day/week/month/year"
        )
    firsts = events.groupBy("user_id").agg(
        F.date_trunc(bucket, F.min("ts")).alias("cohort")
    )
    active = (
        events.select(
            "user_id", F.date_trunc(bucket, F.col("ts")).alias("b")
        ).distinct()
    )
    if bucket in _SECONDS:
        offset = F.floor(
            (
                F.unix_timestamp(F.col("b").cast("timestamp"))
                - F.unix_timestamp(F.col("cohort").cast("timestamp"))
            )
            / F.lit(_SECONDS[bucket])
        )
    else:
        # Truncated bucket starts are exact month boundaries, so
        # months_between is integral; /12 for whole-year offsets.
        months = F.round(
            F.months_between(
                F.col("b").cast("timestamp"), F.col("cohort").cast("timestamp")
            )
        )
        offset = months / 12 if bucket == "year" else months
    per = active.join(firsts, "user_id").select(
        "user_id",
        "cohort",
        offset.cast("long").alias("offset"),
    )
    return (
        per.groupBy("cohort", "offset")
        .agg(F.count_distinct("user_id").cast("long").alias("n_users"))
    )


def session_paths(
    events: DataFrame,
    gap_minutes: int = 30,
    max_len: int = 12,
    min_count: int = 2,
) -> DataFrame:
    """Most common session paths: the ordered event-type sequence of each
    session (first ``max_len`` events, '>'-joined), counted across sessions.

    Sessionization reuses :func:`sessionize`; the per-session sequence is a
    sort_array(collect_list(struct(ts, event_id, type))) bounded by
    ``max_len`` — state per group is capped, so a runaway session cannot
    blow an aggregation buffer. Returns (path, n_sessions) with
    ``n_sessions >= min_count``.
    """
    sess = sessionize(events, gap_minutes=gap_minutes)
    w = Window.partitionBy("user_id", "session_id").orderBy("ts", "event_id")
    seq = (
        sess.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_len)
        .groupBy("user_id", "session_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.struct(F.col("_rn").alias("r"), F.col("event_type").alias("t"))
                        )
                    ),
                    lambda s: s["t"],
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        seq.groupBy("path")
        .agg(F.count("*").cast("long").alias("n_sessions"))
        .filter(F.col("n_sessions") >= min_count)
    )


def engagement_gini(
    events: DataFrame,
    group_col: str = "event_type",
    actor_col: str = "user_id",
) -> DataFrame:
    """Gini coefficient of engagement inequality per group, exact integers.

    How concentrated is activity among actors — the skew probe that says
    whether per-actor partitioning will hot-spot. Per (group, actor)
    activity counts are ranked ascending (ties broken by actor id, so the
    rank assignment is deterministic and cross-engine identical; the Gini
    value itself is tie-order invariant since tied x contribute the same
    total either way), then the classic rank form
    ``G = Σ(2i − n − 1)·x_i / (n·Σx)`` — numerator and denominator are
    exact longs, emitted as ``gini_e6 = (num·1e6) div den``.

    Two map-side-combined groupBys + one per-group rank window (state
    bounded by actors-per-group); no floats anywhere.
    """
    cnt = (
        events.groupBy(group_col, actor_col)
        .agg(F.count("*").cast("long").alias("x"))
    )
    w = Window.partitionBy(group_col).orderBy("x", actor_col)
    ranked = cnt.withColumn("i", F.row_number().over(w).cast("long"))
    return (
        ranked.groupBy(group_col)
        .agg(
            F.count("*").cast("long").alias("n_actors"),
            F.sum("x").cast("long").alias("total"),
            F.sum((F.lit(2) * F.col("i")) * F.col("x"))
            .cast("long")
            .alias("s2ix"),
        )
        .withColumn(
            "num",
            F.col("s2ix") - (F.col("n_actors") + 1) * F.col("total"),
        )
        .select(
            group_col,
            "n_actors",
            "total",
            F.expr("(num * 1000000) div (n_actors * total)")
            .cast("long")
            .alias("gini_e6"),
        )
    )


def association_rules(
    baskets: DataFrame,
    basket_cols: Sequence[str] = ("user_id",),
    item_col: str = "event_type",
    min_support: int = 1,
) -> DataFrame:
    """Directional pairwise association rules a -> b over item baskets.

    ``baskets`` is any table whose rows are (basket key columns, item); the
    basket is the DISTINCT item set per key. For every ordered pair of
    distinct items with joint support >= ``min_support``:

        (antecedent, consequent, support, confidence_e6, lift_e6)

    support       = #baskets containing both items (exact long),
    confidence_e6 = round-half-up fixed point of support / #baskets(a),
    lift_e6       = same of support*N / (#baskets(a) * #baskets(b)),

    the classic Agrawal support/confidence/lift triple with no float until
    the single final division (N*support*1e6 stays inside the double-exact
    2^53 window up to ~10^7-basket corpora; past that pre-divide the lift
    by one side's support before scaling).

    Scale shape: one distinct-projection shuffle to the (basket, item) set,
    one self-join keyed on the basket (each basket contributes
    |items|*(|items|-1) pairs — bounded by the per-basket distinct-item
    count, NOT the raw event count), one map-side-combined pair groupBy,
    and two broadcast joins against the item-support table (|items| rows).
    The basket count rides along as a broadcast cross join — no collect.
    """
    if min_support < 1:
        raise ValueError(f"min_support must be >= 1, got {min_support}")
    keys = list(basket_cols)
    # Basket key is a struct of the actual key columns: no concat collisions
    # (('a','bc') vs ('ab','c')) and NULL fields stay positionally distinct,
    # unlike concat_ws which silently skips them.
    bi = (
        baskets.select(
            F.struct(*[F.col(k) for k in keys]).alias("_b"),
            F.col(item_col).cast("string").alias("item"),
        )
        .dropDuplicates(["_b", "item"])
        .persist()
    )
    n_baskets = bi.select("_b").distinct().agg(
        F.count("*").cast("long").alias("n_baskets")
    )
    isup = bi.groupBy("item").agg(F.count("*").cast("long").alias("s"))
    pairs = (
        bi.alias("x")
        .join(bi.alias("y"), "_b")
        .filter(F.col("x.item") != F.col("y.item"))
        .groupBy(
            F.col("x.item").alias("antecedent"),
            F.col("y.item").alias("consequent"),
        )
        .agg(F.count("*").cast("long").alias("support"))
        .filter(F.col("support") >= min_support)
    )
    out = (
        pairs.join(
            F.broadcast(
                isup.select(
                    F.col("item").alias("antecedent"), F.col("s").alias("sa")
                )
            ),
            "antecedent",
        )
        .join(
            F.broadcast(
                isup.select(
                    F.col("item").alias("consequent"), F.col("s").alias("sb")
                )
            ),
            "consequent",
        )
        .join(F.broadcast(n_baskets))
        .select(
            "antecedent",
            "consequent",
            "support",
            F.floor(
                F.col("support") * 1_000_000.0 / F.col("sa") + F.lit(0.5)
            )
            .cast("long")
            .alias("confidence_e6"),
            F.floor(
                (F.col("support") * F.col("n_baskets")) * 1_000_000.0
                / (F.col("sa") * F.col("sb"))
                + F.lit(0.5)
            )
            .cast("long")
            .alias("lift_e6"),
        )
    )
    out = out.localCheckpoint(eager=True)
    bi.unpersist()
    return out


def frequent_sequences(
    events: DataFrame,
    session_col: str = "conv_id",
    order_col: str = "turn_idx",
    item_col: str = "role",
    min_support: int = 1,
    max_len: int = 3,
    max_vocab: int | None = 64,
) -> DataFrame:
    """Frequent sequential patterns (PrefixSpan-style support counting,
    Pei et al. ICDE 2001 semantics) of length 2 and 3 over per-session
    item sequences.

    A pattern <a, b> (resp. <a, b, c>) is SUPPORTED by a session when its
    items occur at strictly increasing ``order_col`` positions, any gap
    allowed — the classic subsequence relation, items may repeat. Support
    = number of distinct sessions containing the pattern. Returns
    (pattern, length, support) with ``pattern`` the '>'-joined item string,
    ``support >= min_support``.

    Instead of growing projected databases (PrefixSpan's recursion —
    driver-side and depth-bound), each length is one closed-form
    existence test over per-session item statistics:

    * length 2: <a,b> ⊆ session  ⇔  min_pos(a) < max_pos(b) — two numbers
      per (session, item), so the candidate join is |items|² per session
      on the tiny stats table, never on raw occurrences.
    * length 3: <a,b,c> ⊆ session  ⇔  some occurrence position o of b has
      min_pos(a) < o < max_pos(c) — one join of the b-occurrence list
      against the same stats table, |occ|·|items|² candidates per session
      bounded by the item VOCABULARY (event/role types), not by pairs of
      raw events.

    Scale shape: one groupBy to (session, item, min_pos, max_pos), self
    joins keyed on the session (co-partitioned, no broadcast of raw data),
    distinct + map-side-combined count per pattern. Pattern-space blowup
    is inherent to sequence mining; with categorical vocabularies (roles,
    event types, tool names) the candidate space is |V|³ per session and
    ``min_support`` prunes the global result.

    ``max_vocab`` guards that blowup: the distinct-item count is measured
    first (one cheap aggregation) and a ``ValueError`` is raised above the
    threshold — the len-3 candidate term is |occ|·|V|² per session, which is
    fine for role/tool vocabularies but catastrophic for free-form item
    columns (user ids, texts). Pass ``max_vocab=None`` to opt out
    explicitly.
    """
    if min_support < 1:
        raise ValueError(f"min_support must be >= 1, got {min_support}")
    if max_len not in (2, 3):
        raise ValueError(f"max_len must be 2 or 3, got {max_len}")
    occ = events.select(
        F.col(session_col).cast("string").alias("s"),
        F.col(item_col).cast("string").alias("item"),
        F.col(order_col).cast("long").alias("o"),
    )
    if max_vocab is not None:
        n_items = occ.select("item").distinct().limit(max_vocab + 1).count()
        if n_items > max_vocab:
            raise ValueError(
                f"frequent_sequences: item column {item_col!r} has more than "
                f"max_vocab={max_vocab} distinct values; the length-3 "
                "candidate join is |occurrences|*|vocab|^2 per session. Use "
                "a categorical item column, or pass max_vocab=None to opt "
                "in to the blowup."
            )
    stats = occ.groupBy("s", "item").agg(
        F.min("o").alias("mn"), F.max("o").alias("mx")
    ).persist()
    stats.count()
    len2 = (
        stats.alias("a")
        .join(stats.alias("b"), "s")
        .filter(F.col("a.mn") < F.col("b.mx"))
        .groupBy(
            F.col("a.item").alias("p1"), F.col("b.item").alias("p2")
        )
        .agg(F.count("*").cast("long").alias("support"))
        .select(
            F.concat_ws(">", "p1", "p2").alias("pattern"),
            F.lit(2).cast("long").alias("length"),
            "support",
        )
    )
    out = len2
    if max_len == 3:
        len3 = (
            occ.alias("b")
            .join(stats.alias("a"), "s")
            .filter(F.col("a.mn") < F.col("b.o"))
            .join(stats.alias("c"), "s")
            .filter(F.col("c.mx") > F.col("b.o"))
            .select(
                "s",
                F.col("a.item").alias("p1"),
                F.col("b.item").alias("p2"),
                F.col("c.item").alias("p3"),
            )
            .distinct()
            .groupBy("p1", "p2", "p3")
            .agg(F.count("*").cast("long").alias("support"))
            .select(
                F.concat_ws(">", "p1", "p2", "p3").alias("pattern"),
                F.lit(3).cast("long").alias("length"),
                "support",
            )
        )
        out = len2.unionByName(len3)
    out = out.filter(F.col("support") >= min_support).localCheckpoint(
        eager=True
    )
    stats.unpersist()
    return out
