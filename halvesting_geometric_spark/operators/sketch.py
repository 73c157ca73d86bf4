"""Count-min sketch and heavy hitters — mergeable frequency estimation
for key spaces too large to count exactly (Cormode & Muthukrishnan,
J. Algorithms 2005 — public paper).

The sketch is a depth × width counter grid: row d counts each key at
bucket ``hash_d(key) mod width``; the frequency estimate is the MIN over
the depth rows (never an underestimate; overestimates only when a key
collides in *every* row). Two sketches over disjoint data merge by
element-wise addition — the property that makes this the standard
100 TB / streaming primitive: each partition (or micro-batch, or day of
logs) sketches independently, and the depth·width-bounded partials fold
associatively.

Spark-first shape: building the sketch is one ``explode(depth)`` +
hash-aggregate — partial (map-side) aggregation caps the shuffle at
depth·width rows per partition regardless of input size, and the result
is a SPARSE (row, bucket, cnt) DataFrame (missing cell = 0). No
driver-side state, no UDFs — the hash, bucket, and counters are all
Catalyst expressions inside whole-stage codegen.

``heavy_hitters`` composes the scalable candidate pattern: per-partition
local top-c candidate keys (any key with global share ≥ 1/c must be a
local top-c key in at least one partition, the Misra-Gries guarantee),
then the union of candidates is scored against the global sketch and
exact-top-k'd. The candidate table is partitions·c rows — bounded — and
never touches the full distinct-key space.

Hash selection follows the repo convention (sampling.hash64):
``xxhash64`` is the scale default; ``portable`` makes every counter and
estimate bit-reproducible in DuckDB for the ``cms_hh`` correctness gate.

Reference scope note: the reference engine has no sketches (it counts
exactly in pandas/dask); this operator is part of the training-data
pipeline surface the builder's brief asks for beyond reference parity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from halvesting_geometric_spark.operators.sampling import hash64


def _key_col(key: Column | str) -> Column:
    return F.col(key) if isinstance(key, str) else key


def _bucket(method: str, key: Column, d: int, width: int) -> Column:
    return F.pmod(hash64(method, key, seed=d), F.lit(width))


def count_min_sketch(
    df: DataFrame,
    key: Column | str,
    depth: int = 4,
    width: int = 2048,
    weight: Column | str | None = None,
    hash_method: str = "xxhash64",
) -> DataFrame:
    """Sparse sketch (row, bucket, cnt) of the key column's frequencies
    (or ``weight`` sums). One explode + one hash aggregate; the shuffle
    is bounded by depth·width rows per map partition."""
    k = _key_col(key).cast("string")
    w = (
        F.lit(1).cast("long")
        if weight is None
        else (F.col(weight) if isinstance(weight, str) else weight).cast("long")
    )
    cells = F.array(
        *[
            F.struct(
                F.lit(d).cast("int").alias("row"),
                _bucket(hash_method, k, d, width).alias("bucket"),
            )
            for d in range(depth)
        ]
    )
    return (
        df.select(F.explode(cells).alias("c"), w.alias("w"))
        .groupBy(F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
        .agg(F.sum("w").alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Element-wise sum of same-shaped sketches (sparse union + re-agg).
    sketch(A ∪ B) == merge(sketch(A), sketch(B)) exactly — the fold that
    lets partitions/batches/days sketch independently."""
    if not sketches:
        raise ValueError("need at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key: Column | str = "key",
    depth: int = 4,
    width: int = 2048,
    hash_method: str = "xxhash64",
) -> DataFrame:
    """(key, est): min-over-rows counter per candidate key. depth/width/
    hash_method must match the sketch's build parameters. The candidate
    table is expected small (broadcast side); the sketch is at most
    depth·width rows, so this join never shuffles the raw data."""
    k = _key_col(key).cast("string")
    probes = keys.select(
        k.alias("key"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).cast("int").alias("row"),
                        _bucket(hash_method, k, d, width).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("c"),
    ).select("key", F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
    joined = probes.join(F.broadcast(sketch), ["row", "bucket"], "left").select(
        "key", F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt")
    )
    return joined.groupBy("key").agg(F.min("cnt").alias("est"))


def heavy_hitters(
    df: DataFrame,
    key: Column | str,
    k: int = 10,
    depth: int = 4,
    width: int = 2048,
    candidates_per_partition: int = 256,
    hash_method: str = "xxhash64",
) -> DataFrame:
    """Top-k keys by CMS-estimated frequency: (key, est), ranked
    (est desc, key asc). Candidates are each partition's local top-c keys
    (c = ``candidates_per_partition``) — any key with global share
    ≥ 1/c is a local top-c key somewhere, so the true heavy set is
    covered without ever materializing the full distinct-key space; the
    candidate union is partitions·c rows. Estimates come from the global
    sketch, so ranks reflect ALL occurrences even for keys that were
    local candidates in only one partition."""
    from pyspark.sql import Window

    sk = count_min_sketch(
        df, key, depth=depth, width=width, hash_method=hash_method
    )
    kc = _key_col(key).cast("string")
    local = (
        df.select(F.spark_partition_id().alias("pid"), kc.alias("key"))
        .groupBy("pid", "key")
        .agg(F.count("*").alias("n"))
    )
    wloc = Window.partitionBy("pid").orderBy(
        F.col("n").desc(), F.col("key").asc()
    )
    cand = (
        local.withColumn("rn", F.row_number().over(wloc))
        .filter(F.col("rn") <= candidates_per_partition)
        .select("key")
        .distinct()
    )
    est = cms_estimate(
        sk, cand, key="key", depth=depth, width=width, hash_method=hash_method
    )
    wtop = Window.orderBy(F.col("est").desc(), F.col("key").asc())
    return (
        est.withColumn("rn", F.row_number().over(wtop))
        .filter(F.col("rn") <= k)
        .select("key", "est")
    )

# ---------------------------------------------------------------------------
# HyperLogLog — mergeable approximate distinct counting
# (Flajolet, Fusy, Gandouet & Meunier, AofA 2007 — public paper)
# ---------------------------------------------------------------------------

_HLL_BITS = 60  # both hash methods are masked to 60 bits (portable_hash64
# emits 60; xxhash64 is masked) so the register math is method-independent
# and the DuckDB oracle twin replicates it bit-for-bit.


def hll_sketch(
    df: DataFrame,
    key: Column | str,
    group_cols: tuple[str, ...] = (),
    lgk: int = 12,
    hash_method: str = "xxhash64",
) -> DataFrame:
    """Sparse HLL registers per group: (group..., reg, rho).

    ``reg`` = low ``lgk`` hash bits; ``rho`` = leading-zero count of the
    remaining ``60-lgk`` bits + 1 (the Flajolet position-of-first-one
    observable). Only NON-EMPTY registers are materialized — the shuffle per
    group is capped at 2^lgk rows regardless of input size (the map-side
    partial MAX folds everything else), which is what makes this the
    standard 100 TB cardinality primitive: count distinct users per
    (day, tool) over arbitrarily many events with bounded state.

    Merging sketches over disjoint (or overlapping!) data = elementwise MAX
    (:func:`hll_merge`); estimation = :func:`hll_estimate`. All Catalyst
    expressions inside whole-stage codegen — no UDFs, no driver state.
    """
    if not 4 <= lgk <= 16:
        raise ValueError(f"lgk must be in [4, 16], got {lgk}")
    m = 1 << lgk
    k = _key_col(key)
    h = hash64(hash_method, k, seed=0).bitwiseAND(F.lit((1 << _HLL_BITS) - 1))
    reg = F.pmod(h, F.lit(m)).cast("int")
    w = F.shiftright(h, lgk)
    width = _HLL_BITS - lgk
    rho = (
        F.when(w == 0, F.lit(width + 1))
        .otherwise(F.lit(width + 1) - F.length(F.bin(w)))
        .cast("int")
    )
    return (
        df.select(*group_cols, reg.alias("reg"), rho.alias("rho"))
        .groupBy(*group_cols, "reg")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(
    *sketches: DataFrame, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Fold any number of (group..., reg, rho) sketches into one by
    elementwise register MAX — associative, commutative, idempotent, so
    per-partition / per-day / per-source partials fold in any order."""
    if not sketches:
        raise ValueError("need at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy(*group_cols, "reg").agg(F.max("rho").alias("rho"))


def _hll_alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_estimate(
    sketch: DataFrame,
    group_cols: tuple[str, ...] = (),
    lgk: int = 12,
) -> DataFrame:
    """(group..., approx_distinct): the HLL estimate per group.

    Raw estimate alpha_m * m^2 / sum_j 2^-M_j with the standard small-range
    linear-counting correction (E <= 2.5m and empty registers exist ->
    m * ln(m / V)). The harmonic sum runs in exact integer arithmetic
    (DECIMAL(38,0) of 2^(64-rho); absent registers contribute 2^64 each) so
    the estimate is independent of aggregation order; the final
    alpha/division/log are one deterministic double expression. With 60-bit
    hashes the 32-bit large-range correction never applies (collision odds
    at 10^12 keys ~ 10^24/2^61 — negligible); relative error ~ 1.04/sqrt(m).
    """
    m = 1 << lgk
    two64 = 18446744073709551616.0  # 2^64, exact in double
    agg = sketch.groupBy(*group_cols).agg(
        F.count("*").alias("_present"),
        F.sum(
            F.pow(F.lit(2.0), F.lit(64) - F.col("rho")).cast("decimal(38,0)")
        ).alias("_s_present"),
    )
    s_dbl = (
        (F.lit(float(m)) - F.col("_present").cast("double")) * F.lit(two64)
        + F.col("_s_present").cast("double")
    )
    raw = F.lit(_hll_alpha(m) * m * m * two64) / s_dbl
    v = F.lit(m) - F.col("_present")  # empty registers
    lc = F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double"))
    est = F.when((raw <= F.lit(2.5 * m)) & (v > 0), lc).otherwise(raw)
    return agg.select(*group_cols, est.alias("approx_distinct"))


def approx_distinct(
    df: DataFrame,
    key: Column | str,
    group_cols: tuple[str, ...] = (),
    lgk: int = 12,
    hash_method: str = "xxhash64",
) -> DataFrame:
    """Sketch + estimate in one call: (group..., approx_distinct)."""
    return hll_estimate(
        hll_sketch(df, key, group_cols, lgk, hash_method),
        group_cols,
        lgk,
    )

# ---------------------------------------------------------------------------
# Bloom filter — mergeable approximate membership
# (Bloom, CACM 1970; partitioned-position variant — public knowledge)
# ---------------------------------------------------------------------------


def bloom_sketch(
    df: DataFrame,
    key: Column | str,
    group_cols: tuple[str, ...] = (),
    m_bits: int = 1 << 20,
    k: int = 5,
    hash_method: str = "xxhash64",
) -> DataFrame:
    """Sparse Bloom filter per group: (group..., pos) — the DISTINCT set of
    set bit positions. Sparse representation keeps the op a plain
    aggregation: the shuffle per group is capped at ``m_bits`` rows no
    matter how many input rows hash into it (map-side distinct folds
    duplicates), and merging filters over disjoint or overlapping data is
    just union+distinct (:func:`bloom_merge`) — associative, commutative,
    idempotent, the property that lets per-partition / per-day partials
    fold in any order at 100 TB.

    ``k`` independent positions per key come from seeding the selected
    64-bit hash with ``0..k-1`` (same convention as the count-min rows).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if m_bits < 2:
        raise ValueError(f"m_bits must be >= 2, got {m_bits}")
    kc = _key_col(key).cast("string")
    pos = F.explode(
        F.array(*[_bucket(hash_method, kc, d, m_bits) for d in range(k)])
    ).alias("pos")
    return df.select(*group_cols, pos).distinct()


def bloom_merge(*sketches: DataFrame) -> DataFrame:
    """Union of set positions — folding filters built over any data split."""
    if not sketches:
        raise ValueError("need at least one sketch")
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.distinct()


def bloom_probe(
    df: DataFrame,
    key: Column | str,
    bloom: DataFrame,
    m_bits: int = 1 << 20,
    k: int = 5,
    hash_method: str = "xxhash64",
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Append boolean ``maybe_present``: True iff ALL ``k`` positions of the
    key are set (never a false negative; false-positive odds ~
    (1-e^{-kn/m})^k). Distributed probe: k candidate rows per input row
    semi-matched against the (bounded, often broadcastable) position table,
    then ``count == k`` per row — no driver-side bitmap, no UDF. The classic
    100 TB use: build the filter on the small join side, probe-prune the big
    side before the real shuffle join."""
    kc = _key_col(key).cast("string")
    probe = df.select(
        *group_cols,
        kc.alias("_bk"),
    ).distinct()
    cand = probe.select(
        *group_cols,
        "_bk",
        F.explode(
            F.array(
                *[_bucket(hash_method, F.col("_bk"), d, m_bits) for d in range(k)]
            )
        ).alias("pos"),
    )
    hits = (
        cand.join(bloom, [*group_cols, "pos"], "left_semi")
        .groupBy(*group_cols, "_bk")
        .agg(F.count("*").alias("_hits"))
        .filter(F.col("_hits") == k)
        .select(*group_cols, "_bk", F.lit(True).alias("maybe_present"))
    )
    return (
        df.withColumn("_bk", kc)
        .join(hits, [*group_cols, "_bk"], "left")
        .withColumn(
            "maybe_present", F.coalesce(F.col("maybe_present"), F.lit(False))
        )
        .drop("_bk")
    )


def bloom_pack(bloom: DataFrame, group_cols: tuple[str, ...] = ()) -> DataFrame:
    """Pack a sparse position table into 64-bit words: (group..., word,
    bits) with ``bits`` = OR of ``1 << (pos % 64)`` over the word's set
    positions. 64× fewer rows than the sparse form (m_bits=2^24 → 2^18
    longs ≈ 4 MB), which is what makes :func:`bloom_probe_packed`'s filter
    side BROADCASTABLE at realistic sizes. Pure shift/or aggregation;
    re-packing a packed-then-unpacked filter is a fixpoint."""
    return (
        bloom.select(
            *group_cols,
            F.shiftright(F.col("pos"), 6).alias("word"),
            F.expr("shiftleft(1L, CAST(pos % 64 AS INT))").alias("_b"),
        )
        .groupBy(*group_cols, "word")
        .agg(F.bit_or("_b").alias("bits"))
    )


def bloom_probe_packed(
    df: DataFrame,
    key: Column | str,
    packed: DataFrame,
    m_bits: int = 1 << 20,
    k: int = 5,
    hash_method: str = "xxhash64",
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """:func:`bloom_probe` against a word-packed filter (:func:`bloom_pack`).

    Same result, different physical plan: the k candidate positions join the
    (64× smaller, normally broadcast) word table on ``pos >> 6`` and each
    membership test is one shift/AND — the probe becomes a map-side pass
    over the fact side with no shuffle of fact rows at all when the filter
    broadcasts. This is the shape to use when pruning a 100 TB fact table
    against a dimension-side filter."""
    kc = _key_col(key).cast("string")
    probe = df.select(*group_cols, kc.alias("_bk")).distinct()
    cand = probe.select(
        *group_cols,
        "_bk",
        F.explode(
            F.array(
                *[_bucket(hash_method, F.col("_bk"), d, m_bits) for d in range(k)]
            )
        ).alias("pos"),
    ).withColumn("word", F.shiftright(F.col("pos"), 6))
    joined = cand.join(
        F.broadcast(packed), [*group_cols, "word"], "left"
    ).withColumn(
        "_hit",
        (
            F.expr(
                "shiftright(COALESCE(bits, 0L), CAST(pos % 64 AS INT)) & 1"
            )
            == 1
        ).cast("int"),
    )
    hits = (
        joined.groupBy(*group_cols, "_bk")
        .agg(F.sum("_hit").alias("_hits"))
        .filter(F.col("_hits") == k)
        .select(*group_cols, "_bk", F.lit(True).alias("maybe_present"))
    )
    return (
        df.withColumn("_bk", kc)
        .join(hits, [*group_cols, "_bk"], "left")
        .withColumn(
            "maybe_present", F.coalesce(F.col("maybe_present"), F.lit(False))
        )
        .drop("_bk")
    )


def hll_sliding_merge(
    daily: DataFrame,
    bucket_col: str,
    window: int = 7,
    step: str = "1 day",
) -> DataFrame:
    """Rolling-window HLL rollup: for every bucket, the merged sketch of
    the trailing ``window`` buckets (itself + ``window − 1`` predecessors).

    The production "distinct users in the last 7 days, per day" shape —
    computed WITHOUT rescanning raw events per window: each per-bucket
    sketch row (bucket, reg, rho) is exploded to the ``window`` windows it
    participates in (a ``sequence`` of bucket timestamps, constant
    fan-out), then one groupBy takes the elementwise register MAX — the
    same associative/idempotent merge as :func:`hll_merge`, so overlap
    between windows is free. Windows are emitted only for buckets that
    exist in the input (left-semi against the observed bucket set), so
    leading/trailing phantom windows never appear. State per (window,
    register) is one int — exact integers end to end, giving the
    cross-engine gate a bit-for-bit oracle.
    """
    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    span = f"interval {window - 1} {step.split(' ', 1)[1] if ' ' in step else step}"
    exploded = daily.select(
        F.explode(
            F.expr(
                f"sequence({bucket_col}, {bucket_col} + {span}, interval {step})"
            )
        ).alias("window_end"),
        "reg",
        "rho",
    )
    observed = daily.select(
        F.col(bucket_col).alias("window_end")
    ).distinct()
    return (
        exploded.join(observed, "window_end", "left_semi")
        .groupBy("window_end", "reg")
        .agg(F.max("rho").alias("rho"))
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values / bottom-k) distinct sketch + Jaccard estimation
# (Bar-Yossef et al. RANDOM 2002; Beyer et al. SIGMOD 2007 — public papers)
# ---------------------------------------------------------------------------


def kmv_sketch(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
    hash_method: str = "portable",
    seed: int = 0,
    salt_buckets: int = 32,
) -> DataFrame:
    """Bottom-k distinct sketch per group: the ``k`` smallest DISTINCT hash
    values of each group's values. Returns (group, rank, h), rank 1..k.

    Mergeable (union of two groups' sketches re-bottom-k'd is the union's
    sketch) and exact when a group has < k distinct values — the property
    :func:`kmv_jaccard` exploits for bit-exact oracles.

    Scale shape: one distinct shuffle to (group, hash), then TWO bounded
    windows — first per (group, salt) so no single sort sees more than
    ~1/``salt_buckets`` of a hot group's distinct values, then per group
    over at most ``salt_buckets * k`` pre-filtered rows. No collect, no
    unbounded aggregation buffers.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    from pyspark.sql import Window

    h = hash64(hash_method, F.col(value_col), seed=seed)
    gh = df.select(
        F.col(group_col).alias("group"), h.alias("h")
    ).distinct()
    w1 = Window.partitionBy("group", "_salt").orderBy("h")
    pre = (
        gh.withColumn("_salt", F.pmod(F.col("h"), F.lit(salt_buckets)))
        .withColumn("_rn", F.row_number().over(w1))
        .filter(F.col("_rn") <= k)
    )
    w2 = Window.partitionBy("group").orderBy("h")
    return (
        pre.select("group", "h")
        .withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("group", F.col("rank").cast("long").alias("rank"), "h")
    )


def kmv_jaccard(sketch: DataFrame, k: int) -> DataFrame:
    """Pairwise Jaccard estimates from a :func:`kmv_sketch` table.

    For every unordered group pair (g1 < g2): take the k smallest distinct
    hashes of the UNION of the two sketches (the union's own KMV sketch, a
    closure property of bottom-k), count how many of them belong to BOTH
    groups, and estimate J = matches / |union sketch|. When both groups
    have < k distinct values the estimate is the EXACT Jaccard similarity.

    Returns (g1, g2, n_union, matches, jaccard_e6) with the usual
    round-half-up e6 fixed point — all-integer arithmetic except that one
    division.

    Scale shape: the pair table is #groups² / 2 rows (groups are categories,
    not data); each pair's union window sees ≤ 2k rows. The sketch join
    fans each sketch row out to (#groups - 1) pairs — fine for categorical
    group columns (the intended domain), quadratic in #groups by nature.
    """
    groups = sketch.select("group").distinct()
    pairs = (
        groups.select(F.col("group").alias("g1"))
        .join(groups.select(F.col("group").alias("g2")))
        .filter(F.col("g1") < F.col("g2"))
    )
    s1 = sketch.select(F.col("group").alias("g1"), "h").withColumn(
        "in1", F.lit(1)
    )
    s2 = sketch.select(F.col("group").alias("g2"), "h").withColumn(
        "in2", F.lit(1)
    )
    u = (
        pairs.join(s1, "g1")
        .select("g1", "g2", "h", "in1", F.lit(0).alias("in2"))
        .unionByName(
            pairs.join(s2, "g2")
            .select("g1", "g2", "h", F.lit(0).alias("in1"), "in2")
        )
        .groupBy("g1", "g2", "h")
        .agg(F.max("in1").alias("in1"), F.max("in2").alias("in2"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("g1", "g2").orderBy("h")
    bottom = u.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= k
    )
    agg = bottom.groupBy("g1", "g2").agg(
        F.count("*").cast("long").alias("n_union"),
        F.sum(F.col("in1") * F.col("in2")).cast("long").alias("matches"),
    )
    jac = (
        F.when(
            F.col("n_union") > 0,
            F.floor(
                F.col("matches") * 1_000_000.0 / F.col("n_union") + F.lit(0.5)
            ),
        )
        .otherwise(F.lit(0))
        .cast("long")
    )
    return agg.select("g1", "g2", "n_union", "matches", jac.alias("jaccard_e6"))
