"""Directed triad census (Holland–Leinhardt 16 MAN classes).

The staple structural signature of a directed social/citation graph: every
unordered vertex triple falls into one of 16 isomorphism classes named by
their Mutual/Asymmetric/Null dyad counts (003, 012, 102, 021D, 021U, 021C,
111D, 111U, 030T, 030C, 201, 120D, 120U, 120C, 210, 300). Engine-new per
``BASELINE.json`` ``north_rule`` (link-graph analytics family).

Orientation conventions (the D/U/C/T suffixes), matching the standard
drawings:

- ``021D`` A←B→C (two arcs DIVERGE from one node), ``021U`` A→B←C
  (converge), ``021C`` chain A→B→C
- ``111D`` A↔B←C (the lone arc's head is in the mutual dyad), ``111U``
  A↔B→C (tail in the dyad)
- ``030T`` transitive (a→b, b→c, a→c), ``030C`` 3-cycle
- ``120D``/``120U``/``120C`` = mutual dyad + the 021D/U/C asymmetric pattern

Algorithm (Batagelj–Mrvar style, never O(n³)):

1. Enumerate only CONNECTED triads (≥ 2 linked dyads) with a wedge join on
   the linked-pair table — candidate volume Σ deg², the same budget as
   triangle counting, shuffled on the wedge center. Each triple is
   canonicalized (x<y<z) and deduplicated, then its 6 possible arcs become a
   6-bit code classified through a 64→16 lookup derived at import time by
   brute-force isomorphism (pure Python over 64 codes — no graph library).
2. Single-link triads are closed-form: each linked pair sits in (n−2)
   triples; subtracting the connected triples containing it (an explode +
   groupBy over step 1's output) leaves its single-link count, contributing
   to 102 (mutual) or 012 (asymmetric).
3. ``003`` = C(n,3) − connected − single-link.

``max_degree`` drops wedge CENTERS above the cap (default 1024, the repo's
measured-feasible wedge budget — same policy as ``linkpred.py``); capped
runs report a lower bound on connected classes while 012/102/003 absorb the
remainder, and ``None`` opts into the exact quadratic-hub cost.

The DuckDB gate twin (``triad_census``) replays the same joins and the same
64-entry CASE mapping, so counts are hash-matched exactly.
"""

from __future__ import annotations

from itertools import permutations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TRIAD_NAMES = (
    "003", "012", "102", "021D", "021U", "021C", "111D", "111U",
    "030T", "030C", "201", "120D", "120U", "120C", "210", "300",
)

# arc bit order for the 6-bit code of canonical triple (x < y < z)
_ARCS = ((0, 1), (1, 0), (0, 2), (2, 0), (1, 2), (2, 1))


def _code_of(adj: set[tuple[int, int]]) -> int:
    return sum(1 << i for i, a in enumerate(_ARCS) if a in adj)


def _classify(adj: set[tuple[int, int]]) -> str:
    """Name the triad on nodes {0,1,2} by MAN counts + orientation."""
    pairs = ((0, 1), (0, 2), (1, 2))
    m = sum((a, b) in adj and (b, a) in adj for a, b in pairs)
    asym = [
        (a, b) if (a, b) in adj else (b, a)
        for a, b in pairs
        if ((a, b) in adj) != ((b, a) in adj)
    ]
    a = len(asym)
    n = 3 - m - a
    base = f"{m}{a}{n}"
    if base in ("003", "012", "102", "201", "210", "300"):
        return base
    outd = [0, 0, 0]
    ind = [0, 0, 0]
    for s, t in asym:
        outd[s] += 1
        ind[t] += 1
    if base == "021":
        if max(outd) == 2:
            return "021D"
        if max(ind) == 2:
            return "021U"
        return "021C"
    if base == "111":
        (s, t) = asym[0]
        mut = next(p for p in pairs if (p in adj_pairs(adj)))
        return "111D" if t in mut else "111U"
    if base == "030":
        return "030T" if max(outd) == 2 else "030C"
    if base == "120":
        if max(outd) == 2:
            return "120D"
        if max(ind) == 2:
            return "120U"
        return "120C"
    raise AssertionError(base)


def adj_pairs(adj: set[tuple[int, int]]) -> set[tuple[int, int]]:
    """Unordered pairs that are MUTUAL dyads in adj."""
    return {
        (a, b)
        for a in range(3)
        for b in range(a + 1, 3)
        if (a, b) in adj and (b, a) in adj
    }


def _build_code_map() -> dict[int, str]:
    """64 → 16 map by brute force; permutation-invariance asserted."""
    out: dict[int, str] = {}
    for code in range(64):
        adj = {_ARCS[i] for i in range(6) if code & (1 << i)}
        name = _classify(adj)
        # sanity: every relabeling must classify identically
        for perm in permutations(range(3)):
            padj = {(perm[a], perm[b]) for a, b in adj}
            assert _classify(padj) == name, (code, perm)
        out[code] = name
    assert set(out.values()) == set(TRIAD_NAMES)
    return out


CODE_TO_NAME = _build_code_map()


def triad_census(
    edges: DataFrame,
    vertices: DataFrame,
    max_degree: int | None = 1024,
) -> DataFrame:
    """Counts of all 16 directed triad classes. Returns (triad, cnt) —
    16 rows, Σ cnt = C(n, 3) exactly (uncapped).

    ``max_degree``: drop wedge centers whose linked-pair degree exceeds the
    cap before enumerating connected triads (see module docstring).
    """
    spark = edges.sparkSession
    n = vertices.select("vertex_id").distinct().count()
    e = (
        edges.filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )
    # linked unordered pairs with their dyad bits
    lp = (
        e.select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
            F.when(F.col("src") < F.col("dst"), 1).otherwise(0).alias("fwd"),
            F.when(F.col("src") > F.col("dst"), 1).otherwise(0).alias("rev"),
        )
        .groupBy("u", "v")
        .agg(F.max("fwd").alias("fwd"), F.max("rev").alias("rev"))
        .persist()
    )
    n_linked = lp.count()

    # wedge join on the shared center; both orientations of each pair
    half = lp.select(F.col("u").alias("c"), F.col("v").alias("o")).unionByName(
        lp.select(F.col("v").alias("c"), F.col("u").alias("o"))
    )
    if max_degree is not None:
        if max_degree < 1:
            raise ValueError(f"max_degree must be >= 1, got {max_degree}")
        deg = half.groupBy("c").agg(F.count("*").alias("d"))
        half = half.join(
            deg.filter(F.col("d") <= max_degree).select("c"), "c", "left_semi"
        )
    a = half.select("c", F.col("o").alias("b1"))
    b = half.select("c", F.col("o").alias("b2"))
    triples = (
        a.join(b, "c")
        .filter(F.col("b1") < F.col("b2"))
        .select(
            F.least("c", "b1", "b2").alias("x"),
            # middle element of {c, b1, b2}: sum minus min minus max —
            # exact for dense ids (3·id stays far under 2^63 in ANSI mode)
            (F.col("c") + F.col("b1") + F.col("b2") - F.least("c", "b1", "b2")
             - F.greatest("c", "b1", "b2")).alias("y"),
            F.greatest("c", "b1", "b2").alias("z"),
        )
        .distinct()
    )

    def _bits(alias_u: str, alias_v: str, b_fwd: int, b_rev: int):
        """Join lp for pair (alias_u < alias_v) contributing code bits."""
        return (
            lp.select(
                F.col("u").alias(alias_u),
                F.col("v").alias(alias_v),
                (F.col("fwd") * b_fwd + F.col("rev") * b_rev).alias(
                    f"_c_{alias_u}{alias_v}"
                ),
            )
        )

    coded = (
        triples.join(_bits("x", "y", 1, 2), ["x", "y"], "left")
        .join(_bits("x", "z", 4, 8), ["x", "z"], "left")
        .join(_bits("y", "z", 16, 32), ["y", "z"], "left")
        .select(
            "x",
            "y",
            "z",
            (
                F.coalesce("_c_xy", F.lit(0))
                + F.coalesce("_c_xz", F.lit(0))
                + F.coalesce("_c_yz", F.lit(0))
            ).alias("code"),
        )
        .persist()
    )
    name_expr = F.element_at(
        F.create_map(
            *[
                x
                for c, nm in sorted(CODE_TO_NAME.items())
                for x in (F.lit(c), F.lit(nm))
            ]
        ),
        F.col("code").cast("int"),
    )
    connected_counts = (
        coded.select(name_expr.alias("triad"))
        .groupBy("triad")
        .agg(F.count("*").alias("cnt"))
    )
    stats = coded.agg(F.count("*").alias("n_conn")).first()
    n_conn = int(stats["n_conn"])

    # connected triads containing each linked pair (for the 1-link residue)
    pair_in_conn = (
        coded.select(F.col("x").alias("u"), F.col("y").alias("v"))
        .unionByName(coded.select(F.col("x").alias("u"), F.col("z").alias("v")))
        .unionByName(coded.select(F.col("y").alias("u"), F.col("z").alias("v")))
        .join(lp.select("u", "v"), ["u", "v"], "left_semi")
        .groupBy("u", "v")
        .agg(F.count("*").alias("c_in"))
    )
    singles = (
        lp.join(pair_in_conn, ["u", "v"], "left")
        .select(
            F.when(
                (F.col("fwd") == 1) & (F.col("rev") == 1), F.lit("102")
            )
            .otherwise(F.lit("012"))
            .alias("triad"),
            (F.lit(n - 2) - F.coalesce("c_in", F.lit(0))).alias("k"),
        )
        .groupBy("triad")
        .agg(F.sum("k").alias("cnt"))
    )
    total = n * (n - 1) * (n - 2) // 6
    n_singles_row = singles.agg(F.coalesce(F.sum("cnt"), F.lit(0))).first()
    n_singles = int(n_singles_row[0])
    null_cnt = total - n_conn - n_singles

    base = spark.createDataFrame(
        [(nm,) for nm in TRIAD_NAMES], "triad string"
    )
    merged = (
        connected_counts.unionByName(singles)
        .unionByName(
            spark.createDataFrame([("003", null_cnt)], "triad string, cnt long")
        )
        .groupBy("triad")
        .agg(F.sum("cnt").alias("cnt"))
    )
    out = (
        base.join(merged, "triad", "left")
        .select("triad", F.coalesce("cnt", F.lit(0)).cast("long").alias("cnt"))
    )
    out = out.localCheckpoint(eager=True)
    lp.unpersist()
    coded.unpersist()
    return out
