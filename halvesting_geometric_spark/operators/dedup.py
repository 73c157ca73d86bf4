"""Deduplication operators for large-scale training-data pipelines.

All pure DataFrame/Catalyst dataflows — shingling, hashing, banding, and
candidate joins are built-in expressions (codegen'd, no Python in the hot
path). The reference's only dedup is ``drop_duplicates`` on key subsets
(``/root/reference/halvesting_geometric/utils/data/link_prediction_metadata.py:383,393,403,418``);
near-dup detection is engine-new.

Scale notes: MinHash-LSH is the 100TB path — candidate generation is one
explode + one groupBy per band (shuffle keyed on (band, band_hash), bounded
bucket sizes for reasonable thresholds); exact pairwise Jaccard is only run on
LSH candidates, never all pairs.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

log = logging.getLogger(__name__)


def _hash64(method: str, col, seed: int):
    """Single hash-method dispatch shared with splits/sampling (one place to
    extend — see operators/sampling.hash64 and functions.portable_hash64)."""
    from halvesting_geometric_spark.operators.sampling import hash64

    return hash64(method, col, seed=seed)


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact duplicate groups: (keep_id, n_copies, dup_ids) per distinct text.

    Hash-groupBy on the text column; "first row wins" is made deterministic by
    min-id (the reference's drop_duplicates keeps pandas row order — order-
    dependent and irreproducible under partitioning; min-id is not).
    """
    return df.groupBy(text_col).agg(
        F.min(id_col).alias("keep_id"),
        F.count("*").alias("n_copies"),
        F.sort_array(F.collect_list(id_col)).alias("all_ids"),
    )


def word_shingles(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """(id, shingle) pairs of word n-grams, lowercased, distinct per doc.

    Shingling is pure array arithmetic: split → sequence of offsets →
    transform+slice → concat — all JVM-side.
    """
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    offsets = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    grams = F.transform(
        offsets, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))
    )
    return (
        df.select(F.col(id_col).alias("id"), F.explode(grams).alias("shingle"))
        .filter(F.col("shingle") != "")
        .distinct()
    )


def minhash_signatures(
    shingle_df: DataFrame, num_hashes: int = 64, hash_method: str = "xxhash64"
) -> DataFrame:
    """(id, sig array<long>) MinHash signatures.

    One hash per (shingle, seed) — num_hashes expressions evaluated
    per row inside codegen, then a single hash-aggregate takes the per-seed
    minima. One shuffle total.
    """
    mins = [
        F.min(_hash64(hash_method, F.col("shingle"), i)).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    agg = shingle_df.groupBy("id").agg(*mins)
    return agg.select(
        "id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig")
    )


def lsh_candidate_pairs(
    sig_df: DataFrame, bands: int = 16, rows_per_band: int | None = None
) -> DataFrame:
    """Candidate near-dup pairs (a < b) from banded MinHash signatures.

    Docs sharing any band hash collide into the same bucket; a self-join per
    bucket yields candidates. Buckets with a single doc produce nothing.
    """
    first = sig_df.select(F.size("sig")).first()
    if first is None:  # empty signature table → no candidate pairs
        # derive the empty frame's schema from the caller's id column so the
        # empty and non-empty cases union/join identically (string ids too)
        return sig_df.select(
            F.col("id").alias("a"), F.col("id").alias("b")
        ).limit(0)
    n_hashes_row = first[0]
    rows_per_band = rows_per_band or n_hashes_row // bands
    if rows_per_band < 1 or bands * rows_per_band > n_hashes_row:
        raise ValueError(
            f"bands={bands} x rows_per_band={rows_per_band} incompatible "
            f"with signature length {n_hashes_row}"
        )
    # Bucket key = the band's raw signature values joined as a string: no
    # re-hash needed for correctness (equality is equality), and external SQL
    # oracles replicate it verbatim.
    band_entries = sig_df.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            ",",
                            *[
                                F.element_at("sig", b * rows_per_band + r + 1)
                                for r in range(rows_per_band)
                            ],
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
    left = band_entries.select("band", "bucket", F.col("id").alias("a"))
    right = band_entries.select("band", "bucket", F.col("id").alias("b"))
    return (
        left.join(right, ["band", "bucket"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def _pair_intersections(
    shingle_df: DataFrame,
    pairs: DataFrame | None,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """(a, b, inter, sza, szb) per candidate pair — the shared core of every
    set-overlap score. With ``pairs`` given (the LSH path) only those pairs
    are scored via two semi-constrained joins; without, an inverted-index
    self-join scores every pair sharing ≥1 shingle (small-data path).

    ``max_doc_freq`` (all-pairs path only): drop shingles present in more
    than that many documents before the self-join. One ubiquitous shingle —
    a stop-word n-gram — makes the inverted-index join quadratic in corpus
    size; with the cap it degrades gracefully (intersections then
    lower-bound the exact values, exactly like an IDF cutoff). The number
    of dropped shingles is logged. Sizes (sza/szb) stay exact either way.
    """
    sizes = shingle_df.groupBy("id").agg(F.count("*").alias("sz"))
    joinable = shingle_df
    if pairs is None and max_doc_freq is not None:
        if max_doc_freq < 1:
            raise ValueError(f"max_doc_freq must be >= 1, got {max_doc_freq}")
        doc_freq = shingle_df.groupBy("shingle").agg(
            F.count_distinct("id").alias("_df")
        )
        dropped = doc_freq.filter(F.col("_df") > max_doc_freq)
        n_dropped = dropped.count()
        if n_dropped:
            log.info(
                "_pair_intersections: dropping %d shingles with doc freq > %d "
                "before the all-pairs self-join",
                n_dropped, max_doc_freq,
            )
        joinable = shingle_df.join(dropped.select("shingle"), "shingle", "left_anti")
    sa = joinable.select(F.col("id").alias("a"), "shingle")
    sb = joinable.select(F.col("id").alias("b"), "shingle")
    if pairs is not None:
        inter = (
            pairs.join(sa, "a")
            .join(sb, ["b", "shingle"])
            .groupBy("a", "b")
            .agg(F.count("*").alias("inter"))
        )
    else:
        inter = (
            sa.join(sb, "shingle")
            .filter(F.col("a") < F.col("b"))
            .groupBy("a", "b")
            .agg(F.count("*").alias("inter"))
        )
    return (
        inter.join(sizes.select(F.col("id").alias("a"), F.col("sz").alias("sza")), "a")
        .join(sizes.select(F.col("id").alias("b"), F.col("sz").alias("szb")), "b")
    )


def jaccard_similarity(
    shingle_df: DataFrame,
    pairs: DataFrame | None = None,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact shingle-set Jaccard per pair: (a, b, inter, union_sz, jaccard).

    ``max_doc_freq`` guards the all-pairs path against ubiquitous shingles
    (see :func:`_pair_intersections`); scores then lower-bound exact."""
    return _pair_intersections(shingle_df, pairs, max_doc_freq).select(
        "a",
        "b",
        "inter",
        (F.col("sza") + F.col("szb") - F.col("inter")).alias("union_sz"),
        (
            F.col("inter")
            / (F.col("sza") + F.col("szb") - F.col("inter"))
        ).alias("jaccard"),
    )


def containment_scores(
    shingle_df: DataFrame,
    pairs: DataFrame | None = None,
    min_containment: float = 0.0,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Asymmetric set-overlap scores per pair: (a, b, inter, containment_a,
    containment_b, overlap).

    ``containment_a = |A∩B| / |A|`` — how much of document a is inside b;
    Jaccard misses subset duplicates (a 100-word doc fully contained in a
    10k-word doc has Jaccard ≈ 0.01 but containment_a = 1.0), and subset
    duplication is the common failure mode in scraped training corpora.
    ``overlap = |A∩B| / min(|A|,|B|)`` is the symmetric max of the two.
    ``min_containment`` filters on the overlap coefficient.
    ``max_doc_freq`` guards the all-pairs path against ubiquitous shingles
    (see :func:`_pair_intersections`).
    """
    out = _pair_intersections(shingle_df, pairs, max_doc_freq).select(
        "a",
        "b",
        "inter",
        (F.col("inter") / F.col("sza")).alias("containment_a"),
        (F.col("inter") / F.col("szb")).alias("containment_b"),
        (F.col("inter") / F.least("sza", "szb")).alias("overlap"),
    )
    if min_containment > 0.0:
        out = out.filter(F.col("overlap") >= min_containment)
    return out


def near_dup_clusters(
    pairs: DataFrame, docs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Near-duplicate CLUSTERS from a pair table: transitive closure via
    connected components, canonical representative = the smallest id in the
    cluster.

    Pairwise dedup under-deletes (A≈B, B≈C but A̸≈C still leaves two of the
    three); production dedup clusters the near-dup graph and keeps one doc
    per component. ``pairs``: (a, b) near-dup edges from any detector
    (jaccard threshold, MinHash-LSH, SimHash, containment). Documents that
    appear in no pair form singleton clusters of themselves. Returns
    (id, cluster_rep, is_kept) — one row per input document.

    Scale shape: the component step is the same Kiveris large-star /
    small-star driver the citation graph uses — no transitive-closure
    materialization.
    """
    from halvesting_geometric_spark.operators.components import (
        connected_components,
    )

    ids = docs.select(F.col(id_col)).distinct()
    verts = ids.select(F.col(id_col).alias("vertex_id"))
    edges = pairs.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    )
    comp = connected_components(edges, verts).components
    return (
        ids.join(
            comp.select(
                F.col("vertex_id").alias(id_col),
                F.col("component").alias("cluster_rep"),
            ),
            id_col,
            "left",
        )
        .select(
            id_col,
            F.coalesce("cluster_rep", F.col(id_col)).alias("cluster_rep"),
        )
        .withColumn("is_kept", F.col(id_col) == F.col("cluster_rep"))
    )


def minhash_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
    hash_method: str = "xxhash64",
) -> DataFrame:
    """Full MinHash-LSH pipeline: shingle → sign → band → candidates →
    exact-Jaccard verify ≥ threshold. Returns (a, b, jaccard)."""
    sh = word_shingles(df, text_col, id_col, n=shingle_n)
    sh = sh.persist()
    sig = minhash_signatures(sh, num_hashes=num_hashes, hash_method=hash_method)
    cand = lsh_candidate_pairs(sig, bands=bands)
    scored = jaccard_similarity(sh, cand)
    return scored.filter(F.col("jaccard") >= threshold).select("a", "b", "jaccard")


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
    hash_method: str = "xxhash64",
) -> DataFrame:
    """(id, simhash long) — ``bits``-bit SimHash over word tokens.

    Per token: one 64-bit hash; per bit: ±1 contribution summed per doc,
    sign → bit. All expression-level (shiftright/bitwise-and inside the
    aggregate); one shuffle. With ``hash_method='portable'`` the hash carries
    60 usable bits, so ``bits`` must be ≤ 60 there.

    FORMAT BREAK (v2, since round 2): the token hash is the *seeded* form
    ``xxhash64(tok, 0)``, not round-1's unseeded ``xxhash64(tok)`` — Spark
    evaluates these differently, so simhashes persisted by round-1 code do
    NOT match values computed here and must be recomputed (an exact-dup
    join across old and new outputs would silently find nothing). Same
    applies to :func:`textstats.fingerprint`.
    """
    if hash_method == "portable" and bits > 60:
        raise ValueError("portable hash carries 60 bits; lower `bits`")
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("tok"),
    ).filter(F.col("tok") != "")
    h = _hash64(hash_method, F.col("tok"), 0)
    bit_sums = [
        F.sum(
            F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(bits)
    ]
    agg = toks.groupBy("id").agg(*bit_sums)
    fingerprint = None
    for b in range(bits):
        term = F.when(F.col(f"b{b}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        ) * F.lit(1 << b).cast("long") if b < 63 else F.when(
            F.col(f"b{b}") > 0, F.lit(-(1 << 63)).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        fingerprint = term if fingerprint is None else fingerprint + term
    return agg.select("id", fingerprint.alias("simhash"))


def simhash_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    band_bits: int = 16,
    bits: int = 64,
    hash_method: str = "xxhash64",
) -> DataFrame:
    """Near-dup pairs by SimHash: band the 64-bit fingerprint into 64/band_bits
    blocks (pigeonhole: any pair within max_hamming shares ≥1 exact block when
    blocks > max_hamming), candidate-join on block equality, verify true
    Hamming distance with bit_count(xor). ``bits``/``hash_method`` pass
    through to :func:`simhash` (60-bit portable mode keeps the top four
    banded bits zero — banding over 64 stays valid, the zero bits just
    never differ)."""
    if not 1 <= band_bits <= 64 or 64 % band_bits:
        raise ValueError(f"band_bits must divide 64, got {band_bits}")
    if 64 // band_bits <= max_hamming:
        raise ValueError(
            f"need more than max_hamming={max_hamming} blocks for the "
            f"pigeonhole guarantee; lower band_bits (got {band_bits})"
        )
    fp = simhash(df, text_col, id_col, bits=bits, hash_method=hash_method).persist()
    n_bands = 64 // band_bits
    mask = (1 << band_bits) - 1
    entries = fp.select(
        "id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned("simhash", b * band_bits)
                        .bitwiseAND(F.lit(mask))
                        .alias("block"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "simhash", "bb.band", "bb.block")
    left = entries.select(
        "band", "block", F.col("id").alias("a"), F.col("simhash").alias("fa")
    )
    right = entries.select(
        "band", "block", F.col("id").alias("b"), F.col("simhash").alias("fb")
    )
    return (
        left.join(right, ["band", "block"])
        .filter(F.col("a") < F.col("b"))
        .select(
            "a",
            "b",
            F.bit_count(F.col("fa").bitwiseXOR(F.col("fb"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    bench_id_col: str = "doc_id",
    min_hits: int = 1,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Benchmark decontamination: (id, hits, contaminated) per training doc.

    The standard LLM-corpus hygiene step (n-gram overlap flagging, n=13 in
    the GPT-3/PaLM/Gopher pipelines — public papers): a training document is
    contaminated when it shares >= ``min_hits`` distinct word ``n``-grams
    with ANY benchmark document. Both sides shingle with
    :func:`word_shingles` (pure codegen array ops); the benchmark shingle
    set is deduped and — being eval-set sized, i.e. tiny next to a 100 TB
    corpus — broadcast, so the flagging pass is one scan of the training
    side with a map-side hash-join + one groupBy. Set
    ``broadcast_benchmark=False`` for an unusually large benchmark side and
    the join plans as a regular shuffle join.

    ``hits`` counts DISTINCT overlapping n-grams (shingles are distinct per
    doc), so thresholded policies ("drop if >= k colliding 13-grams") are a
    filter on the output.
    """
    d = word_shingles(docs, text_col=text_col, id_col=id_col, n=n)
    b = (
        word_shingles(benchmark, text_col=bench_text_col, id_col=bench_id_col, n=n)
        .select("shingle")
        .distinct()
    )
    if broadcast_benchmark:
        b = F.broadcast(b)
    hit = d.join(b, "shingle").groupBy("id").agg(F.count("*").alias("hits"))
    return (
        docs.select(F.col(id_col).alias("id"))
        .distinct()
        .join(hit, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("hits"), F.lit(0)).alias("hits"),
            (F.coalesce(F.col("hits"), F.lit(0)) >= min_hits).alias(
                "contaminated"
            ),
        )
    )


def dedup_lines(
    docs: DataFrame,
    max_occurrences: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    normalize: bool = True,
) -> DataFrame:
    """Corpus-wide repeated-LINE removal (id, text, n_lines, n_removed).

    The MassiveText/Gopher hygiene step that document-level dedup cannot
    express: boilerplate lines (headers, navigation, license blurbs)
    repeated across MANY distinct documents are dropped from every document
    once their corpus-wide occurrence count exceeds ``max_occurrences``,
    then each document is reassembled in original line order.

    Dataflow: posexplode(split) → groupBy(line-hash) count (map-side
    combined; the count table is per-DISTINCT-line, typically tiny next to
    the corpus and join-able by hash only) → left_anti-style filter →
    per-doc ordered reassembly via sort_array(collect_list(struct(pos,
    line))) — the collect_list buffer is bounded by DOCUMENT size (a doc
    fits an aggregation buffer by construction), never by corpus size.
    ``normalize`` compares lines case-folded/trimmed, removal keeps the
    original text. Empty lines are never counted as boilerplate (they'd hit
    the cap instantly) and are preserved verbatim.
    """
    norm = F.lower(F.trim(F.col("_line"))) if normalize else F.col("_line")
    lines = docs.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(F.col(text_col), sep)).alias("_pos", "_line"),
    ).withColumn("_key", F.when(F.trim("_line") == "", None).otherwise(
        F.xxhash64(norm)
    ))
    hot = (
        lines.filter(F.col("_key").isNotNull())
        .groupBy("_key")
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") > max_occurrences)
        .select("_key")
    )
    kept = lines.join(hot, "_key", "left_anti")
    rebuilt = kept.groupBy("id").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("_pos", "_line"))),
                lambda s: s["_line"],
            ),
            sep,
        ).alias("text"),
        F.count("*").alias("n_lines"),
    )
    totals = lines.groupBy("id").agg(F.count("*").alias("_total"))
    return (
        totals.join(rebuilt, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("text"), F.lit("")).alias("text"),
            F.coalesce(F.col("n_lines"), F.lit(0)).alias("n_lines"),
            (F.col("_total") - F.coalesce(F.col("n_lines"), F.lit(0))).alias(
                "n_removed"
            ),
        )
    )


def dedup_substrings(
    docs: DataFrame,
    l: int = 50,
    min_occurrences: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact duplicated-SUBSTRING removal (id, n_tokens, n_dup_tokens,
    n_spans, text) — the Lee et al. 2022 ("Deduplicating Training Data
    Makes Language Models Better") corpus hygiene step that document- and
    line-level dedup cannot express: any run of ``l`` consecutive tokens
    occurring ``min_occurrences``-or-more times ANYWHERE in the corpus
    (across documents or repeated within one) is cut from every document,
    overlapping duplicate windows merged into maximal spans first.

    The published implementation builds one corpus-wide suffix array — a
    global sorted order, hostile to a shared-nothing engine. Same
    semantics here as pure dataflow: every token ``l``-gram (lowercased,
    whitespace-tokenized) is hashed to 64 bits inside codegen (split →
    sequence → slice/concat → xxhash64, cf. :func:`word_shingles`), a
    map-side-combined count keeps only hashes with >= ``min_occurrences``
    occurrences — the HOT table, tiny next to the corpus since most grams
    are unique — and a semi join marks each document's duplicate window
    starts. Per-doc state is bounded by DOCUMENT length everywhere
    (sort_array(collect_list(gpos)) like :func:`dedup_lines`'s rebuild);
    span merge, covered-token count and in-order reassembly are Catalyst
    array expressions (flatten/sequence/aggregate/filter), zero Python.

    Grouping on the 64-bit gram hash (not the gram string) keeps the
    shuffle narrow; a false merge needs an xxhash64 collision
    (~n_grams^2 / 2^65 — negligible at any real corpus size, same
    tradeoff as :func:`minhash_signatures`). Reassembly filters each
    token against the merged covered-position array (O(n_tokens *
    n_covered) per doc, bounded by row size, still codegen).

    Output ``text`` keeps original token case/order with covered spans
    removed; ``n_spans`` counts the maximal merged spans.
    """
    trimmed = F.trim(F.col(text_col))
    toks = F.when(
        F.length(trimmed) > 0, F.split(trimmed, r"\s+")
    ).otherwise(F.array().cast("array<string>"))
    base = docs.select(F.col(id_col).alias("id"), toks.alias("_toks"))
    n = F.size("_toks")
    offsets = F.when(
        n >= l, F.sequence(F.lit(0), n - l)
    ).otherwise(F.array().cast("array<int>"))
    grams = base.select(
        "id",
        F.posexplode(
            F.transform(
                offsets,
                lambda i: F.xxhash64(
                    F.lower(F.concat_ws(" ", F.slice(F.col("_toks"), i + 1, l)))
                ),
            )
        ).alias("gpos", "ghash"),
    )
    hot = (
        grams.groupBy("ghash")
        .agg(F.count("*").alias("_n"))
        .filter(F.col("_n") >= min_occurrences)
        .select("ghash")
    )
    dupg = (
        grams.join(hot, "ghash", "left_semi")
        .groupBy("id")
        .agg(F.sort_array(F.collect_list("gpos")).alias("_dupg"))
    )
    joined = base.join(dupg, "id", "left")
    covered = F.when(F.col("_dupg").isNull(), F.array().cast("array<int>")).otherwise(
        F.array_distinct(
            F.flatten(
                F.transform(F.col("_dupg"), lambda g: F.sequence(g, g + l - 1))
            )
        )
    )
    out = joined.select(
        "id",
        F.col("_toks"),
        covered.alias("_cov"),
    )
    n_spans = F.aggregate(
        F.col("_cov"),
        F.struct(F.lit(0).alias("cnt"), F.lit(-2).alias("prev")),
        lambda acc, x: F.struct(
            (acc["cnt"] + F.when(x == acc["prev"] + 1, 0).otherwise(1)).alias(
                "cnt"
            ),
            x.alias("prev"),
        ),
        lambda acc: acc["cnt"],
    )
    return out.select(
        "id",
        F.size("_toks").alias("n_tokens"),
        F.size("_cov").alias("n_dup_tokens"),
        n_spans.alias("n_spans"),
        F.array_join(
            F.filter(
                F.col("_toks"),
                lambda t, i: ~F.array_contains(F.col("_cov"), i.cast("int")),
            ),
            " ",
        ).alias("text"),
    )
