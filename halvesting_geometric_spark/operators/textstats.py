"""Text analysis operators: language ID, quality scoring, token counting,
document fingerprinting. All built-in expressions (no Python in the hot path).

The reference's text handling is limited to language *filtering* on a
pre-labeled column (``/root/reference/halvesting_geometric/utils/data/
link_prediction_metadata.py:370``) and title normalization; these operators
are the engine-new analysis layer a training-data pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny public stopword cores — enough signal for an n-gram/stopword heuristic.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "with"],
    "fr": ["le", "la", "les", "de", "des", "et", "est", "que", "pour", "dans"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "auf"],
    "es": ["el", "la", "los", "de", "que", "y", "es", "en", "por", "con"],
}


def _tokens(text: Column) -> Column:
    return F.filter(
        F.split(F.lower(F.trim(text)), r"[^\p{L}\p{N}]+"), lambda t: t != ""
    )


def token_count(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Whitespace tokens plus a BPE-ish subword estimate (chars/4 heuristic
    blended with punctuation splits — the standard fast proxy)."""
    ws = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    subword = F.ceil(F.length(F.col(text_col)) / 4).cast("long")
    return df.select(
        F.col(id_col),
        ws.cast("long").alias("ws_tokens"),
        subword.alias("subword_est"),
        F.size(_tokens(F.col(text_col))).cast("long").alias("word_tokens"),
    )


def language_id(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Stopword-ratio argmax over {en, fr, de, es}; 'und' (undetermined) when
    no stopword hits. Ratios are array-intersection arithmetic, fully native.
    """
    toks = _tokens(F.col(text_col))
    scores = []
    for lang, words in STOPWORDS.items():
        lit_arr = F.array(*[F.lit(w) for w in words])
        hits = F.size(F.filter(toks, lambda t: F.array_contains(lit_arr, t)))
        scores.append(
            F.struct(
                (hits / F.greatest(F.size(toks), F.lit(1))).alias("score"),
                F.lit(lang).alias("lang"),
            )
        )
    # array_max over structs: lexicographic (score, lang) — deterministic tie
    best = F.array_max(F.array(*scores))
    return df.select(
        F.col(id_col),
        F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und")).alias(
            "lang_pred"
        ),
        best["score"].alias("lang_score"),
    )


def quality_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style cheap quality signals: length, mean word length,
    punctuation/stopword/alpha ratios, and a composite [0,1] score."""
    text = F.col(text_col)
    toks = _tokens(text)
    n_tok = F.greatest(F.size(toks), F.lit(1))
    n_chars = F.greatest(F.length(text), F.lit(1))
    mean_word_len = (
        F.aggregate(toks, F.lit(0), lambda a, t: a + F.length(t)) / n_tok
    )
    alpha_ratio = (
        F.length(F.regexp_replace(text, r"[^\p{L}]", "")) / n_chars
    )
    punct_ratio = F.length(F.regexp_replace(text, r"[^.!?,;:]", "")) / n_chars
    en_stop = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    stop_ratio = F.size(F.filter(toks, lambda t: F.array_contains(en_stop, t))) / n_tok
    length_ok = (F.size(toks) >= 5) & (F.size(toks) <= 100_000)
    word_len_ok = (mean_word_len >= 2.0) & (mean_word_len <= 12.0)
    composite = (
        F.when(length_ok, 0.25).otherwise(0.0)
        + F.when(word_len_ok, 0.25).otherwise(0.0)
        + F.least(alpha_ratio, F.lit(0.9)) / 0.9 * 0.25
        + F.least(stop_ratio * 5, F.lit(1.0)) * 0.25
    )
    return df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        mean_word_len.alias("mean_word_len"),
        alpha_ratio.alias("alpha_ratio"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        composite.alias("quality"),
    )


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style repetition signals: fraction of duplicate 2-grams /
    3-grams and the mass of the single most frequent token.

    The n-gram duplicate fractions are pure array expressions (transform +
    array_distinct) — per-document work linear in tokens, no shuffle. The
    top-token mass uses the explode → two-level aggregate shape (NOT a
    per-document quadratic array scan): tokens explode to rows, count per
    (doc, token), max/sum per doc — both aggregates combine map-side, so the
    operator scales to arbitrarily long documents without a hot row.

    Returns (id, n_tokens, top_token_frac, dup_2gram_frac, dup_3gram_frac);
    documents with fewer tokens than an n-gram needs get fraction 0.
    """
    text = F.col(text_col)
    toks = _tokens(text)
    n = F.size(toks)

    def dup_frac(k: int) -> Column:
        total = n - (k - 1)
        grams = F.transform(
            F.slice(toks, 1, F.greatest(total, F.lit(0))),
            lambda t, i: F.concat_ws(
                " ",
                t,
                *[F.element_at(toks, i + F.lit(j + 1)) for j in range(1, k)],
            ),
        )
        return F.when(
            n >= k,
            (total - F.size(F.array_distinct(grams)))
            / total.cast("double"),
        ).otherwise(F.lit(0.0))

    per_doc = df.select(
        F.col(id_col),
        n.cast("long").alias("n_tokens"),
        dup_frac(2).alias("dup_2gram_frac"),
        dup_frac(3).alias("dup_3gram_frac"),
    )
    top = (
        df.select(F.col(id_col), F.explode(toks).alias("tok"))
        .groupBy(id_col, "tok")
        .agg(F.count("*").alias("c"))
        .groupBy(id_col)
        .agg(F.max("c").alias("top_cnt"), F.sum("c").alias("n_toks"))
    )
    return (
        per_doc.join(top, id_col, "left")
        .select(
            F.col(id_col),
            "n_tokens",
            F.when(
                F.col("n_toks").isNotNull(),
                F.col("top_cnt") / F.col("n_toks"),
            )
            .otherwise(F.lit(0.0))
            .alias("top_token_frac"),
            "dup_2gram_frac",
            "dup_3gram_frac",
        )
    )


# (name, pattern, replacement) — patterns restricted to syntax valid in both
# Java regex (Spark) and RE2 (external SQL oracles). Order matters: URLs are
# scrubbed before emails so credentials-in-URL don't leave an email behind.
DEFAULT_SCRUB_PATTERNS: list[tuple[str, str, str]] = [
    ("url", r"https?://[^\s]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    ("longnum", r"\b\d{9,}\b", "<NUM>"),
]


def scrub_text(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    patterns: list[tuple[str, str, str]] | None = None,
) -> DataFrame:
    """PII-style pattern redaction: replace each pattern with its placeholder
    and count the hits. Pure `regexp_replace`/`regexp_extract_all` chain —
    codegen'd, no Python, no shuffle.

    Patterns apply in list order to the progressively-scrubbed text (so an
    email inside a URL counts once, as a URL). Returns
    (id, scrubbed, n_<name>... counts per pattern).
    """
    pats = DEFAULT_SCRUB_PATTERNS if patterns is None else patterns
    if not pats:
        raise ValueError("patterns must be non-empty")
    cur: Column = F.col(text_col)
    counts = []
    for name, pat, rep in pats:
        counts.append(
            F.size(F.regexp_extract_all(cur, F.lit(pat), 0))
            .cast("long")
            .alias(f"n_{name}")
        )
        cur = F.regexp_replace(cur, pat, rep)
    return df.select(F.col(id_col), cur.alias("scrubbed"), *counts)


def fingerprint(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_method: str = "xxhash64",
) -> DataFrame:
    """Document fingerprints: whole-text hash over normalized text
    (case/whitespace-insensitive exact dup key) + first/last-256-char hashes
    (cheap containment probes). ``hash_method="portable"`` selects the
    md5-derived cross-engine hash so an external SQL oracle can verify the
    full dataflow bit-for-bit.

    FORMAT BREAK (v2, since round 2): hashes are the *seeded* form
    ``xxhash64(x, 0)``, not round-1's unseeded ``xxhash64(x)`` — persisted
    round-1 fingerprints must be recomputed before joining against new
    outputs (see the matching note on :func:`dedup.simhash`)."""
    from halvesting_geometric_spark.operators.sampling import hash64

    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.select(
        F.col(id_col),
        hash64(hash_method, norm).alias("fp_full"),
        hash64(hash_method, F.substring(norm, 1, 256)).alias("fp_head"),
        hash64(
            hash_method, F.reverse(F.substring(F.reverse(norm), 1, 256))
        ).alias("fp_tail"),
    )


def vocab_coverage(
    df: DataFrame,
    vocab_size: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Vocabulary coverage / OOV rate per document against the corpus's own
    top-``vocab_size`` token vocabulary — the standard pre-tokenizer health
    metric for a training mix (how much of each document a fixed vocabulary
    can represent).

    Vocabulary = the ``vocab_size`` most frequent tokens by total corpus
    occurrences, ties broken by token string ascending (deterministic, so
    the oracle reproduces the exact vocabulary). Returns one row per doc:
    (id, n_tokens, n_oov, oov_e6) where oov_e6 is the round-half-up e6
    fixed point of n_oov / n_tokens (0 for empty docs).

    Scale shape: one map-side-combined (token → count) aggregation, one
    two-phase exact top-N (no global sort of the full vocabulary — ORDER BY
    + LIMIT plans as TakeOrderedAndProject, a per-partition heap + one
    ``vocab_size``-row driver merge), then a BROADCAST left-anti-style join
    of the exploded (doc, token) occurrences against the vocabulary. The
    vocabulary must fit a broadcast: vocab_size is capped at 4M rows.
    """
    if not 1 <= vocab_size <= 4_000_000:
        raise ValueError(
            f"vocab_size must be in [1, 4e6] (broadcast), got {vocab_size}"
        )
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(_tokens(F.col(text_col))).alias("tok"),
    )
    vocab = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("tok").asc())
        .limit(vocab_size)
        .select("tok", F.lit(1).alias("_inv"))
    )
    per_doc = (
        toks.join(F.broadcast(vocab), "tok", "left")
        .groupBy("id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum(F.when(F.col("_inv").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_oov"),
        )
    )
    oov = (
        F.when(
            F.col("n_tokens") > 0,
            F.floor(
                F.col("n_oov") * 1_000_000.0 / F.col("n_tokens") + F.lit(0.5)
            ),
        )
        .otherwise(F.lit(0))
        .cast("long")
    )
    # docs with zero tokens (empty/whitespace text) still get a row
    base = df.select(F.col(id_col).alias("id"))
    return (
        base.join(per_doc, "id", "left")
        .select(
            "id",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("n_oov", F.lit(0)).cast("long").alias("n_oov"),
        )
        .select("id", "n_tokens", "n_oov", oov.alias("oov_e6"))
    )
