"""Text analysis operators over a document corpus (Tier B, SURVEY.md §2.2).

Training-data-pipeline text ops: tokenization + token counting,
quality scoring, language-ID heuristic, and document fingerprinting.
All pure Catalyst expressions (regexp/split/md5 are JVM builtins) —
no UDFs, so the whole stage codegens and scales linearly with input
splits; the only shuffle is the final user-requested aggregation.

Every constant here (stopword list, language markers, punctuation
class, score weights) is mirrored verbatim by the DuckDB oracle SQL in
``plans.queries`` — keep them in sync.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: stopwords for the quality score (mirrored in oracle SQL)
STOPWORDS = ("the", "a", "of", "and", "to", "in")
STOPWORD_RE = r"\b(" + "|".join(STOPWORDS) + r")\b"
PUNCT_RE = r"[.,;:!?]"

#: language marker words for the n-gram/stopword language-ID heuristic
LANG_MARKERS = {
    "en": r"\b(the|and|of)\b",
    "de": r"\b(der|die|und)\b",
    "es": r"\b(el|la|los)\b",
    "fr": r"\b(le|les|et)\b",
    "zh": r"[一-鿿]",
}
LANG_ORDER = ("zh", "en", "de", "es", "fr")  # tie-break priority


def tokens(col: Column) -> Column:
    """Whitespace tokenization (both engines split on ``\\s+``)."""
    return F.split(col, r"\s+")


def token_count(col: Column) -> Column:
    return F.size(tokens(col))


def word_token_count(col: Column) -> Column:
    """BPE-ish token estimate: word-chunks + non-space punctuation runs,
    counted with one regexp (mirrors oracle ``regexp_extract_all``)."""
    return F.regexp_count(col, F.lit(r"\w+|[^\w\s]"))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Add n_tokens / stopword_ratio / punct_ratio / avg_token_len /
    quality_score columns (weights mirrored in the oracle)."""
    t = F.col(text_col)
    n_tok = token_count(t)
    n_stop = F.regexp_count(F.lower(t), F.lit(STOPWORD_RE))
    n_punct = F.regexp_count(t, F.lit(PUNCT_RE))
    n_chars = F.length(t)
    stop_ratio = n_stop / F.greatest(n_tok, F.lit(1))
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1))
    avg_tok_len = (n_chars - (n_tok - 1)) / F.greatest(n_tok, F.lit(1))
    score = (
        F.least(stop_ratio * 2, F.lit(1.0)) * 0.4
        + F.least(n_tok / F.lit(64.0), F.lit(1.0)) * 0.4
        + (1 - F.least(punct_ratio * 4, F.lit(1.0))) * 0.2
    )
    return (
        df.withColumn("n_tokens", n_tok)
        .withColumn("stopword_ratio", F.round(stop_ratio, 6))
        .withColumn("punct_ratio", F.round(punct_ratio, 6))
        .withColumn("avg_token_len", F.round(avg_tok_len, 6))
        .withColumn("quality_score", F.round(score, 6))
    )


def lang_id(col: Column) -> Column:
    """Heuristic language ID from marker-word counts (argmax with the
    fixed LANG_ORDER tie-break; 'und' when no marker hits)."""
    lowered = F.lower(col)
    counts = {
        lang: F.regexp_count(lowered, F.lit(pat)) for lang, pat in LANG_MARKERS.items()
    }
    best = F.greatest(*counts.values())
    expr = F.lit("und")
    for lang in reversed(LANG_ORDER):
        expr = F.when((counts[lang] == best) & (best > 0), F.lit(lang)).otherwise(expr)
    # earlier langs in LANG_ORDER win ties -> build reversed so the
    # first's WHEN lands outermost
    return expr


def fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint: md5 of the
    whitespace-normalized, lowercased text. Identical fingerprints ==
    exact (normalized) duplicates."""
    return F.md5(F.trim(F.regexp_replace(F.lower(col), r"\s+", " ")))


#: sliding-window chunking defaults (mirrored in oracle SQL)
CHUNK_SIZE = 32
CHUNK_STRIDE = 24


def token_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = CHUNK_SIZE,
    stride: int = CHUNK_STRIDE,
) -> DataFrame:
    """Sliding token-window chunking — the training-data prep step that
    turns documents into fixed-size (overlapping) context windows.

    One generate per row (posexplode of the start-offset sequence), no
    joins, no shuffle: the plan is map-only and scales linearly with
    input splits. The tail chunk keeps whatever tokens remain.

    Returns (id_col, chunk_idx, chunk_text, n_chunk_tokens).
    """
    toks = tokens(F.col(text_col))
    return (
        df.select(id_col, toks.alias("_toks"))
        .select(
            id_col,
            F.col("_toks"),
            F.posexplode(
                F.sequence(F.lit(1), F.greatest(F.size("_toks"), F.lit(1)), F.lit(stride))
            ).alias("chunk_idx", "_start"),
        )
        .select(
            id_col,
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.array_join(F.slice("_toks", F.col("_start"), size), " ").alias("chunk_text"),
            F.least(F.lit(size), F.size("_toks") - F.col("_start") + 1)
            .cast("long")
            .alias("n_chunk_tokens"),
        )
    )


def shingles(col: Column, n: int = 3) -> Column:
    """Distinct n-word shingles of a text column (JVM-side: split +
    sequence + transform + slice — no explode until the caller wants
    one)."""
    toks = tokens(col)
    count = F.size(toks) - (n - 1)
    # sequence(1, c) steps backward when c < 1 — guard with an empty array
    return F.when(count < 1, F.array().cast("array<string>")).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), count),
                lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
            )
        )
    )


# --------------------------------------------------------------- BPE step


def bpe_top_pair_and_merge(words: DataFrame) -> tuple[DataFrame, DataFrame]:
    """One exact BPE training iteration (Sennrich et al. 2016) as pure
    relational algebra — no fold, no UDF, so Spark and any ANSI engine
    compute bit-identical results.

    Input: ``words(w, wcount)`` — the DISTINCT-word census. Everything
    downstream is vocab-sized, not corpus-sized; that is the property
    that makes BPE training distributable: the corpus is touched once
    (census), each merge iteration runs over the vocabulary.

    Greedy left-to-right non-overlapping merge is reproduced exactly
    with windows: occurrence positions of the top pair, grouped into
    consecutive runs (i - row_number), keep positions at EVEN offset
    from their run start — for a != b runs are singletons (all kept);
    for a == b (e.g. 'aaaaaa') this keeps 1st, 3rd, 5th ... exactly
    like the reference tokenizer's scan loop.

    Returns (top_pair(a, b, cnt), merged(w, wcount, i, tok)) where
    ``merged`` is the post-merge token sequence of every word.
    """
    w_ = Window.partitionBy("w").orderBy("i")
    chars = words.select(
        "w",
        "wcount",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.length("w")),
                lambda i: F.col("w").substr(i, F.lit(1)),
            )
        ).alias("i0", "ch"),
    ).select("w", "wcount", (F.col("i0") + 1).alias("i"), "ch")
    seq = chars.withColumn("nxt", F.lead("ch").over(w_))
    census = (
        seq.filter(F.col("nxt").isNotNull())
        .groupBy(F.col("ch").alias("a"), F.col("nxt").alias("b"))
        .agg(F.sum("wcount").alias("cnt"))
    )
    top = census.orderBy(F.col("cnt").desc(), "a", "b").limit(1)

    occ = (
        seq.crossJoin(F.broadcast(top.select("a", "b")))
        .filter((F.col("ch") == F.col("a")) & (F.col("nxt") == F.col("b")))
        .select("w", "i")
    )
    occ = occ.withColumn("grp", F.col("i") - F.row_number().over(w_))
    run_w = Window.partitionBy("w", "grp")
    taken = occ.withColumn("rmin", F.min("i").over(run_w)).filter(
        (F.col("i") - F.col("rmin")) % 2 == 0
    ).select("w", "i")

    # taken shares lineage with seq — rename its columns BEFORE joining
    # so the equi-join can't resolve both sides to the same attributes
    # (the cogroup-attribute-dedup hazard documented in similarity.py).
    tk = taken.select(
        F.col("w").alias("tw"), F.col("i").alias("ti"), F.lit(True).alias("tkn")
    )
    merged = (
        seq.join(tk, (F.col("w") == F.col("tw")) & (F.col("i") == F.col("ti")), "left")
        .withColumn(
            "tok",
            F.when(F.col("tkn"), F.concat("ch", "nxt")).otherwise(F.col("ch")),
        )
        .drop("tw", "ti", "tkn")
    )
    tp = taken.select(
        F.col("w").alias("pw"), (F.col("i") + 1).alias("pi")
    )
    merged = merged.join(
        tp, (F.col("w") == F.col("pw")) & (F.col("i") == F.col("pi")), "left_anti"
    ).select("w", "wcount", "i", "tok")
    return top, merged


def bpe_post_merge_census(merged: DataFrame, k: int = 15) -> DataFrame:
    """Adjacent-pair census AFTER the merge (the next iteration's
    input), top-k with deterministic tie-break."""
    w_ = Window.partitionBy("w").orderBy("i")
    seq2 = merged.withColumn("nxt", F.lead("tok").over(w_))
    return (
        seq2.filter(F.col("nxt").isNotNull())
        .groupBy(F.col("tok").alias("a"), F.col("nxt").alias("b"))
        .agg(F.sum("wcount").cast("long").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "a", "b")
        .limit(k)
    )
