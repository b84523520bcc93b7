"""Text-analysis operators for training-data pipelines.

Tokenization, quality scoring, language ID, token counting, and
document fingerprinting over a text column. All built-in expressions —
at 100 TB these run entirely inside whole-stage codegen with no Python
in the hot path and no shuffle at all (pure per-row map stage, so they
scale linearly with input splits).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from etl_portofolio_spark.functions.hashing import rolling_fingerprint

#: Whitespace tokenizer shared by every text operator (and the oracles).
TOKEN_SPLIT = r"\s+"

#: BPE-ish word/punct segmentation: alnum runs or single non-space symbols.
BPE_TOKEN_PATTERN = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"

#: Tiny per-language stopword lists for the n-gram/stopword langid
#: heuristic. Deliberately small and embedded (no external model): the
#: operator contract is the machinery, not lexicon quality.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "for", "on", "with"),
    "es": ("el", "la", "de", "y", "que", "en", "los", "se", "del", "las"),
    "de": ("der", "die", "und", "das", "ist", "von", "den", "mit", "für", "auf"),
    "fr": ("le", "la", "et", "les", "des", "une", "dans", "est", "pour", "que"),
}


def tokens(text: Column | str) -> Column:
    """Lower-cased whitespace tokens (order preserved, duplicates kept)."""
    return F.split(F.lower(F.trim(text)), TOKEN_SPLIT)


def token_count_ws(text: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text))


def token_count_bpe(text: Column | str) -> Column:
    """BPE-ish token count: alnum runs + individual symbols."""
    return F.size(
        F.regexp_extract_all(
            F.col(text) if isinstance(text, str) else text,
            F.lit(BPE_TOKEN_PATTERN),
            F.lit(0),
        )
    )


def stopword_hits(toks: Column, lang: str) -> Column:
    """Number of tokens that are stopwords of ``lang``."""
    stoplist = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(stoplist, t)))


def langid_scores(toks: Column) -> dict[str, Column]:
    """Per-language stopword-hit ratio (0..1)."""
    n = F.greatest(F.size(toks), F.lit(1))
    return {
        lang: (stopword_hits(toks, lang).cast("double") / n.cast("double"))
        for lang in LANG_STOPWORDS
    }


def langid_pick(scores: dict[str, Column]) -> Column:
    """Argmax language with deterministic ties: score desc, lang asc;
    'und' when no stopword hits at all."""
    langs = sorted(scores)  # ascending lang => deterministic tie-break
    best = None
    best_score = None
    for lang in langs:
        if best is None:
            best, best_score = F.lit(lang), scores[lang]
        else:
            cond = scores[lang] > best_score
            best = F.when(cond, F.lit(lang)).otherwise(best)
            best_score = F.when(cond, scores[lang]).otherwise(best_score)
    return F.when(best_score > 0, best).otherwise(F.lit("und"))


def punct_count(text: Column | str) -> Column:
    """Count of non-alnum, non-space characters."""
    c = F.col(text) if isinstance(text, str) else text
    return F.length(c) - F.length(F.regexp_replace(c, r"[^A-Za-z0-9\s]", ""))


def quality_features(text: Column | str) -> dict[str, Column]:
    """Length/punct/stopword quality features + a composite score.

    The score formula is arbitrary but fixed: it rewards mid-length
    documents with low punctuation density and a natural stopword rate —
    the standard cheap pre-filter shape for LLM training corpora.
    """
    c = F.col(text) if isinstance(text, str) else text
    toks = tokens(c)
    n_chars = F.length(c)
    n_toks = F.size(toks)
    sum_tok_len = F.aggregate(
        F.transform(toks, lambda t: F.length(t)),
        F.lit(0),
        lambda a, x: a + x,
    )
    avg_token_len = sum_tok_len.cast("double") / F.greatest(n_toks, F.lit(1)).cast("double")
    p_cnt = punct_count(c)
    punct_ratio = p_cnt.cast("double") / F.greatest(n_chars, F.lit(1)).cast("double")
    stop_ratio = stopword_hits(toks, "en").cast("double") / F.greatest(n_toks, F.lit(1)).cast("double")
    score = (
        F.lit(0.4) * F.least(n_toks.cast("double") / F.lit(64.0), F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - F.least(punct_ratio * F.lit(4.0), F.lit(1.0)))
        + F.lit(0.3) * F.least(stop_ratio * F.lit(4.0), F.lit(1.0))
    )
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_toks.cast("long"),
        "n_tokens_bpe": token_count_bpe(c).cast("long"),
        "avg_token_len": avg_token_len,
        "punct_ratio": punct_ratio,
        "stopword_ratio": stop_ratio,
        "quality_score": score,
    }


def repetition_features(toks: Column) -> dict[str, Column]:
    """Within-document repetition signals over a MATERIALIZED token array.

    ``repetition_ratio`` = 1 - distinct/total tokens (0 = no repeats);
    ``top_token_ratio`` = share of the single most frequent token — the
    cheap "degenerate doc" detectors (boilerplate, keyword stuffing,
    decode loops) every training-corpus quality pass runs. Pure
    per-row array expressions: no shuffle, no Python. ``toks`` must be
    an attribute reference (see :func:`~etl_portofolio_spark.operators.
    dedup.shingles_of` for the HOF re-evaluation pitfall).
    """
    n = F.size(toks)
    n_distinct = F.size(F.array_distinct(toks))
    safe_n = F.greatest(n, F.lit(1)).cast("double")
    top_freq = F.array_max(
        F.transform(
            F.array_distinct(toks),
            lambda t: F.size(F.filter(toks, lambda x: x == t)),
        )
    )
    return {
        "n_tokens": n.cast("long"),
        "n_distinct": n_distinct.cast("long"),
        "repetition_ratio": F.lit(1.0) - n_distinct.cast("double") / safe_n,
        "top_token_ratio": top_freq.cast("double") / safe_n,
    }


def doc_fingerprint(text: Column | str) -> Column:
    """Order-sensitive rolling-hash fingerprint of the token stream."""
    return rolling_fingerprint(tokens(text))


# --- PII redaction -----------------------------------------------------------

#: (name, pattern, replacement) — intentionally simple regexes that parse
#: identically under Java (Spark) and RE2-ish (DuckDB) dialects: no
#: lookaround, no backreferences. Order matters: emails before phones so
#: the local-part digits are not half-eaten by the phone pattern.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+?[0-9][0-9()\-\s]{6,}[0-9]", "<PHONE>"),
)


def redact_pii(text: Column | str) -> Column:
    """Chained regexp_replace over :data:`PII_PATTERNS` — pure codegen,
    zero shuffle, the standard pre-training scrub pass."""
    c = F.col(text) if isinstance(text, str) else text
    for _, pat, repl in PII_PATTERNS:
        c = F.regexp_replace(c, pat, repl)
    return c


def pii_counts(text: Column | str) -> dict[str, Column]:
    """Per-kind match counts (audit columns for the scrub report)."""
    c = F.col(text) if isinstance(text, str) else text
    return {
        name: F.size(F.regexp_extract_all(c, F.lit(f"({pat})"), 1)).cast("long")
        for name, pat, _ in PII_PATTERNS
    }


# --- TF-IDF ------------------------------------------------------------------


def tfidf_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
) -> DataFrame:
    """Top-k TF-IDF terms per document: (id, tok, tf, df, score, rank).

    Three shuffles, all on bounded keys: tf = groupBy(doc, token); df =
    groupBy(token) with map-side partials (output is vocabulary-sized);
    the df side joins back BROADCAST (a vocabulary fits in memory at any
    corpus size that fits a dictionary — swap to a shuffle join only for
    web-scale open vocabularies); final per-doc ranking is a window over
    doc_id. idf uses the smoothed form ln((N+1)/(df+1)) + 1, N computed
    as a broadcast scalar, not a driver constant baked into the plan.
    Ties rank deterministically (score desc, token asc).

    The score is rounded to 6 decimals BEFORE ranking: ``ln`` is not
    correctly rounded, and JVM Math.log vs DuckDB libm disagree by one
    ulp on some inputs (first observed at sf0.1 — the sf0.01 gate never
    hit a disagreeing argument). Ranking on the rounded score means
    neither the emitted value nor the rank order can depend on which
    libm computed it; sub-1e-6 score gaps resolve by the token
    tiebreak identically on both engines.
    """
    from etl_portofolio_spark.operators.util import spread

    tok = spread(df).select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
    tf = tok.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.countDistinct(id_col).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(dfreq), "tok")
        .join(F.broadcast(n_docs))
        .withColumn(
            "score",
            F.round(
                F.col("tf")
                * (
                    F.log((F.col("n_docs") + 1).cast("double") / (F.col("df") + 1))
                    + F.lit(1.0)
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("tok").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(F.col(id_col), "tok", "tf", "df", "score", "rank")
    )


#: Quality-funnel rule order: each doc is charged to the FIRST rule it
#: fails. Every rule compares exact integers (ratios expressed by
#: cross-multiplication), so the report is bit-identical across engines
#: and the single-pass aggregation is map-side combinable.
FUNNEL_RULES = ("too_short", "punct_heavy", "low_stopword", "repetitive")


def quality_funnel_verdict(text_col: Column | str) -> Column:
    """Per-doc funnel verdict: first failing rule name, or 'pass'."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    toks = tokens(c)
    n_chars = F.length(c)
    n_toks = F.size(toks)
    p_cnt = punct_count(c)
    stop_hits = stopword_hits(toks, "en")
    n_distinct = F.size(F.array_distinct(toks))
    return (
        F.when(n_toks < 8, F.lit("too_short"))
        .when(p_cnt * 10 >= n_chars, F.lit("punct_heavy"))
        .when(stop_hits * 50 < n_toks, F.lit("low_stopword"))
        .when(n_distinct * 2 < n_toks, F.lit("repetitive"))
        .otherwise(F.lit("pass"))
    )


def quality_funnel_report(
    df: DataFrame, text_col: str, group_col: str
) -> DataFrame:
    """Data-quality funnel per group: how many docs each rule rejects
    (first-failure attribution) and how many survive. The pipeline
    observability report every corpus-cleaning run needs — one pass,
    one shuffle on the (small) group key, conditional-sum aggregates."""
    verdict = quality_funnel_verdict(text_col).alias("__verdict")
    counts = [
        F.sum(F.when(F.col("__verdict") == r, 1).otherwise(0))
        .cast("long")
        .alias(f"r_{r}")
        for r in FUNNEL_RULES
    ]
    return (
        df.select(F.col(group_col), verdict)
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            *counts,
            F.sum(F.when(F.col("__verdict") == "pass", 1).otherwise(0))
            .cast("long")
            .alias("n_survivors"),
        )
    )


def chunk_manifest(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Overlapping fixed-token-window chunk manifest (RAG/embedding prep).

    chunk_count = 1 + ceil(max(n − window, 0)/stride): every token is
    covered by at least one chunk, the final partial chunk is kept, and
    boundaries depend only on the doc itself — stable under corpus
    growth and repartitioning. Map-only (explode of a per-doc index
    sequence + array slices, zero shuffles); emits
    (id, chunk_id, start_tok, n_tok_chunk, chunk_hash) with the chunk
    text carried as an md5 so the manifest stays narrow.
    """
    if window < 1 or stride < 1 or stride > window:
        raise ValueError(
            f"need 1 <= stride ({stride}) <= window ({window}) for gapless chunks"
        )
    toks = tokens(text_col)
    n = F.size(toks)
    n_chunks = F.lit(1) + F.ceil(
        F.greatest(n - window, F.lit(0)).cast("double") / F.lit(float(stride))
    ).cast("int")
    exploded = df.select(
        F.col(id_col),
        toks.alias("__t"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
    )
    start = F.col("chunk_id") * stride + 1
    chunk = F.slice(F.col("__t"), start, window)
    return exploded.select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        start.cast("long").alias("start_tok"),
        F.size(chunk).cast("long").alias("n_tok_chunk"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_hash"),
    )


def compression_ratio(
    df, id_col: str, text_col: str, level: int = 6
):
    """Per-doc zlib compression ratio — the Gopher-style redundancy
    signal (template spam and boilerplate compress far below natural
    prose; random noise compresses above it).

    zlib is not expressible in SQL, so this is one of the engine's few
    Arrow ``mapInPandas`` crossings: batches of (id, text) in, batches
    of (id, n_bytes, n_compressed, ratio) out — no state, no shuffle,
    scan-parallel. DETERMINISTIC for a fixed zlib version/level
    (identical input bytes → identical stream), which the operator
    test pins with known strings; there is no DuckDB oracle twin, so
    the gate is the test, not the differential.
    """
    import pandas as pd
    import zlib

    def score(batches):
        for pdf in batches:
            raw = pdf[text_col].fillna("").str.encode("utf-8")
            n = raw.str.len()
            comp = raw.map(lambda b: len(zlib.compress(b, level)))
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": n.astype("int64"),
                    "n_compressed": comp.astype("int64"),
                    "ratio": (
                        comp / n.where(n > 0, 1)
                    ).round(6),
                }
            )

    schema = (
        f"{id_col} long, n_bytes long, n_compressed long, ratio double"
    )
    return df.select(id_col, text_col).mapInPandas(score, schema=schema)


def nfc_normalized(col: "Column | str") -> "Column":
    """Unicode NFC normalization — the one text-cleaning primitive
    Spark's built-ins cannot express (no JVM-side normalizer is
    exposed to SQL), so this is the engine's canonical SCALAR Pandas
    UDF: Arrow-batched, vectorized over the column, stateless.

    Why it exists in a dedup engine: "café" composed (U+00E9) and
    decomposed (e + U+0301) are DIFFERENT strings carrying the SAME
    text — every hash-based dedup (exact, minhash, simhash) treats
    them as distinct documents unless normalization runs first.  NFC
    before hashing is the standard fix (DuckDB ships the same
    operation as ``nfc_normalize``, which is what makes this UDF
    oracle-checkable).
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _nfc_fn(s):
        import unicodedata

        return s.map(
            lambda x: unicodedata.normalize("NFC", x) if x is not None else None
        )

    # pandas_udf requires REAL type objects in the signature; this
    # module's `from __future__ import annotations` would stringify
    # inline hints (UNSUPPORTED_SIGNATURE), so set them explicitly
    _nfc_fn.__annotations__ = {"s": pd.Series, "return": pd.Series}
    _nfc = pandas_udf(_nfc_fn, "string")
    return _nfc(F.col(col) if isinstance(col, str) else col)
