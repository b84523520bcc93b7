"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

The standard LLM-training-corpus dedup ladder, each expressed as pure
DataFrame ops so Catalyst/AQE own the physical plan:

- **exact**: md5 of normalized text → groupBy. One shuffle on a 32-char
  key; at 100 TB this is the cheapest possible dedup (hash-partitioned,
  map-side partial agg).
- **MinHash + LSH**: shingle → per-shingle salted md5 → per-doc min
  (one explode + one groupBy = one shuffle on doc_id) → band hashes →
  self-join on (band, hash) buckets (shuffle on band hash, never the
  full O(n²) cross join) → exact-Jaccard verification of candidates
  only. This is the textbook near-dedup scale path.
- **SimHash**: weighted bit-vote fingerprint; one groupBy(doc, token)
  + one groupBy(doc); pairs via fingerprint-equality buckets or small
  hamming radius.
- **n-gram Jaccard**: exact pairwise Jaccard *within a blocking key* —
  quadratic inside a block, so only usable with good blocking; kept as
  the ground-truth comparator for the approximate methods.

All hashing is md5-based (functions/hashing.py) so every operator has
an exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_portofolio_spark.functions.hashing import h32, salted_md5
from etl_portofolio_spark.operators.text import tokens

NUM_MINHASHES = 16
BAND_ROWS = 4  # 16 hashes / 4 rows = 4 bands
SIMHASH_BITS = 32


def normalized_text(text: Column | str) -> Column:
    """Normalization for exact dedup: trim + lowercase + collapse spaces."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup: one row per distinct normalized text.

    Returns (content_hash, keep_id=min id, dup_count). Deterministic
    keeper choice (min id) so reruns and oracles agree.
    """
    return (
        df.select(
            F.col(id_col),
            F.md5(normalized_text(text_col)).alias("content_hash"),
        )
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def shingles(text: Column | str, k: int = 3) -> Column:
    """Distinct k-word shingles of the token stream."""
    t = tokens(text)
    n = F.size(t)
    idx = F.sequence(F.lit(1), n - F.lit(k - 1))
    make = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(t, i + F.lit(j)) for j in range(k)]),
    )
    # sequence(1, n-k+1) would count *down* when n < k; guard to empty.
    return F.when(n >= k, F.array_distinct(make)).otherwise(
        F.array().cast("array<string>")
    )


def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, num_hashes: int = NUM_MINHASHES
) -> DataFrame:
    """Per-doc MinHash signature: min salted-md5 per hash function.

    One explode + one groupBy(id) — a single shuffle keyed on the doc
    id, with map-side partial mins. Signature values are 32-char hex
    strings (min over hex == min over the 128-bit ints).
    """
    exploded = df.select(
        F.col(id_col), F.explode(shingles(text_col)).alias("shingle")
    )
    aggs = [
        F.min(salted_md5(i, "shingle")).alias(f"mh{i:02d}") for i in range(num_hashes)
    ]
    return exploded.groupBy(id_col).agg(*aggs)


def minhash_bands(
    sig: DataFrame, id_col: str, num_hashes: int = NUM_MINHASHES, rows: int = BAND_ROWS
) -> DataFrame:
    """Explode a signature frame to (id, band_id, band_hash) rows."""
    n_bands = num_hashes // rows
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.md5(
                    F.concat_ws(
                        "|", *[F.col(f"mh{b * rows + r:02d}") for r in range(rows)]
                    )
                ).alias("band_hash"),
            )
            for b in range(n_bands)
        ]
    )
    return sig.select(F.col(id_col), F.explode(bands).alias("b")).select(
        id_col, F.col("b.band_id").alias("band_id"), F.col("b.band_hash").alias("band_hash")
    )


def minhash_candidate_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.7,
    num_hashes: int = NUM_MINHASHES,
    rows: int = BAND_ROWS,
) -> DataFrame:
    """MinHash-LSH near-duplicate pairs, exact-Jaccard verified.

    Candidates come only from shared LSH buckets (equi-join on
    (band_id, band_hash)), then the *candidates only* are verified with
    exact Jaccard over distinct shingle sets. Returns
    (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.
    """
    docs = df.select(
        F.col(id_col), shingles(text_col).alias("sh_set")
    )
    sig = minhash_signatures(df, id_col, text_col, num_hashes)
    bands = minhash_bands(sig, id_col, num_hashes, rows)

    a = bands.alias("a")
    b = bands.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )

    da = docs.select(F.col(id_col).alias("id_a"), F.col("sh_set").alias("sh_a"))
    db = docs.select(F.col(id_col).alias("id_b"), F.col("sh_set").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        cands.join(da, "id_a")
        .join(db, "id_b")
        .select(
            "id_a",
            "id_b",
            (inter.cast("double") / union.cast("double")).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def simhash_fingerprints(
    df: DataFrame, id_col: str, text_col: str, bits: int = SIMHASH_BITS
) -> DataFrame:
    """SimHash: frequency-weighted bit votes over token h32 hashes.

    Two shuffles ((doc, token) count, then doc) — both keyed on the doc
    id, so AQE coalesces them; no quadratic stage anywhere.
    """
    tok = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
    weighted = (
        tok.groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("h", h32("tok"))
    )
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), b).bitwiseAND(1) == 1, F.col("cnt"))
            .otherwise(-F.col("cnt"))
        ).alias(f"bit{b:02d}")
        for b in range(bits)
    ]
    per_doc = weighted.groupBy(id_col).agg(*votes)
    fp = None
    for b in range(bits):
        term = F.when(F.col(f"bit{b:02d}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return per_doc.select(F.col(id_col), fp.cast("long").alias("simhash"))


def simhash_near_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3,
    bits: int = SIMHASH_BITS,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance.

    Blocked on half-fingerprint equality (a pair within hamming k of a
    32-bit simhash shares at least one 16-bit half when k < 16 only if
    all differing bits fall in one half — the classic pigeonhole split:
    with 2 blocks, any pair with hamming <= max_hamming <= 15 shares a
    half *only when* its diffs concentrate; to be exhaustive for
    hamming <= 3 we use 4 blocks of 8 bits: >=1 block must be equal).
    """
    fp = simhash_fingerprints(df, id_col, text_col, bits)
    n_blocks = 4
    width = bits // n_blocks
    mask = (1 << width) - 1
    blocks = F.array(
        *[
            F.struct(
                F.lit(i).alias("block_id"),
                F.shiftright(F.col("simhash"), i * width).bitwiseAND(mask).alias("block_val"),
            )
            for i in range(n_blocks)
        ]
    )
    bl = fp.select(id_col, "simhash", F.explode(blocks).alias("b")).select(
        id_col, "simhash", "b.block_id", "b.block_val"
    )
    a, b = bl.alias("a"), bl.alias("b")
    hamming = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    )
    return (
        a.join(
            b,
            (F.col("a.block_id") == F.col("b.block_id"))
            & (F.col("a.block_val") == F.col("b.block_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            hamming.alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str,
    threshold: float = 0.5,
    k: int = 3,
) -> DataFrame:
    """Exact k-gram Jaccard pairs within a blocking key.

    Quadratic *inside each block only* — the blocking column bounds the
    join fan-out (here: language). The ground-truth comparator for the
    approximate dedup operators above.
    """
    docs = df.select(
        F.col(id_col), F.col(block_col).alias("block"), shingles(text_col, k).alias("sh")
    )
    a, b = docs.alias("a"), docs.alias("b")
    inter = F.size(F.array_intersect("a.sh", "b.sh"))
    union = F.size("a.sh") + F.size("b.sh") - inter
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.block").alias("block"),
            (inter.cast("double") / union.cast("double")).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )
