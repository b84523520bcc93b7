"""Similarity search over embedding columns (array<float>).

- **Brute-force cosine top-k**: queries × corpus with a window top-k.
  Exact baseline; O(|Q|·|C|), viable when |Q| is small or as the
  per-bucket kernel below.
- **LSH-bucketed ANN**: random-hyperplane signatures (sign bits) →
  candidates share a bucket → exact cosine on candidates only. The
  100 TB scale path: the corpus shuffles once on the bucket key; no
  cross join ever materializes.

Dot products are computed with ``zip_with`` + left-to-right
``aggregate`` folds over double-cast elements — sequential IEEE adds,
so the DuckDB oracle (``list_reduce`` over the same order) is
bit-identical. Hyperplanes are deterministic md5-derived ±1 matrices
generated in Python (hashlib) and inlined as literals into BOTH the
Spark plan and the oracle SQL.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

NUM_HYPERPLANES = 8


def _dvec(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product (deterministic IEEE order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_fold_pd(a: Column, b: Column) -> Column:
    """Arrow-vectorized twin of :func:`cosine`, bit-identical by
    construction: the accumulation runs PER DIMENSION IN ORDER
    (``acc = acc + a_j*b_j`` for j = 0..d-1, each step vectorized
    across the row batch), so every row replays the exact left-fold
    IEEE order of the expression form — and of the DuckDB
    ``list_reduce`` oracle — while numpy does the per-step arithmetic
    on whole Arrow batches instead of Catalyst interpreting ~4·d
    expression nodes per row (the interpreted-HOF cost class flagged
    in the r7 verdict for the retrieval-eval queries).

    NOT np.dot/BLAS: pairwise/SIMD summation reorders the adds and
    drifts ulps from the oracle's sequential fold. Ragged or null
    vectors fall back to an explicit per-row loop with the same order.
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _cos_fn(va, vb):
        import numpy as np

        n = len(va)
        if n == 0:
            return pd.Series([], dtype="float64")
        rows_a = va.to_numpy()
        rows_b = vb.to_numpy()
        lens_ok = all(
            ra is not None and rb is not None and len(ra) == len(rows_a[0])
            and len(rb) == len(rows_a[0])
            for ra, rb in zip(rows_a, rows_b)
        )
        if lens_ok and len(rows_a[0]) > 0:
            A = np.stack([np.asarray(r, dtype=np.float64) for r in rows_a])
            B = np.stack([np.asarray(r, dtype=np.float64) for r in rows_b])
            acc = np.zeros(n, dtype=np.float64)
            na = np.zeros(n, dtype=np.float64)
            nb = np.zeros(n, dtype=np.float64)
            for j in range(A.shape[1]):  # sequential over dims = fold order
                acc = acc + A[:, j] * B[:, j]
                na = na + A[:, j] * A[:, j]
                nb = nb + B[:, j] * B[:, j]
            return pd.Series(acc / (np.sqrt(na) * np.sqrt(nb)))
        out = []
        for ra, rb in zip(rows_a, rows_b):
            if ra is None or rb is None:
                out.append(None)
                continue
            acc = 0.0
            na_s = 0.0
            nb_s = 0.0
            for x, y in zip(ra, rb):
                acc = acc + float(x) * float(y)
                na_s = na_s + float(x) * float(x)
                nb_s = nb_s + float(y) * float(y)
            import math

            out.append(acc / (math.sqrt(na_s) * math.sqrt(nb_s)))
        return pd.Series(out, dtype="float64")

    _cos_fn.__annotations__ = {"va": pd.Series, "vb": pd.Series, "return": pd.Series}
    return pandas_udf(_cos_fn, "double")(a, b)


def hyperplane_matrix(num_planes: int, dim: int) -> list[list[int]]:
    """Deterministic ±1 hyperplanes: sign from md5(f"{plane}:{dim}").

    Generated driver-side with hashlib (same md5 as both engines) and
    inlined as literals, so Spark plan and oracle SQL share the exact
    matrix without re-hashing per row.
    """
    mat = []
    for p in range(num_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{p}:{d}".encode()).hexdigest()
            row.append(1 if int(h[:2], 16) % 2 == 1 else -1)
        mat.append(row)
    return mat


def lsh_bucket(vec: Column, planes: list[list[int]]) -> Column:
    """Sign-bit bucket id from the hyperplane matrix (long)."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(float(w)) for w in plane]),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def topk(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_ids: tuple[int, ...] = (0, 1, 2, 3, 4),
    k: int = 5,
) -> DataFrame:
    """Default exact top-k kernel: numpy/BLAS per-partition pre-prune.

    Library entry point. Dispatches to :func:`brute_force_topk_np`
    (Arrow batches + one BLAS matmul per partition, only
    |partitions|·k rows leave Python — the shape that scales with |Q|)
    and falls back to the expression-fold :func:`brute_force_topk` when
    numpy is unavailable. The expression form stays the bit-exact
    oracle comparator; this facade is what callers should use.
    """
    try:
        import numpy  # noqa: F401
    except ImportError:  # pragma: no cover - numpy ships in the env
        return brute_force_topk(emb, id_col, vec_col, query_ids, k)
    return brute_force_topk_np(emb, id_col, vec_col, query_ids, k)


def brute_force_topk(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_ids: tuple[int, ...] = (0, 1, 2, 3, 4),
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k: tiny query set broadcast against the corpus.

    The query side is broadcast (it is k rows), so the corpus never
    shuffles; ranking is a window over the query id — partition count =
    |Q|, each partition |C| rows, degenerate when |Q| grows; the numpy
    kernel behind :func:`topk` pre-prunes per partition and is the
    default. This expression-fold form is kept as the deterministic
    (sequential IEEE adds) oracle comparator.
    """
    docs = emb.select(F.col(id_col), _dvec(vec_col).alias("v"))
    queries = docs.where(F.col(id_col).isin(*query_ids)).select(
        F.col(id_col).alias("query_id"), F.col("v").alias("qv")
    )
    pairs = docs.join(F.broadcast(queries), F.col(id_col) != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        cosine(F.col("qv"), F.col("v")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def lsh_ann_topk(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    num_planes: int = NUM_HYPERPLANES,
    k: int = 3,
) -> DataFrame:
    """ANN top-k: exact cosine *within* each hyperplane-LSH bucket.

    Every vector gets a sign-bit bucket; candidates are same-bucket
    pairs (equi-join on the bucket key — one shuffle, no cross join).
    Approximate by construction: recall misses neighbors that land in
    other buckets; raise recall with fewer planes or multi-probe.
    """
    planes = hyperplane_matrix(num_planes, dim)
    docs = emb.select(F.col(id_col), _dvec(vec_col).alias("v")).withColumn(
        "bucket", lsh_bucket(F.col("v"), planes)
    )
    a, b = docs.alias("a"), docs.alias("b")
    scored = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") != F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("query_id"),
            F.col("a.bucket").alias("bucket"),
            F.col(f"b.{id_col}").alias("neighbor_id"),
            cosine(F.col("a.v"), F.col("b.v")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "bucket", "neighbor_id", "cosine", "rank")
    )


def brute_force_topk_np(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_ids: tuple[int, ...] = (0, 1, 2, 3, 4),
    k: int = 5,
) -> DataFrame:
    """Vectorized brute-force top-k: numpy matmul inside mapInPandas.

    The Arrow fast path for wide embeddings: each partition's vectors
    arrive as one pandas batch, cosines against the (tiny, driver-
    collected) query matrix are one BLAS ``A @ Q.T``, and only each
    partition's local top-k rows leave Python — a per-partition
    pre-prune, so the final exact window ranks |partitions|·k rows per
    query instead of the whole corpus. Same contract as
    :func:`brute_force_topk`; cosines differ only by float-summation
    order (BLAS vs sequential fold), so this variant has no exact SQL
    oracle and is verified against the expression version in tests.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    rows = (
        emb.where(F.col(id_col).isin(*query_ids))
        .select(id_col, vec_col)
        .collect()
    )
    q_ids = np.array([r[0] for r in rows], dtype="int64")
    q_mat = np.array([r[1] for r in rows], dtype="float64")
    q_mat /= np.linalg.norm(q_mat, axis=1, keepdims=True)

    schema = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def score(batches):
        for pdf in batches:
            ids = pdf[id_col].to_numpy(dtype="int64")
            mat = np.array(list(pdf[vec_col]), dtype="float64")
            mat /= np.linalg.norm(mat, axis=1, keepdims=True)
            sims = mat @ q_mat.T  # (n_batch, n_queries)
            out_q, out_n, out_c = [], [], []
            for j, qid in enumerate(q_ids):
                col = sims[:, j]
                mask = ids != qid
                cand_idx = np.nonzero(mask)[0]
                if len(cand_idx) > k:
                    part = cand_idx[np.argpartition(-col[cand_idx], k)[:k]]
                else:
                    part = cand_idx
                out_q.extend([qid] * len(part))
                out_n.extend(ids[part].tolist())
                out_c.extend(col[part].tolist())
            yield pd.DataFrame(
                {"query_id": out_q, "neighbor_id": out_n, "cosine": out_c}
            )

    scored = emb.select(id_col, vec_col).mapInPandas(score, schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ivf_assign(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_centroids: int = 8,
) -> DataFrame:
    """IVF coarse quantization: nearest-centroid cluster per vector.

    The coarse codebook here is the deterministic "first
    ``num_centroids`` vectors" (in production: k-means centroids trained
    offline and broadcast the same way — the assignment plan is
    identical). Centroids broadcast to every executor; assignment is a
    map-side argmax (row_number over per-vector centroid scores), so the
    corpus is scanned once and shuffles only on (vector, K) ranking keys.
    Ties break toward the lowest centroid id, deterministically.
    """
    docs = emb.select(F.col(id_col), _dvec(vec_col).alias("v"))
    cents = docs.where(F.col(id_col) < num_centroids).select(
        F.col(id_col).alias("centroid_id"), F.col("v").alias("cv")
    )
    scored = docs.join(F.broadcast(cents)).withColumn(
        "sim", cosine(F.col("v"), F.col("cv"))
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("sim").desc(), F.col("centroid_id").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select(F.col(id_col), F.col("v"), F.col("centroid_id").alias("cluster_id"))
    )


def ivf_topk(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_ids: tuple[int, ...] = (0, 1, 2, 3, 4),
    num_centroids: int = 8,
    k: int = 3,
) -> DataFrame:
    """IVF ANN top-k: exact cosine within the query's own cluster only.

    nprobe=1 inverted-file search: each query scans just its cluster's
    inverted list (join on cluster_id — one shuffle of the assigned
    corpus, no cross join). Recall rises by probing more clusters;
    the LSH variant is the rotation-free alternative.

    The assignment frame feeds both the query and corpus sides, so it
    is persisted; the caller releases it after consuming the returned
    plan via ``caching.release_cached()`` (see ``caching.py``).
    """
    from etl_portofolio_spark.caching import scoped_persist

    assigned = scoped_persist(ivf_assign(emb, id_col, vec_col, num_centroids))
    queries = assigned.where(F.col(id_col).isin(*query_ids)).select(
        F.col(id_col).alias("query_id"),
        F.col("v").alias("qv"),
        F.col("cluster_id").alias("q_cluster"),  # renamed: disambiguates self-join
    )
    scored = assigned.join(
        F.broadcast(queries),
        (F.col("cluster_id") == F.col("q_cluster"))
        & (F.col(id_col) != F.col("query_id")),
    ).select(
        "query_id",
        "cluster_id",
        F.col(id_col).alias("neighbor_id"),
        cosine(F.col("qv"), F.col("v")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "cluster_id", "neighbor_id", "cosine", "rank")
    )


def ivf_multiprobe_topk(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_ids: tuple[int, ...] = (0, 1, 2, 3, 4),
    num_centroids: int = 8,
    nprobe: int = 2,
    k: int = 3,
) -> DataFrame:
    """IVF ANN top-k probing each query's ``nprobe`` nearest clusters.

    The recall dial that makes IVF production-viable: a query whose
    true neighbors straddle a Voronoi boundary misses them at
    nprobe=1; probing the next-nearest centroids recovers them for
    ``nprobe×`` list-scan cost (still |corpus|/K per probe — never a
    full scan). The probe set is a per-query centroid ranking
    (broadcast centroids, map-side), so the only corpus-side work
    remains the equi-join on cluster id. Each corpus vector lives in
    exactly one inverted list, so multi-probe candidates need no
    dedup. The assignment persist is caller-released
    (``caching.release_cached()``).
    """
    from etl_portofolio_spark.caching import scoped_persist

    assigned = scoped_persist(ivf_assign(emb, id_col, vec_col, num_centroids))
    docs = emb.select(F.col(id_col), _dvec(vec_col).alias("v"))
    cents = docs.where(F.col(id_col) < num_centroids).select(
        F.col(id_col).alias("centroid_id"), F.col("v").alias("cv")
    )
    q_scored = (
        docs.where(F.col(id_col).isin(*query_ids))
        .join(F.broadcast(cents))
        .withColumn("sim", cosine(F.col("v"), F.col("cv")))
    )
    wp = Window.partitionBy(id_col).orderBy(
        F.col("sim").desc(), F.col("centroid_id").asc()
    )
    probes = (
        q_scored.withColumn("__rn", F.row_number().over(wp))
        .where(F.col("__rn") <= nprobe)
        .select(
            F.col(id_col).alias("query_id"),
            F.col("v").alias("qv"),
            F.col("centroid_id").alias("probe_cluster"),
        )
    )
    scored = assigned.join(
        F.broadcast(probes),
        (F.col("cluster_id") == F.col("probe_cluster"))
        & (F.col(id_col) != F.col("query_id")),
    ).select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        cosine(F.col("qv"), F.col("v")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def embedding_near_dup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.35,
    dim: int = 64,
    num_planes: int = 2,
    num_tables: int = 6,
    cosine_fn=None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via multi-table LSH blocking.

    ``cosine_fn`` selects the candidate-scoring kernel: the default
    expression fold (:func:`cosine`, interpretable by plan tests) or
    the bit-identical Arrow-vectorized :func:`cosine_fold_pd` for
    callers whose candidate volume makes interpreted HOFs the
    bottleneck (e.g. ``embedding_mutual_knn``'s 8-bit x 6-table keys).

    OR-amplified hyperplane LSH: each vector gets ``num_tables``
    independent sign-bit bucket keys (``num_planes`` bits each);
    candidates are pairs sharing (table, bucket) — an EQUI-join on the
    composite key, one shuffle, never an all-pairs cross join (the r1
    cartesian form survives only as :func:`embedding_near_dup_pairs_exact`,
    the pytest recall comparator). Exact cosine + threshold runs on
    candidates only; ``distinct()`` collapses pairs colliding in several
    tables (cosine is deterministic, so the triple is identical).

    Recall for a pair at angle θ: 1 - (1 - (1-θ/π)^planes)^tables.
    Defaults (2 planes × 6 tables) target the fixture's low-similarity
    dup band (cos 0.35–0.7 → θ 55–70°: recall ≈ 0.94–0.97). Real
    corpora dedup at cos ≥ 0.8+, where fewer tables with MORE planes
    (e.g. 8×4) give the same recall with far smaller buckets — the
    knobs exist for exactly that trade.
    """
    if cosine_fn is None:
        cosine_fn = cosine
    planes_all = hyperplane_matrix(num_tables * num_planes, dim)
    docs = emb.select(F.col(id_col), _dvec(vec_col).alias("v"))
    entries = []
    for t in range(num_tables):
        tp = planes_all[t * num_planes : (t + 1) * num_planes]
        entries.append(
            F.struct(
                F.lit(t).alias("t"), lsh_bucket(F.col("v"), tp).alias("b")
            )
        )
    keyed = (
        docs.select(F.col(id_col), "v", F.explode(F.array(*entries)).alias("tb"))
        .select(
            F.col(id_col),
            "v",
            F.col("tb.t").alias("t"),
            F.col("tb.b").alias("b"),
        )
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    return (
        a.join(
            b,
            (F.col("a.t") == F.col("b.t"))
            & (F.col("a.b") == F.col("b.b"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            cosine_fn(F.col("a.v"), F.col("b.v")).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
        .distinct()
    )


def embedding_near_dup_pairs_exact(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.35,
) -> DataFrame:
    """All-pairs exact near-dup (id_a < id_b) — TEST COMPARATOR ONLY.

    O(n²) cartesian self-join: the recall ground truth for
    :func:`embedding_near_dup_pairs` in pytest. Never registered as a
    driver query and never the scale path.
    """
    docs = emb.select(F.col(id_col), _dvec(vec_col).alias("v"))
    a, b = docs.alias("a"), docs.alias("b")
    return (
        a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            cosine(F.col("a.v"), F.col("b.v")).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


QUANT_ERR_GATE = 0.001


def int8_quantize_audit(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    err_gate: float = QUANT_ERR_GATE,
) -> DataFrame:
    """Per-vector int8 scalar quantization with reconstruction audit.

    code = round((x−lo)·255/span), recon = lo + code·span/255, with
    lo/span the VECTOR's own min/range — per-vector scale keeps the
    whole computation element-wise over the array column: a map-only
    plan with no explode, no join, no shuffle (the layout int8 ANN
    stores use, and the shape that streams at 100 TB with zero
    coordination). Outputs integer code checksum + coarse-dim count
    and the order-free max abs error (rounded). Zero-span vectors
    quantize to code 0 with zero error.
    """
    base = emb.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).select(
        id_col,
        "v",
        F.array_min("v").alias("lo"),
        (F.array_max("v") - F.array_min("v")).alias("span"),
    )
    lo, span = F.col("lo"), F.col("span")

    def code(x: Column) -> Column:
        return F.when(
            span != 0, F.round((x - lo) * F.lit(255.0) / span, 0)
        ).otherwise(F.lit(0.0))

    def err(x: Column) -> Column:
        return F.abs(x - (lo + code(x) * span / F.lit(255.0)))

    codes = F.transform("v", lambda x: code(x).cast("long"))
    errs = F.transform("v", err)
    return base.select(
        id_col,
        F.size("v").alias("n_dims"),
        F.aggregate(codes, F.lit(0).cast("long"), lambda a, x: a + x).alias(
            "code_sum"
        ),
        F.round(F.array_max(errs), 6).alias("max_abs_err"),
        F.size(F.filter(errs, lambda e: e > F.lit(err_gate))).alias(
            "n_coarse_dims"
        ),
    )


def kmeans_fit(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    iterations: int = 3,
) -> DataFrame:
    """Full Lloyd loop on DataFrames; returns the final assignment
    ``(id, cluster_id)``.

    The k-means topology that scales: centroids are k×d doubles held
    DRIVER-side (bounded metadata — the one collect per round is k·d
    numbers, never corpus rows) and re-broadcast each round as a
    literal frame, so ASSIGNMENT is a broadcast join + per-row rank
    (map-side over the corpus, no shuffle) and the UPDATE is one
    posexplode + one combinable (cluster, dim) aggregation — the
    ``kmeans_update_step`` query is one turn of this crank. Seeds are
    the deterministic first-k codebook (``ivf_assign``'s convention),
    assignment by cosine with the centroid-id tiebreak, update by
    arithmetic mean. Empty clusters keep their previous centroid.

    The corpus projection is scoped-persisted (two reads per round);
    the caller releases via ``caching.release_cached()``.
    """
    from etl_portofolio_spark.caching import scoped_persist

    if k < 1 or iterations < 1:
        raise ValueError("k and iterations must be >= 1")
    spark = emb.sparkSession
    docs = scoped_persist(emb.select(F.col(id_col), _dvec(vec_col).alias("v")))
    seed_rows = (
        docs.where(F.col(id_col) < k)
        .select(F.col(id_col).cast("long").alias("cid"), "v")
        .collect()
    )
    centroids: dict[int, list[float]] = {
        int(r["cid"]): [float(x) for x in r["v"]] for r in seed_rows
    }

    def assign(cent: dict[int, list[float]]) -> DataFrame:
        cents = F.broadcast(
            spark.createDataFrame(
                [(cid, vec) for cid, vec in sorted(cent.items())],
                "centroid_id long, cv array<double>",
            )
        )
        w = Window.partitionBy(id_col).orderBy(
            F.col("sim").desc(), F.col("centroid_id").asc()
        )
        return (
            docs.join(cents)
            .withColumn("sim", cosine(F.col("v"), F.col("cv")))
            .withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .select(F.col(id_col), "v", F.col("centroid_id").alias("cluster_id"))
        )

    assigned = None
    for _ in range(iterations):
        assigned = assign(centroids)
        new_rows = (
            assigned.select("cluster_id", F.posexplode("v").alias("dim", "val"))
            .groupBy("cluster_id", "dim")
            .agg((F.sum("val") / F.count(F.lit(1))).alias("m"))
            .collect()  # k*d rows — bounded metadata, never corpus-scale
        )
        by_cid: dict[int, dict[int, float]] = {}
        for r in new_rows:
            by_cid.setdefault(int(r["cluster_id"]), {})[int(r["dim"])] = float(
                r["m"]
            )
        for cid, dims in by_cid.items():
            centroids[cid] = [dims[d] for d in sorted(dims)]
    return assigned.select(id_col, "cluster_id")


def int8_quantize_codes(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector int8 codes + the (lo, span) needed to dequantize —
    the storage form of :func:`int8_quantize_audit` (which emits the
    audit stats instead). Same map-only, shuffle-free shape; the
    reconstruction ``lo + code·span/255`` is within span/510 of the
    original (property-tested on the audit twin).
    """
    base = emb.select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).select(
        id_col,
        "v",
        F.array_min("v").alias("lo"),
        (F.array_max("v") - F.array_min("v")).alias("span"),
    )
    lo, span = F.col("lo"), F.col("span")
    codes = F.transform(
        "v",
        lambda x: F.when(span != 0, F.round((x - lo) * F.lit(255.0) / span, 0))
        .otherwise(F.lit(0.0))
        .cast("int"),
    )
    return base.select(id_col, "lo", "span", codes.alias("codes"))


# --- product quantization (PQ) ---------------------------------------------

#: PQ layout: m subspaces of dim/m dims, k centroids per subspace.
#: 8x8 = 3-bit codes per subspace -> a 64-dim float vector compresses
#: to 8 small ints (the 100 TB point: the ADC scan touches codes +
#: per-query lookup tables, never the original vectors).
PQ_SUBSPACES = 8
PQ_CENTROIDS = 8


def pq_seed_codebook(
    emb: DataFrame,
    m: int = PQ_SUBSPACES,
    k: int = PQ_CENTROIDS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Data-aligned PQ codebook: cb[j][c] is the j-th subvector of the
    corpus vector with ``id_col == c`` — the k-means SEED convention
    this engine already uses for IVF (``ivf_assign``: centroids =
    vec_id < k). The collect is a bounded k-row panel (k x dim floats),
    the same budget as the ANN query panels.

    A production deployment would refine these seeds offline with
    :func:`kmeans_fit` per subspace and ship the result the same way —
    as driver literals baked into the encode projection.  Seeds alone
    keep every centroid value bit-identical to what the oracle recomputes
    from the table (float32 -> double widening is exact), which is what
    makes the whole PQ pipeline hash-checkable; a Lloyd refinement
    would introduce cross-engine float-sum ordering into the codebook
    itself.
    """
    rows = (
        emb.where(F.col(id_col) < k)
        .select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("v"))
        .collect()
    )
    by_id = {int(r[0]): list(r[1]) for r in rows}
    if len(by_id) < k:  # pragma: no cover - fixture always has ids 0..k-1
        raise ValueError(f"need vectors with {id_col} 0..{k - 1} as PQ seeds")
    dim = len(next(iter(by_id.values())))
    sub = dim // m
    return [
        [by_id[c][j * sub : (j + 1) * sub] for c in range(k)]
        for j in range(m)
    ]


def _pq_score_sql(vec_name: str, j: int, centroid: list[float], sub: int) -> str:
    """Rank-surrogate for the squared L2 distance to a literal
    centroid: ``|c|² − 2·x·c`` (the ``|x|²`` term is constant per
    (vector, subspace), so argmin and shortlist order are unchanged).

    The dot form needs one multiply per dim instead of a duplicated
    (x−c)·(x−c) subtree — ~3x fewer expression nodes across the
    m·k·sub unrolling, which is what keeps analysis+codegen cost flat.
    ``|c|²`` folds to a Python-float literal (left-associated, the
    same IEEE order the oracle's SQL fold uses), and the dot is a
    fixed-order element_at chain — the identical expression tree the
    oracle generates, so doubles match bit-exact.

    Emitted as a SQL STRING, parsed JVM-side in one call per subspace
    (see :func:`_pq_score_array`): the same tree built through Column
    arithmetic costs ~26 py4j round-trips per (subspace, centroid) —
    measured 3.9 s of driver time per encode at m=k=8 vs 0.7 s for
    the string form, with bit-identical codes (``repr(float)`` + a
    ``D`` suffix round-trips every FINITE IEEE double exactly).

    Non-finite literals are rejected loudly: ``repr(inf)`` would emit
    ``infD`` (parsed as a column name → confusing analysis error), and
    a centroid whose |c|² overflows cannot rank candidates anyway —
    property-tested in ``test_properties.py``."""
    import math

    k_const = 0.0
    for w in centroid:
        if not math.isfinite(w):
            raise ValueError(
                f"PQ centroid contains non-finite value {w!r}; clean the "
                "embedding column before building a codebook"
            )
        k_const = k_const + w * w
    if not math.isfinite(k_const):
        raise ValueError(
            "PQ centroid norm |c|^2 overflowed to non-finite; rescale the "
            "embedding column before building a codebook"
        )
    dot = " + ".join(
        f"element_at({vec_name}, {j * sub + d + 1}) * {w!r}D"
        for d, w in enumerate(centroid)
    )
    return f"{k_const!r}D - 2.0D * ({dot})"


def _pq_score_array(
    vec_name: str, j: int, cents: list[list[float]], sub: int
) -> Column:
    """``array(score(c0), score(c1), ...)`` for one subspace — one
    F.expr/py4j call for the whole k-centroid score array."""
    scores = ", ".join(_pq_score_sql(vec_name, j, c, sub) for c in cents)
    return F.expr(f"array({scores})")


def pq_encode(
    emb: DataFrame,
    codebook: list[list[list[float]]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Map-only PQ encoder: per subspace, the argmin centroid via a
    strictly-less when-chain (lowest index wins ties — the same rule
    as the oracle's ORDER BY d2, c).

    ZERO exchanges, zero joins (plan-asserted): encoding is a pure
    projection, so at 100 TB it runs at scan speed and emits
    |corpus| x m small ints. The 512-term expression stays inside
    whole-stage codegen (element_at on an array column is not a
    higher-order function — no interpreted lambda on the hot path).
    """
    cb = codebook if codebook is not None else pq_seed_codebook(emb, id_col=id_col, vec_col=vec_col)
    sub = len(cb[0][0])
    base = emb.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    )
    # Each centroid distance is built ONCE into an array, and the
    # argmin is array_position(d2s, array_min(d2s)) — first index wins
    # ties, the same rule as the oracle's ORDER BY d2, c. (A running
    # when-chain would re-embed every previous distance subtree per
    # step: exponential expression growth, measured 50x slower through
    # analysis/codegen.)
    cols = [F.col(id_col)]
    for j, cents in enumerate(cb):
        d2s = _pq_score_array("v", j, cents, sub)
        cols.append(d2s.alias(f"d2s_{j}"))
    staged = base.select(*cols)
    code_cols = [F.col(id_col)] + [
        (F.array_position(F.col(f"d2s_{j}"), F.array_min(F.col(f"d2s_{j}"))) - 1)
        .cast("int")
        .alias(f"code_{j}")
        for j in range(len(cb))
    ]
    return staged.select(*code_cols)


def pq_adc_shortlist(
    emb: DataFrame,
    query_ids: tuple[int, ...] = (20, 21, 22, 23, 24),
    codebook: list[list[list[float]]] | None = None,
    shortlist: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance (ADC) shortlist over PQ codes.

    Each query precomputes one lookup table per subspace (its exact
    squared distance to each of the k centroids); the corpus-side scan
    then scores a vector as the FIXED-ORDER sum of m table lookups on
    its codes — no original vectors move, no per-pair float math
    beyond m additions. The |Q| x m x k LUT frame broadcasts (queries
    are the small side by construction); ranking shuffles only
    (query, code-distance) pairs. Returns (query_id, neighbor_id,
    adc_score, sl_rank) for the ``shortlist`` best codes per query
    (adc_score is the rank-surrogate Σⱼ |c|²−2·q·c — see _pq_score_sql).
    """
    cb = codebook if codebook is not None else pq_seed_codebook(emb, id_col=id_col, vec_col=vec_col)
    sub = len(cb[0][0])
    codes = pq_encode(emb, cb, id_col, vec_col)
    qv = emb.where(F.col(id_col).isin(list(query_ids))).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    lut_cols = [
        _pq_score_array("qv", j, cents, sub).alias(f"lut_{j}")
        for j, cents in enumerate(cb)
    ]
    luts = qv.select("query_id", *lut_cols)
    approx: Column | None = None
    for j in range(len(cb)):
        term = F.element_at(F.col(f"lut_{j}"), F.col(f"code_{j}") + 1)
        approx = term if approx is None else approx + term
    assert approx is not None
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_score").asc(), F.col("neighbor_id").asc()
    )
    return (
        codes.crossJoin(F.broadcast(luts))
        .where(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            approx.alias("adc_score"),
        )
        .withColumn("sl_rank", F.row_number().over(w))
        .where(F.col("sl_rank") <= shortlist)
    )


def pq_search_topk(
    emb: DataFrame,
    query_ids: tuple[int, ...] = (20, 21, 22, 23, 24),
    codebook: list[list[list[float]]] | None = None,
    k: int = 5,
    shortlist: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-stage PQ search: ADC shortlist, then EXACT-L2 rerank of the
    shortlist only — the production PQ serving shape (FAISS-style
    "IndexPQ + refine").

    The cost split is the scale story: the corpus-wide stage reads
    codes (a ~32x byte shrink at m=8 vs 64 float32 dims) and does m
    lookups per candidate; full vectors are fetched for just
    |Q| x shortlist rows (id-keyed point lookups at scale — here a
    semi-joined scan).  Recall is bounded by shortlist quality, which
    ``ann_pq_recall`` measures rather than assumes.
    """
    cb = codebook if codebook is not None else pq_seed_codebook(emb, id_col=id_col, vec_col=vec_col)
    sl = pq_adc_shortlist(emb, query_ids, cb, shortlist, id_col, vec_col)
    v = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("nv"),
    )
    qv = emb.where(F.col(id_col).isin(list(query_ids))).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("exact_d2").asc(), F.col("neighbor_id").asc()
    )
    return (
        sl.join(v, "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            l2sq(F.col("qv"), F.col("nv")).alias("exact_d2"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("exact_d2", 6).alias("exact_d2"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def l2sq(a: Column, b: Column) -> Column:
    """Sequential-fold squared L2 distance (deterministic IEEE order —
    the exact-metric twin the PQ recall eval compares against)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_encode_np(
    emb: DataFrame,
    codebook: list[list[list[float]]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Arrow/numpy fast path for PQ encoding: one float64 matmul per
    (batch, subspace) instead of the m·k·sub-term expression tree.

    The expression form (:func:`pq_encode`) is the oracle-exact
    comparator but pays plan-size costs (≈2k-node trees through
    analysis + codegen); this path moves the same argmin into a BLAS
    kernel per Arrow batch — same shape as :func:`brute_force_topk_np`.
    Scores are computed in float64 with the same |c|²−2·x·c surrogate;
    ties broken toward the lowest centroid index (argmin's first-hit),
    matching the expression path. BLAS summation order can differ from
    the sequential fold in the last ulp, so exact code equality is
    TEST-asserted on the fixtures rather than assumed; the registered
    oracle queries keep the expression path.
    """
    import numpy as np
    import pandas as pd

    cb = codebook if codebook is not None else pq_seed_codebook(emb, id_col=id_col, vec_col=vec_col)
    C = [np.asarray(cents, dtype=np.float64) for cents in cb]  # k x sub each
    norms = [(c * c).sum(axis=1) for c in C]
    m = len(cb)
    sub = C[0].shape[1]

    def encode(batches):
        for pdf in batches:
            X = np.asarray(list(pdf[vec_col]), dtype=np.float64)
            out = {id_col: pdf[id_col]}
            for j in range(m):
                Xj = X[:, j * sub : (j + 1) * sub]
                scores = norms[j][None, :] - 2.0 * (Xj @ C[j].T)
                out[f"code_{j}"] = scores.argmin(axis=1).astype("int32")
            yield pd.DataFrame(out)

    schema = f"{id_col} long, " + ", ".join(f"code_{j} int" for j in range(m))
    return emb.select(id_col, vec_col).mapInPandas(encode, schema=schema)


def pq_search(
    emb: DataFrame,
    query_ids: tuple[int, ...] = (20, 21, 22, 23, 24),
    codebook: list[list[list[float]]] | None = None,
    k: int = 5,
    shortlist: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Library entry point for PQ serving: BLAS encode + expression
    ADC/rerank.

    Corpus codes come from :func:`pq_encode_np` (the plan-size and
    per-row fast path; test-asserted code-identical to the expression
    encoder), the per-query LUTs and the exact rerank stay in
    expression land (tiny frames — 5 LUT rows, |Q|·shortlist rerank
    pairs). Falls back to the all-expression :func:`pq_search_topk`
    when numpy is unavailable; that form is also the oracle
    comparator the registered queries use.
    """
    try:
        import numpy  # noqa: F401
    except ImportError:  # pragma: no cover - numpy ships in the env
        return pq_search_topk(emb, query_ids, codebook, k, shortlist, id_col, vec_col)
    cb = codebook if codebook is not None else pq_seed_codebook(emb, id_col=id_col, vec_col=vec_col)
    sub = len(cb[0][0])
    codes = pq_encode_np(emb, cb, id_col, vec_col)
    qv = emb.where(F.col(id_col).isin(list(query_ids))).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    luts = qv.select(
        "query_id",
        *[
            _pq_score_array("qv", j, cents, sub).alias(f"lut_{j}")
            for j, cents in enumerate(cb)
        ],
    )
    approx: Column | None = None
    for j in range(len(cb)):
        term = F.element_at(F.col(f"lut_{j}"), F.col(f"code_{j}") + 1)
        approx = term if approx is None else approx + term
    assert approx is not None
    w_sl = Window.partitionBy("query_id").orderBy(
        F.col("adc_score").asc(), F.col("neighbor_id").asc()
    )
    sl = (
        codes.crossJoin(F.broadcast(luts))
        .where(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id", F.col(id_col).alias("neighbor_id"), approx.alias("adc_score")
        )
        .withColumn("sl_rank", F.row_number().over(w_sl))
        .where(F.col("sl_rank") <= shortlist)
    )
    v = emb.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).cast("array<double>").alias("nv"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("exact_d2").asc(), F.col("neighbor_id").asc()
    )
    return (
        sl.join(v, "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            l2sq(F.col("qv"), F.col("nv")).alias("exact_d2"),
        )
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("exact_d2", 6).alias("exact_d2"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


def hard_negative_mining(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    anchor_ids: tuple[int, ...] = (0, 1, 2, 3, 4),
    k: int = 5,
) -> DataFrame:
    """Contrastive-pair mining: for each anchor, the k most-similar
    vectors with a DIFFERENT label — the "hard negatives" an embedding
    model trains against (easy negatives are already far; the near
    ones carry the gradient).

    Same scale shape as the brute-force kernel: the anchor panel
    broadcasts, the corpus never shuffles; the label-inequality
    residual rides inside the broadcast join.  Cosine is rounded to 6
    BEFORE the rank (cross-engine libm discipline) with the neighbor
    id as tie-break; ranking is a window per anchor over the panel's
    partitions.  For a full-corpus mining run (every vector an
    anchor), swap the panel for the LSH/IVF bucket path — this exact
    form is the oracle comparator and the small-panel production path.
    """
    docs = emb.select(
        F.col(id_col), F.col(label_col).alias("lbl"), _dvec(vec_col).alias("v")
    )
    anchors = docs.where(F.col(id_col).isin(*anchor_ids)).select(
        F.col(id_col).alias("anchor_id"),
        F.col("lbl").alias("anchor_label"),
        F.col("v").alias("av"),
    )
    pairs = docs.join(
        F.broadcast(anchors), F.col("lbl") != F.col("anchor_label")
    )
    scored = pairs.select(
        "anchor_id",
        "anchor_label",
        F.col(id_col).alias("negative_id"),
        F.col("lbl").alias("negative_label"),
        F.round(cosine(F.col("av"), F.col("v")), 6).alias("cosine"),
    )
    w = Window.partitionBy("anchor_id").orderBy(
        F.col("cosine").desc(), F.col("negative_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(
            "anchor_id",
            "anchor_label",
            "negative_id",
            "negative_label",
            "cosine",
            "rank",
        )
    )
