"""Property-based tests (hypothesis): operators vs plain-Python references.

Random inputs catch the edge cases fixture data never hits: empty
strings, single tokens, unicode whitespace runs, duplicate timestamps.
Spark evaluation is batched per property (one createDataFrame + collect
per example set, not per example) to keep the suite fast.
"""

from __future__ import annotations

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_portofolio_spark.functions.hashing import (
    MINHASH_MOD,
    MINHASH_PARAMS,
)
from etl_portofolio_spark.operators import dedup

# printable-ish text with spaces, bounded size
_texts = st.lists(
    st.text(
        alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"), max_codepoint=0x24F),
        min_size=0,
        max_size=8,
    ),
    min_size=0,
    max_size=12,
).map(lambda words: " ".join(words))


def _py_tokens(text: str) -> list[str]:
    return [t for t in text.strip().lower().split()] if text.strip() else [""]


def _py_shingles(text: str, k: int = 3) -> list[str]:
    toks = text.strip().lower().split() or [""]
    out, seen = [], set()
    for i in range(max(len(toks) - k + 1, 0)):
        s = " ".join(toks[i : i + k])
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out


def _py_h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _py_minhash(text: str, i: int) -> int | None:
    sh = _py_shingles(text)
    if not sh:
        return None
    a, b = MINHASH_PARAMS[i]
    return min((_py_h32(s) % MINHASH_MOD * a + b) % MINHASH_MOD for s in sh)


@settings(max_examples=20, deadline=None)
@given(st.lists(_texts, min_size=1, max_size=8))
def test_shingles_match_python_reference(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: sorted(r["sh"])
        for r in dedup.shingled_docs(df, "doc_id", "text")
        .select("doc_id", F.col("sh_set").alias("sh"))
        .collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == sorted(_py_shingles(t)), (t, got[i])


@settings(max_examples=15, deadline=None)
@given(st.lists(_texts, min_size=1, max_size=6))
def test_minhash_signature_matches_python_reference(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    sig = {
        r["doc_id"]: (r["mh00"], r["mh01"])
        for r in dedup.minhash_signatures(df, "doc_id", "text", num_hashes=2).collect()
    }
    for i, t in enumerate(texts):
        expected = (_py_minhash(t, 0), _py_minhash(t, 1))
        if expected[0] is None:
            assert i not in sig  # no shingles -> no signature row
        else:
            assert sig[i] == expected, (t, sig[i], expected)


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),  # user
            st.integers(min_value=0, max_value=10_000),  # minutes offset
        ),
        min_size=1,
        max_size=30,
    )
)
def test_sessionize_batch_properties(spark, events):
    """Sessions partition the events; intra-session gaps <= threshold,
    inter-session gaps > threshold."""
    from etl_portofolio_spark.streaming.stateful import sessionize_batch

    gap_min = 30
    base = 1704067200  # 2024-01-01T00:00:00Z
    df = spark.createDataFrame(
        [(u, m * 60) for u, m in events], "user_id long, off long"
    ).select("user_id", F.timestamp_seconds(F.lit(base) + F.col("off")).alias("ts"))
    sess = sessionize_batch(df, gap_minutes=gap_min).collect()
    # total events preserved
    assert sum(r["n_events"] for r in sess) == len(events)
    # per-user session intervals are disjoint and separated by > gap
    by_user: dict[int, list] = {}
    for r in sess:
        by_user.setdefault(r["user_id"], []).append(
            (r["session_start"], r["session_end"])
        )
    for user, spans in by_user.items():
        spans.sort()
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert (s2 - e1).total_seconds() > gap_min * 60
        for s, e in spans:
            assert s <= e


@settings(max_examples=15, deadline=None)
@given(
    st.lists(st.floats(min_value=0, max_value=100, allow_nan=False), min_size=1, max_size=30),
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=90),
            st.integers(min_value=0, max_value=40),
        ),
        min_size=1,
        max_size=8,
    ),
)
def test_range_join_matches_naive_between(spark, points, spans):
    """bucketed_range_join == the naive BETWEEN theta-join on any input."""
    from etl_portofolio_spark.operators.rangejoin import bucketed_range_join

    p = spark.createDataFrame(
        [(i, float(x)) for i, x in enumerate(points)], "pid long, x double"
    )
    iv = spark.createDataFrame(
        [(j, lo, lo + w) for j, (lo, w) in enumerate(spans)],
        "iid long, lo long, hi long",
    )
    got = sorted(
        (r["pid"], r["iid"])
        for r in bucketed_range_join(p, iv, "x", "lo", "hi", bucket_width=7.0).collect()
    )
    naive = sorted(
        (r["pid"], r["iid"])
        for r in p.join(
            iv, (F.col("x") >= F.col("lo")) & (F.col("x") <= F.col("hi"))
        ).collect()
    )
    assert got == naive


@settings(max_examples=10, deadline=None)
@given(st.lists(_texts, min_size=2, max_size=10))
def test_decontaminate_corpus_matches_two_pass(spark, texts):
    """The single-pass corpus form == decontaminate(train, eval)."""
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    pred = F.col("doc_id") % 2 == 0
    single = sorted(
        r["doc_id"]
        for r in dedup.decontaminate_corpus(df, "doc_id", "text", pred, k=2).collect()
    )
    two_pass = sorted(
        r["doc_id"]
        for r in dedup.decontaminate(
            df.where(~pred), df.where(pred), "doc_id", "text", k=2
        ).collect()
    )
    assert single == two_pass


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(["a", "b", "c", "aa"]), min_size=0, max_size=9),
        min_size=1,
        max_size=6,
    )
)
def test_chunk_dedup_matches_python_reference(spark, word_lists):
    """chunk_dedup_docs == a plain-Python first-occurrence election.
    The tiny vocabulary forces cross-doc chunk collisions; the reference
    reproduces the (doc_id, chunk_idx) ordering contract exactly."""
    cw = 2
    docs = [(i, " ".join(ws)) for i, ws in enumerate(word_lists)]

    chunks_by_doc: dict[int, list[str]] = {}
    for doc_id, text in docs:
        toks = text.strip().lower().split() or [""]
        n = (len(toks) + cw - 1) // cw
        chunks_by_doc[doc_id] = [
            " ".join(toks[i * cw : (i + 1) * cw]) for i in range(max(n, 1))
        ]
    first: dict[str, tuple[int, int]] = {}
    for doc_id in sorted(chunks_by_doc):
        for idx, ch in enumerate(chunks_by_doc[doc_id]):
            first.setdefault(ch, (doc_id, idx))
    expected = {}
    for doc_id in sorted(chunks_by_doc):
        kept = [
            ch
            for idx, ch in enumerate(chunks_by_doc[doc_id])
            if first[ch] == (doc_id, idx)
        ]
        expected[doc_id] = (
            len(chunks_by_doc[doc_id]),
            len(kept),
            hashlib.md5(" ".join(kept).encode()).hexdigest() if kept else None,
        )

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_chunks"], r["n_kept"], r["kept_hash"])
        for r in dedup.chunk_dedup_docs(df, "doc_id", "text", cw).collect()
    }
    assert got == expected


# --- CDC apply vs dict fold --------------------------------------------------

_cdc_ops = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=6),  # key
        st.integers(min_value=0, max_value=99),  # value
        st.sampled_from(["insert", "update", "delete"]),
    ),
    min_size=0,
    max_size=14,
)


@settings(max_examples=5, deadline=None)
@given(changes=_cdc_ops, batch_size=st.integers(min_value=1, max_value=5))
def test_cdc_apply_matches_sequential_dict_fold(spark, changes, batch_size):
    """Applying an arbitrary change sequence in arbitrary micro-batch
    boundaries must equal the sequential one-at-a-time fold."""
    import shutil
    import tempfile

    from etl_portofolio_spark.operators.cdc import apply_changes

    expected: dict[int, int] = {}
    for k, v, op in changes:
        if op == "delete":
            expected.pop(k, None)
        else:
            expected[k] = v

    tgt = tempfile.mkdtemp(prefix="cdc-prop-")
    shutil.rmtree(tgt)  # apply_changes expects a fresh/absent path
    try:
        rows = [
            (k, v, op, seq) for seq, (k, v, op) in enumerate(changes)
        ]
        for i in range(0, len(rows), batch_size):
            batch = spark.createDataFrame(
                rows[i : i + batch_size], "k long, v long, op string, seq long"
            )
            apply_changes(spark, batch, tgt, ("k",), n_buckets=3)
        try:
            got = {
                r["k"]: r["v"]
                for r in spark.read.parquet(tgt).select("k", "v").collect()
            }
        except Exception:
            got = {}
        assert got == expected
    finally:
        shutil.rmtree(tgt, ignore_errors=True)


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),      # user
            st.integers(min_value=0, max_value=5000),   # seconds offset
        ),
        min_size=1,
        max_size=40,
    )
)
def test_throttle_rate_limit_contract(spark, events):
    """Kept events are ALWAYS > min_gap apart per key — even though the
    gap is measured to the raw (possibly dropped) predecessor — and the
    first event of every key survives."""
    from etl_portofolio_spark.operators.throttle import throttle_events

    base = 1704067200
    df = spark.createDataFrame(
        [(i, u, off) for i, (u, off) in enumerate(events)],
        "event_id long, user_id long, off long",
    ).select(
        "event_id",
        "user_id",
        F.timestamp_seconds(F.lit(base) + F.col("off")).alias("ts"),
    )
    kept = throttle_events(
        df, keys=("user_id",), ts_col="ts", tiebreak_col="event_id",
        min_gap_seconds=300,
    ).collect()
    by_user: dict[int, list[int]] = {}
    for r in kept:
        by_user.setdefault(r["user_id"], []).append(int(r["ts"].timestamp()))
    firsts = {}
    for i, (u, off) in enumerate(events):
        if u not in firsts or (off, i) < firsts[u]:
            firsts[u] = (off, i)
    for u, (off, _i) in firsts.items():
        assert base + off in by_user.get(u, []), "first event per key must survive"
    for u, ts_list in by_user.items():
        ts_list.sort()
        for t1, t2 in zip(ts_list, ts_list[1:]):
            assert t2 - t1 > 300, f"kept events {t1},{t2} violate the rate limit"


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.lists(
            st.text(alphabet="abcxyz", min_size=1, max_size=4),
            min_size=0,
            max_size=20,
        ),
        min_size=1,
        max_size=6,
    ),
    st.integers(min_value=1, max_value=6),   # stride
    st.integers(min_value=0, max_value=4),   # window = stride + extra
)
def test_chunk_manifest_covers_every_token(spark, word_lists, stride, extra):
    """Chunks tile the token sequence: starts advance by exactly the
    stride, every token index is covered, the last chunk reaches the
    final token, and hashes equal the md5 of the sliced tokens."""
    from etl_portofolio_spark.operators.text import chunk_manifest

    window = stride + extra
    rows = [(i, " ".join(ws)) for i, ws in enumerate(word_lists)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_manifest(df, "doc_id", "text", window=window, stride=stride).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for doc_id, text_ in rows:
        toks = text_.strip().lower().split() if text_.strip() else [""]
        n = len(toks)
        chunks = sorted(by_doc[doc_id], key=lambda r: r["chunk_id"])
        assert chunks[0]["start_tok"] == 1
        covered = set()
        for r in chunks:
            s = r["start_tok"]
            sliced = toks[s - 1 : s - 1 + window]
            assert r["n_tok_chunk"] == len(sliced)
            expect = hashlib.md5(" ".join(sliced).encode()).hexdigest()
            assert r["chunk_hash"] == expect
            covered.update(range(s, s + len(sliced)))
        assert covered == set(range(1, n + 1)), "every token in >= 1 chunk"
        # starts advance by exactly the stride
        starts = [r["start_tok"] for r in chunks]
        assert starts == [1 + i * stride for i in range(len(starts))]


@settings(max_examples=20, deadline=None)
@given(
    vecs=st.lists(
        st.lists(
            st.floats(
                min_value=-100, max_value=100, allow_nan=False, allow_infinity=False
            ),
            min_size=1,
            max_size=12,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_int8_quantize_error_bound_and_checksum(spark, vecs):
    """Quantizer contract: |recon err| <= span/510 (+fp slack), codes in
    [0,255] so the checksum is bounded, zero-span vectors are exact."""
    from etl_portofolio_spark.operators.similarity import int8_quantize_audit

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<double>"
    )
    rows = int8_quantize_audit(df).collect()
    assert len(rows) == len(vecs)
    for r in rows:
        v = vecs[r["vec_id"]]
        span = max(v) - min(v)
        assert 0 <= r["code_sum"] <= 255 * len(v)
        if span == 0:
            assert r["max_abs_err"] == 0.0
        else:
            assert r["max_abs_err"] <= span / 510 + 1e-6 * span + 1e-9


@settings(max_examples=15, deadline=None)
@given(
    raw_edges=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=25,
    ),
    iters=st.integers(1, 5),
)
def test_pagerank_conserves_mass_on_symmetric_graphs(spark, raw_edges, iters):
    """On a symmetric edge set (every node has out-edges) each round
    redistributes all rank mass, so sum(rank) == |nodes| at every
    iteration count; every rank >= 1-d."""
    from etl_portofolio_spark.caching import release_cached
    from etl_portofolio_spark.operators.graph import pagerank

    sym = sorted({(a, b) for a, b in raw_edges} | {(b, a) for a, b in raw_edges})
    edges = spark.createDataFrame(sym, "src long, dst long")
    n_nodes = len({a for a, _ in sym})
    ranks = [r["rank"] for r in pagerank(edges, iterations=iters).collect()]
    release_cached()
    assert len(ranks) == n_nodes
    assert abs(sum(ranks) - n_nodes) < 1e-6 * max(n_nodes, 1)
    assert all(r >= 0.15 - 1e-9 for r in ranks)


@settings(max_examples=15, deadline=None)
@given(
    ws=st.lists(st.integers(min_value=1, max_value=900), min_size=3, max_size=60),
    target=st.integers(min_value=2, max_value=20),
)
def test_weighted_systematic_pick_invariants(spark, ws, target):
    """The scale-safe prefix-sum sampler must match the naive sequential
    formulation exactly: per-doc picks = floor(cum_hi/s) − floor(cum_lo/s),
    and the telescoping total Σ picks = floor(total/s)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rows = [(i, w) for i, w in enumerate(ws)]
    docs = spark.createDataFrame(rows, "doc_id long, w long")
    total = sum(ws)
    stride = max(1, total // target)

    # the production decomposition (pre-bin + offsets), mirrored from
    # q_weighted_systematic_sample with the same bin count
    P = 16
    lo_id, hi_id = 0, len(ws) - 1
    binned = docs.select(
        "doc_id",
        "w",
        ((F.col("doc_id") - lo_id) * P / (hi_id - lo_id + 1))
        .cast("long")
        .alias("bin"),
    )
    win = (
        Window.partitionBy("bin")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = binned.withColumn("cum_in_bin", F.sum("w").over(win))
    cnts = binned.groupBy("bin").agg(F.sum("w").alias("bw"))
    lower = cnts.select(F.col("bin").alias("lbin"), F.col("bw").alias("lw"))
    offsets = (
        cnts.join(F.broadcast(lower), F.col("lbin") < F.col("bin"), "left")
        .groupBy("bin")
        .agg(F.coalesce(F.sum("lw"), F.lit(0)).alias("off"))
    )
    cum_hi = F.col("off") + F.col("cum_in_bin")
    picks = (
        F.floor(cum_hi / stride) - F.floor((cum_hi - F.col("w")) / stride)
    ).cast("long")
    got = {
        r.doc_id: (r.cum, r.p)
        for r in within.join(F.broadcast(offsets), "bin")
        .select("doc_id", cum_hi.alias("cum"), picks.alias("p"))
        .collect()
    }

    # naive sequential reference
    cum = 0
    expect_total = 0
    for i, w in enumerate(ws):
        lo, hi = cum, cum + w
        n = hi // stride - lo // stride
        assert got[i] == (hi, n), (i, got[i], (hi, n))
        expect_total += n
        cum = hi
    assert sum(p for _, p in got.values()) == expect_total == total // stride


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.floats(
            allow_nan=False,
            allow_infinity=False,
            allow_subnormal=False,
            width=64,
            min_value=-1e75,
            max_value=1e75,  # |c|^2 stays finite: the emitter's domain
        ),
        min_size=1,
        max_size=8,
    )
)
def test_pq_score_sql_literal_roundtrip_is_bit_exact(spark, centroid):
    """The SQL-string emitters (`similarity._pq_score_sql`, the simhash
    pack strings) rest on `repr(float) + "D"` parsing back to the SAME
    IEEE double for every finite value — including negative and
    scientific-notation reprs — and on the parsed tree reproducing the
    Python-side left-fold order. Property-pinned against a pure-Python
    reference of the identical fold."""
    from etl_portofolio_spark.operators.similarity import _pq_score_sql

    sub = len(centroid)
    vec = [float(i + 1) / 7.0 for i in range(sub)]
    sql = _pq_score_sql("v", 0, centroid, sub)
    df = spark.createDataFrame([(vec,)], "v array<double>")
    got = df.select(F.expr(sql).alias("s")).first()["s"]

    k = 0.0
    for w in centroid:
        k = k + w * w
    acc = None
    for x, w in zip(vec, centroid):
        t = x * w
        acc = t if acc is None else acc + t
    expect = k - 2.0 * acc
    assert got == expect or (got != got and expect != expect), (centroid, got, expect)


def test_pq_score_sql_rejects_non_finite_literals():
    """An overflowing |c|² would emit `infD` (parsed as a COLUMN name —
    the failure hypothesis found); the emitter must refuse loudly
    instead. Found by the property test above before the bound was
    added; pinned as explicit cases."""
    import pytest as _pytest

    from etl_portofolio_spark.operators.similarity import _pq_score_sql

    with _pytest.raises(ValueError, match="non-finite"):
        _pq_score_sql("v", 0, [float("nan")], 1)
    with _pytest.raises(ValueError, match="overflowed"):
        _pq_score_sql("v", 0, [1e160, 1e160], 2)


# --- fold_sessions: chunking invariance of the streaming sessionizer --------

_TS_LISTS = st.lists(
    st.integers(min_value=0, max_value=10_000), min_size=0, max_size=40
)


@settings(max_examples=200, deadline=None)
@given(ts=_TS_LISTS, cuts=st.lists(st.integers(0, 40), max_size=4), gap=st.integers(1, 500))
def test_fold_sessions_chunking_invariance(ts, cuts, gap):
    """Splitting the (sorted) event stream at ARBITRARY micro-batch
    boundaries and threading the open session through state yields
    byte-identical sessions to one single fold — the property that
    makes the streaming twins exactly-once-equivalent to batch no
    matter how the source chops the data."""
    from etl_portofolio_spark.streaming.tws import fold_sessions

    ordered = sorted(ts)
    one_shot_closed, one_shot_open = fold_sessions(ordered, None, gap)

    bounds = sorted({min(c, len(ordered)) for c in cuts} | {0, len(ordered)})
    chunks = [
        ordered[a:b] for a, b in zip(bounds, bounds[1:])
    ]
    state = None
    chunked_closed = []
    for chunk in chunks:
        closed, state = fold_sessions(chunk, state, gap)
        chunked_closed.extend(closed)

    assert chunked_closed == one_shot_closed
    assert state == one_shot_open


@settings(max_examples=200, deadline=None)
@given(ts=_TS_LISTS, gap=st.integers(1, 500))
def test_fold_sessions_conservation(ts, gap):
    """Every event lands in exactly one session; session spans are
    consistent and separated by more than the gap."""
    from etl_portofolio_spark.streaming.tws import fold_sessions

    ordered = sorted(ts)
    closed, open_sess = fold_sessions(ordered, None, gap)
    sessions = closed + ([open_sess] if open_sess else [])
    assert sum(n for _, _, n in sessions) == len(ordered)
    for s, e, n in sessions:
        assert s <= e
        assert n >= 1
    for (_, e1, _), (s2, _, _) in zip(sessions, sessions[1:]):
        assert s2 - e1 > gap  # closed exactly when the gap demanded it


# --- prune_files: the no-false-negative contract ----------------------------

_ENVELOPES = st.lists(
    st.tuples(st.integers(-100, 100), st.integers(0, 50)).map(
        lambda t: (t[0], t[0] + t[1])
    ),
    min_size=0,
    max_size=20,
)


@settings(max_examples=300, deadline=None)
@given(
    envs=_ENVELOPES,
    lo=st.one_of(st.none(), st.integers(-120, 120)),
    hi=st.one_of(st.none(), st.integers(-120, 120)),
    unknown=st.lists(st.booleans(), min_size=0, max_size=20),
)
def test_prune_files_never_false_negative(envs, lo, hi, unknown):
    """Any file whose envelope INTERSECTS [lo, hi] must survive; files
    with unknown stats always survive. Pruning may keep too much,
    never too little — the property that makes a zonemap a pure
    optimization."""
    from etl_portofolio_spark.sources.skipping import prune_files

    zmap = []
    for i, (zlo, zhi) in enumerate(envs):
        if i < len(unknown) and unknown[i]:
            zmap.append((f"f{i}", None, None, -1))
        else:
            zmap.append((f"f{i}", zlo, zhi, 1))
    kept = set(prune_files(zmap, lo, hi))
    for f, zlo, zhi, _ in zmap:
        if zlo is None:
            assert f in kept  # unknown stats: always survive
            continue
        intersects = (lo is None or zhi >= lo) and (hi is None or zlo <= hi)
        if intersects:
            assert f in kept, (f, zlo, zhi, lo, hi)
        else:
            assert f not in kept  # and pruning is tight on known stats


# --- fold_sessions: reference-model parity (VERDICT r5 #7) ------------------
# Chunking invariance proves the fold is self-consistent; this pins it
# CORRECT against an independently-written reference model, and a
# source-level check pins it as the single kernel behind all three
# stateful twins (batch / applyInPandasWithState / transformWithState).


def _reference_sessions(ordered, gap):
    """Obviously-correct model: split wherever consecutive events are
    more than gap apart; each run is (start, end, count)."""
    sessions = []
    run = []
    for t in ordered:
        if run and t - run[-1] > gap:
            sessions.append((run[0], run[-1], len(run)))
            run = []
        run.append(t)
    if run:
        sessions.append((run[0], run[-1], len(run)))
    return sessions


@settings(max_examples=200, deadline=None)
@given(ts=_TS_LISTS, gap=st.integers(1, 500))
def test_fold_sessions_matches_reference_model(ts, gap):
    from etl_portofolio_spark.streaming.tws import fold_sessions

    ordered = sorted(ts)
    closed, open_sess = fold_sessions(ordered, None, gap)
    got = closed + ([open_sess] if open_sess else [])
    assert got == _reference_sessions(ordered, gap)


def test_stateful_twins_share_the_fold_kernel():
    """No streaming sessionizer may re-implement the fold inline: both
    stream twins must call streaming.tws.fold_sessions (the drift this
    guards against existed — stateful.py carried its own loop until
    round 6)."""
    import inspect

    from etl_portofolio_spark.streaming import stateful, tws

    for mod in (stateful, tws):
        src = inspect.getsource(mod)
        calls = src.count("fold_sessions(")
        # at least one real call beyond the def itself in tws
        assert calls >= (2 if mod is tws else 1), mod.__name__
    # the inline-fold signature (gap comparison + counter bump in one
    # module-local loop) must not reappear outside the kernel module
    src_stateful = inspect.getsource(stateful)
    assert "cur_n + 1" not in src_stateful


# --- bloom index bit math: no false negatives, ever --------------------------


@settings(max_examples=200, deadline=None)
@given(
    values=st.lists(st.integers(0, 10**12), min_size=1, max_size=200, unique=True),
    probes=st.lists(st.integers(0, 10**12), max_size=50),
)
def test_bloom_membership_no_false_negatives(values, probes):
    """Pure bit-level contract of sources/bloomindex: every inserted
    value tests positive under any m sizing; absent probes may false-
    positive but the test never asserts they don't — only that
    correctness-critical negatives cannot happen."""
    from etl_portofolio_spark.sources.bloomindex import _indexes

    m = max(64, (len(values) * 10 + 7) // 8 * 8)
    bits = bytearray(m // 8)
    for v in values:
        for idx in _indexes(str(v), m):
            bits[idx >> 3] |= 1 << (idx & 7)

    def member(v):
        return all(bits[i >> 3] & (1 << (i & 7)) for i in _indexes(str(v), m))

    assert all(member(v) for v in values)
    # determinism: re-deriving indexes yields the same positions
    for v in values[:5]:
        assert _indexes(str(v), m) == _indexes(str(v), m)


# --- driver-side HALF_UP rounding matches engine round semantics -------------


@settings(max_examples=300, deadline=None)
@given(
    x=st.floats(
        min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False
    ),
    k=st.integers(0, 6),
)
def test_round_half_up_matches_bigdecimal_semantics(x, k):
    """_round_half_up must agree with BigDecimal-over-shortest-repr
    HALF_UP (what Spark's F.round does on doubles): reference-model it
    with the decimal module over repr(x) directly."""
    from decimal import ROUND_HALF_UP, Decimal

    from etl_portofolio_spark.plans.round6_queries import _round_half_up

    expect = float(
        Decimal(repr(x)).quantize(Decimal(1).scaleb(-k), rounding=ROUND_HALF_UP)
    )
    assert _round_half_up(x, k) == expect
    # the known divergence case: Python's round() is HALF_EVEN
    assert _round_half_up(0.5, 0) == 1.0
    assert _round_half_up(2.5, 0) == 3.0
    assert _round_half_up(-2.5, 0) == -3.0
