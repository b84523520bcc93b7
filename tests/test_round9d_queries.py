"""Round-9d wave: algorithmic cross-checks beyond the oracle hash —
the Count-Min sketch replayed from raw hashlib md5, the
boundary-stitched sorted-neighborhood pair set against a naive global
sort, phrase-match counts against a direct corpus scan, OHLC ordering
invariants, grace-hash fanout planning re-derived in Python, and
conservation laws (row totals, leakage-freedom) for the rest."""

from __future__ import annotations

import hashlib

import duckdb

from tests.conftest import SF_DIR


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _docs():
    return duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).fetchall()


def test_countmin_replayed_from_raw_md5(spark):
    """The full 20-row output re-derived in pure Python: sketch
    counters from hashlib md5, estimate = min over depths — and the
    CMS one-sided guarantee (estimate >= truth) holds row by row."""
    from etl_portofolio_spark.plans.round9d_queries import (
        _CMS_DEPTH,
        _CMS_WIDTH,
        q_countmin_point_estimates,
    )

    keys = [
        r[0]
        for r in duckdb.sql(
            f"SELECT o_custkey FROM read_parquet('{SF_DIR}/orders.parquet')"
        ).fetchall()
    ]
    sketch: dict[tuple[int, int], int] = {}
    exact: dict[int, int] = {}
    for k in keys:
        exact[k] = exact.get(k, 0) + 1
        for d in range(_CMS_DEPTH):
            slot = _h32(f"{d}:{k}") % _CMS_WIDTH
            sketch[(d, slot)] = sketch.get((d, slot), 0) + 1

    rows = q_countmin_point_estimates(spark, SF_DIR).collect()
    assert len(rows) == 20
    for r in rows:
        est = min(
            sketch[(d, _h32(f"{d}:{r['o_custkey']}") % _CMS_WIDTH)]
            for d in range(_CMS_DEPTH)
        )
        assert r["n_exact"] == exact[r["o_custkey"]]
        assert r["cms_estimate"] == est
        assert r["cms_estimate"] >= r["n_exact"]  # one-sided guarantee
        assert r["over_permille"] >= 0


def test_sorted_neighborhood_equals_naive_global_sort(spark):
    """The distributed boundary-stitch must produce EXACTLY the pair
    set of the naive single global sort (the algorithm's definition)."""
    from etl_portofolio_spark.plans.round9d_queries import (
        _SN_JACCARD_PERMILLE,
        _SN_WINDOW,
        q_dedup_sorted_neighborhood,
    )

    docs = sorted(
        ((t[:24], i, set(t.split(" "))) for i, t in _docs()),
        key=lambda x: (x[0], x[1]),
    )
    expected = set()
    for a in range(len(docs)):
        for off in range(1, _SN_WINDOW + 1):
            b = a + off
            if b >= len(docs):
                continue
            ta, tb = docs[a][2], docs[b][2]
            jac = len(ta & tb) * 1000 // len(ta | tb)
            if jac >= _SN_JACCARD_PERMILLE:
                expected.add((docs[a][1], docs[b][1], jac))

    got = {
        (r["doc_a"], r["doc_b"], r["jac_permille"])
        for r in q_dedup_sorted_neighborhood(spark, SF_DIR).collect()
    }
    assert got == expected


def test_phrase_match_counts_by_direct_scan(spark):
    """Every emitted (doc, n_matches) re-counted by scanning that
    doc's token list for the phrase directly."""
    from etl_portofolio_spark.plans.round9d_queries import (
        q_phrase_match_positions,
    )

    rows = q_phrase_match_positions(spark, SF_DIR).collect()
    assert rows
    phrases = {r["phrase"] for r in rows}
    assert len(phrases) == 1  # one corpus-wide top bigram
    w1, w2 = next(iter(phrases)).split(" ")
    text = dict(_docs())
    for r in rows:
        toks = text[r["doc_id"]].split(" ")
        n = sum(
            1
            for i in range(len(toks) - 1)
            if toks[i] == w1 and toks[i + 1] == w2
        )
        assert r["n_matches"] == n >= 1


def test_ohlc_ordering_and_conservation(spark):
    from etl_portofolio_spark.plans.round9d_queries import q_ohlc_downsample

    rows = q_ohlc_downsample(spark, SF_DIR).collect()
    assert rows
    n_purchases = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF_DIR}/events.parquet') "
        "WHERE event_type = 'purchase'"
    ).fetchall()[0][0]
    assert sum(r["n_trades"] for r in rows) == n_purchases
    for r in rows:
        assert r["low_c"] <= r["open_c"] <= r["high_c"]
        assert r["low_c"] <= r["close_c"] <= r["high_c"]
        assert r["low_c"] * r["n_trades"] <= r["total_c"]
        assert r["total_c"] <= r["high_c"] * r["n_trades"]


def test_checkpoint_resume_sink_is_exactly_once(spark):
    """The resumed sink holds each source row exactly once: daily
    panel totals equal the source row count (a duplicate from
    re-processing file 1, or a miss from skipping file 2, breaks it)."""
    from etl_portofolio_spark.plans.round9d_queries import (
        q_checkpoint_resume_equivalence,
    )

    rows = q_checkpoint_resume_equivalence(spark, SF_DIR).collect()
    n_events = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF_DIR}/events.parquet')"
    ).fetchall()[0][0]
    assert sum(r["n_events"] for r in rows) == n_events


def test_encoding_estimate_replayed_per_column(spark):
    from etl_portofolio_spark.plans.round9d_queries import (
        _ENC_ORDER_COLS,
        _ENC_PART_COLS,
        q_encoding_size_estimate,
    )

    rows = {r["col_name"]: r for r in q_encoding_size_estimate(spark, SF_DIR).collect()}
    assert set(rows) == set(_ENC_PART_COLS) | set(_ENC_ORDER_COLS)
    for tbl, cols in (("part", _ENC_PART_COLS), ("orders", _ENC_ORDER_COLS)):
        for c in cols:
            vals = [
                v[0]
                for v in duckdb.sql(
                    f"SELECT {c} FROM read_parquet('{SF_DIR}/{tbl}.parquet')"
                ).fetchall()
            ]
            distinct = set(vals)
            ndv = len(distinct)
            bit_width = 1 if ndv <= 1 else max(1, (ndv - 1).bit_length())
            plain = sum(len(v.encode()) for v in vals)
            dict_bytes = sum(len(v.encode()) for v in distinct) + (
                len(vals) * bit_width + 7
            ) // 8
            r = rows[c]
            assert r["n_rows"] == len(vals)
            assert r["ndv"] == ndv
            assert r["bit_width"] == bit_width
            assert r["plain_bytes"] == plain
            assert r["dict_bytes"] == dict_bytes
            assert r["best_encoding"] == (
                "dict" if dict_bytes < plain else "plain"
            )
            assert 0 <= r["savings_permille"] <= 1000


def test_walk_forward_folds_are_leak_free_and_expanding(spark):
    from etl_portofolio_spark.plans.round9d_queries import (
        q_walk_forward_cv_folds,
    )

    rows = sorted(
        q_walk_forward_cv_folds(spark, SF_DIR).collect(),
        key=lambda r: r["fold"],
    )
    assert [r["fold"] for r in rows] == [1, 2, 3, 4]
    for r in rows:
        assert r["leak_free"] == 1
        assert r["max_train_date"] < r["min_test_date"]
        assert r["cut_date"] <= r["min_test_date"]
    # expanding window: each later fold trains on strictly more rows
    trains = [r["n_train"] for r in rows]
    assert trains == sorted(trains) and trains[0] < trains[-1]
    # fold k's train set is fold k-1's train+test (walk-forward law)
    for prev, cur in zip(rows, rows[1:]):
        assert cur["n_train"] == prev["n_train"] + prev["n_test"]


def test_grace_hash_plan_fanout_and_conservation(spark):
    from etl_portofolio_spark.plans.round9d_queries import (
        _GHJ_BUDGET,
        _GHJ_ROW_BYTES,
        q_grace_hash_join_plan,
    )

    rows = q_grace_hash_join_plan(spark, SF_DIR).collect()
    n_build = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF_DIR}/lineitem.parquet')"
    ).fetchall()[0][0]
    ratio = (n_build * _GHJ_ROW_BYTES + _GHJ_BUDGET - 1) // _GHJ_BUDGET
    fanout = 1 if ratio <= 1 else 1 << (ratio - 1).bit_length()
    assert all(r["fanout"] == fanout for r in rows)
    assert sum(r["build_rows"] for r in rows) == n_build
    assert {r["part_id"] for r in rows} <= set(range(fanout))
    for r in rows:
        assert r["build_bytes"] == r["build_rows"] * _GHJ_ROW_BYTES
        assert r["over_budget"] == int(r["build_bytes"] > _GHJ_BUDGET)
        assert r["max_key_rows"] <= r["build_rows"]
        assert r["n_keys"] <= r["build_rows"]
