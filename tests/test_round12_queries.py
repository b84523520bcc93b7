"""Round-12 wave: algorithmic cross-checks beyond the oracle hash.

Each statistic is replayed from raw fixture rows in pure Python with
the exact staged arithmetic the plans specify (integer divisions,
round-12 decimal term sums) and compared against the DuckDB oracle —
since the driver gate pins oracle == Spark, replay == oracle pins all
three. Winnowing additionally gets its published guarantee tested
directly (shared runs of length >= w + k - 1 share a fingerprint).
"""

from __future__ import annotations

import hashlib
import math
import re

import duckdb

from tests.conftest import SF_DIR


def _duck(sql: str) -> list[tuple]:
    con = duckdb.connect()
    for t in ("documents", "orders", "lineitem", "customer", "nation"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con.sql(sql).fetchall()


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _tokens(text: str) -> list[str]:
    return re.split(r"\s+", text.strip().lower())


# ---------------------------------------------------------------------------
# winnowing_fingerprints
# ---------------------------------------------------------------------------

_K, _W = 3, 4


def _winnow(tokens: list[str]) -> set[tuple[int, int]]:
    """Reference winnowing: (global_pos, hash) selections, rightmost
    min per window, deduped — the algorithm from the SIGMOD'03 paper."""
    grams = [
        _h60(" ".join(tokens[i : i + _K]))
        for i in range(len(tokens) - _K + 1)
    ]
    out: set[tuple[int, int]] = set()
    for j in range(len(grams) - _W + 1):
        win = grams[j : j + _W]
        m = min(win)
        # rightmost occurrence of the minimum
        r = max(i for i, v in enumerate(win) if v == m)
        out.add((j + r + 1, m))  # 1-based global gram position
    return out


def test_winnowing_oracle_matches_reference_replay():
    rows = _duck(
        "SELECT doc_id, text FROM documents ORDER BY doc_id LIMIT 50"
    )
    from etl_portofolio_spark.plans.round12_queries import ROUND12_QUERIES

    oracle = ROUND12_QUERIES["winnowing_fingerprints"][1]
    got = {
        r[0]: (r[1], r[2], r[3])
        for r in _duck(oracle + " ORDER BY doc_id LIMIT 50")
    }
    for doc_id, text in rows:
        toks = _tokens(text)
        sel = _winnow(toks) if len(toks) >= _K else set()
        n_grams = max(len(toks) - _K + 1, 0) if len(toks) >= _K else 0
        xor = 0
        for pos, h in sel:
            xor ^= _h60(f"{pos}:{h}")
        assert got[doc_id] == (n_grams, len(sel), xor), doc_id


def test_winnowing_guarantee_shared_run_shares_fingerprint():
    """Any two token streams sharing a run of >= w + k - 1 = 6 tokens
    must share at least one (hash) fingerprint — the winnowing
    guarantee the bucket-join downstream relies on."""
    shared = "alpha beta gamma delta epsilon zeta".split()
    a = ["pre1", "pre2", *shared, "post1"]
    b = ["other", *shared, "tail1", "tail2"]
    fps_a = {h for _, h in _winnow(a)}
    fps_b = {h for _, h in _winnow(b)}
    assert fps_a & fps_b


def test_winnowing_density_bounds():
    """Selections per doc land in [n_windows / w, n_windows] — the
    density band that keeps output linear in corpus size."""
    rows = _duck(
        "SELECT text FROM documents ORDER BY doc_id LIMIT 50"
    )
    for (text,) in rows:
        toks = _tokens(text)
        if len(toks) < _K + _W - 1:
            continue
        n_windows = len(toks) - _K + 1 - _W + 1
        sel = _winnow(toks)
        assert n_windows / _W <= len(sel) <= n_windows


# ---------------------------------------------------------------------------
# jensen_shannon_source_drift
# ---------------------------------------------------------------------------


def test_jsd_replay_and_bounds():
    rows = _duck("SELECT source, text FROM documents")
    counts: dict[str, dict[str, int]] = {}
    for source, text in rows:
        c = counts.setdefault(source, {})
        for t in _tokens(text):
            c[t] = c.get(t, 0) + 1
    all_counts: dict[str, int] = {}
    for c in counts.values():
        for t, n in c.items():
            all_counts[t] = all_counts.get(t, 0) + n
    n_all = sum(all_counts.values())

    from etl_portofolio_spark.plans.round12_queries import ROUND12_QUERIES

    oracle = ROUND12_QUERIES["jensen_shannon_source_drift"][1]
    got = {r[0]: (r[1], r[2], r[3]) for r in _duck(oracle)}
    assert set(got) == set(counts)
    for source, c in counts.items():
        n_s = sum(c.values())
        n_rest = n_all - n_s
        s = 0
        for t, c_all in all_counts.items():
            c_s = c.get(t, 0)
            c_rest = c_all - c_s
            p = c_s / n_s
            q = c_rest / n_rest
            term = 0.0
            if c_s > 0:
                term += p * math.log(2.0 * p / (p + q))
            if c_rest > 0:
                term += q * math.log(2.0 * q / (p + q))
            # round-12 decimal staging: sum exact integers at 1e-12
            s += round(0.5 * term, 12) * 10**12
        jsd = round(round(s) / 10**12, 6)
        vocab = sum(1 for v in c.values() if v > 0)
        assert got[source][0] == n_s
        assert got[source][1] == vocab
        assert abs(got[source][2] - jsd) < 2e-6, source
        assert -1e-9 <= got[source][2] <= math.log(2) + 1e-9


# ---------------------------------------------------------------------------
# runs_test_revenue
# ---------------------------------------------------------------------------


def test_runs_test_replay():
    rows = _duck(
        "SELECT o_orderdate,"
        " CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)"
        " FROM orders GROUP BY 1 ORDER BY 1"
    )
    revs = [r[1] for r in rows]
    sr = sorted(revs)
    n = len(sr)
    med2 = sr[n // 2] * 2 if n % 2 else sr[n // 2 - 1] + sr[n // 2]
    signs = [1 if r * 2 > med2 else -1 for r in revs if r * 2 != med2]
    n_plus = sum(1 for s in signs if s > 0)
    n_minus = len(signs) - n_plus
    runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
    nd = len(signs)
    # DuckDB // truncates toward zero (all operands positive here)
    expected = (1000 * nd + 2000 * n_plus * n_minus) // nd

    from etl_portofolio_spark.plans.round12_queries import ROUND12_QUERIES

    oracle = ROUND12_QUERIES["runs_test_revenue"][1]
    row = _duck(oracle)[0]
    assert row == (nd, n_plus, n_minus, runs, expected)


# ---------------------------------------------------------------------------
# ks_wasserstein_quantity
# ---------------------------------------------------------------------------


def test_ks_wasserstein_replay():
    rows = _duck(
        "SELECT CAST(l_quantity AS BIGINT), l_returnflag"
        " FROM lineitem WHERE l_returnflag IN ('R','N')"
    )
    hist: dict[int, list[int]] = {}
    for q, f in rows:
        c = hist.setdefault(q, [0, 0])
        c[0 if f == "R" else 1] += 1
    n_r = sum(c[0] for c in hist.values())
    n_n = sum(c[1] for c in hist.values())
    qs = sorted(hist)
    cum_r = cum_n = 0
    ds, gaps = [], []
    for i, q in enumerate(qs):
        cum_r += hist[q][0]
        cum_n += hist[q][1]
        ds.append(abs((1000 * cum_r) // n_r - (1000 * cum_n) // n_n))
        gaps.append((qs[i + 1] - q) if i + 1 < len(qs) else 0)
    ks = max(ds)
    ks_at = min(q for q, d in zip(qs, ds) if d == ks)
    w1 = sum(d * g for d, g in zip(ds, gaps))

    from etl_portofolio_spark.plans.round12_queries import ROUND12_QUERIES

    oracle = ROUND12_QUERIES["ks_wasserstein_quantity"][1]
    row = _duck(oracle)[0]
    assert row == (n_r, n_n, ks, ks_at, w1)


# ---------------------------------------------------------------------------
# theil_index_nations
# ---------------------------------------------------------------------------


def test_theil_replay_and_nonnegativity():
    rows = _duck(
        """
        SELECT n.n_name, CAST(sum(CAST(round(o.o_totalprice * 100, 0)
               AS BIGINT)) AS BIGINT) AS x_c
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name, o.o_custkey
        """
    )
    groups: dict[str, list[int]] = {}
    for name, x in rows:
        groups.setdefault(name, []).append(x)

    from etl_portofolio_spark.plans.round12_queries import ROUND12_QUERIES

    oracle = ROUND12_QUERIES["theil_index_nations"][1]
    got = {r[0]: (r[1], r[2], r[3]) for r in _duck(oracle)}
    assert set(got) == set(groups)
    for name, xs in groups.items():
        n_g, s_g = len(xs), sum(xs)
        terms = 0
        for x in xs:
            r = x * n_g / s_g
            terms += round(r * math.log(r), 12) * 10**12
        theil = round(round(terms) / 10**12 / n_g, 6)
        assert got[name][0] == n_g
        assert got[name][1] == s_g
        assert abs(got[name][2] - theil) < 2e-6, name
        # Theil T is non-negative (Jensen); zero only under equality
        assert got[name][2] >= -1e-9


# ---------------------------------------------------------------------------
# plan-shape assertions (the scale-design claims, checked)
# ---------------------------------------------------------------------------


def _plan(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_winnowing_plan_is_map_only(spark):
    """Zero joins, zero Python UDFs, zero KEYED shuffles — the whole
    selection pipeline is one projection chain over the scan. The one
    exchange allowed is spread()'s round-robin input rebalance (r10:
    the one-row-group test fixture otherwise serializes the gram-hash +
    window-min pipeline on a single task; a no-op at production split
    counts), which carries raw input rows, never derived data."""
    from etl_portofolio_spark.plans.round12_queries import (
        q_winnowing_fingerprints,
    )

    p = _plan(q_winnowing_fingerprints(spark, SF_DIR))
    assert p.count(") Exchange") <= 1
    assert p.count("hashpartitioning") == 0  # never a keyed shuffle
    assert "Join" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_round12_no_cartesian_or_smj_on_fact_paths(spark):
    from etl_portofolio_spark.plans.round12_queries import (
        q_jensen_shannon_source_drift,
        q_ks_wasserstein_quantity,
        q_theil_index_nations,
    )

    for q in (
        q_jensen_shannon_source_drift,
        q_ks_wasserstein_quantity,
        q_theil_index_nations,
    ):
        p = _plan(q(spark, SF_DIR))
        assert "CartesianProduct" not in p, q.__name__
    # the nation/group panels must broadcast, never sort-merge
    assert "SortMergeJoin" not in _plan(q_theil_index_nations(spark, SF_DIR))


# ---------------------------------------------------------------------------
# gumbel_block_maxima / simpson_diversity_sources / hill_tail_index
# ---------------------------------------------------------------------------


def test_gumbel_replay():
    rows = _duck(
        "SELECT date_trunc('month', o_orderdate) AS m,"
        " max(rev_c) AS mx FROM (SELECT o_orderdate,"
        " CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)"
        " AS rev_c FROM orders GROUP BY 1) GROUP BY 1"
    )
    mx = [r[1] for r in rows]
    n, s, ss = len(mx), sum(mx), sum(v * v for v in mx)
    std = math.sqrt(ss * n - s * s) / n
    sq6pi = 2.449489742783178 / 3.141592653589793
    gamma = 0.5772156649015329
    beta = std * sq6pi
    mu = s / n - gamma * beta
    expect = (
        n,
        s // n,
        math.floor(std + 0.5),
        math.floor(beta + 0.5),
        math.floor(mu + 0.5),
    )
    from etl_portofolio_spark.plans.round12_queries import ROUND12_QUERIES

    row = _duck(ROUND12_QUERIES["gumbel_block_maxima"][1])[0]
    assert row == expect


def test_simpson_replay_and_bounds():
    rows = _duck(
        "SELECT lang, source, count(*) FROM documents GROUP BY 1, 2"
    )
    by_lang: dict[str, list[int]] = {}
    for lang, _src, c in rows:
        by_lang.setdefault(lang, []).append(c)

    from etl_portofolio_spark.plans.round12_queries import ROUND12_QUERIES

    got = {r[0]: r[1:] for r in _duck(ROUND12_QUERIES["simpson_diversity_sources"][1])}
    assert set(got) == set(by_lang)
    for lang, cs in by_lang.items():
        n = sum(cs)
        pairs = sum(c * (c - 1) for c in cs)
        # exact integer division — the DECIMAL // float-division trap
        # in DuckDB is exactly what this replay pins against
        simpson = (pairs * 1_000_000) // (n * (n - 1))
        assert got[lang] == (n, len(cs), simpson), lang
        assert 0 <= simpson <= 1_000_000


def test_hill_replay():
    rows = _duck(
        "SELECT CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))"
        " AS BIGINT) AS x FROM orders GROUP BY o_custkey"
        " ORDER BY x DESC LIMIT 101"
    )
    xs = [r[0] for r in rows]
    xk1 = min(xs)
    terms = [round(math.log(x / xk1), 12) * 10**12 for x in xs if x > xk1]
    k = len(terms)
    inv_alpha = round(round(sum(terms)) / 10**12 / k, 6)
    alpha = round(k / (round(sum(terms)) / 10**12), 6)

    from etl_portofolio_spark.plans.round12_queries import ROUND12_QUERIES

    row = _duck(ROUND12_QUERIES["hill_tail_index"][1])[0]
    assert row[0] == k and row[1] == xk1
    assert abs(row[2] - inv_alpha) < 2e-6
    assert abs(row[3] - alpha) < 2e-5
