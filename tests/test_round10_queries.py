"""Round-10 wave: algorithmic cross-checks beyond the oracle hash —
the ANOVA / Brown-Forsythe / log-rank / Yule-Walker / kappa statistics
replayed from raw rows in pure-Python integer arithmetic (the staged
truncating-division formulas are the spec, so the replay is exact),
Gram-matrix cells re-derived with numpy over the quantized block, and
structural invariants (decomposition conservation, one-sidedness,
margins) for the rest."""

from __future__ import annotations

import math
import re

import duckdb

from tests.conftest import SF_DIR


def _rows(sql: str):
    return duckdb.sql(sql).fetchall()


def _anova_from_groups(groups: dict[str, list[int]]):
    """The wave's staged-integer ANOVA, replayed in pure Python.

    Spark ``div`` / DuckDB ``//`` truncate toward zero; every quantity
    here is nonnegative, so Python ``//`` matches exactly.
    """
    per = []
    for vals in groups.values():
        n, s, ss = len(vals), sum(vals), sum(v * v for v in vals)
        per.append(((n * ss - s * s) * 1000 // n, s * s * 1000 // n, n, s))
    n_total = sum(p[2] for p in per)
    k = len(per)
    s_all = sum(p[3] for p in per)
    ssw = sum(p[0] for p in per)
    sum_t = sum(p[1] for p in per)
    ssb = sum_t - (s_all * s_all * 1000 // n_total)
    f = (ssb * 1000000 // ssw) * (n_total - k) // (k - 1)
    return n_total, k, ssw, ssb, f


def test_anova_replayed_from_raw_rows(spark):
    from etl_portofolio_spark.plans.round10_queries import (
        q_anova_oneway_quantity,
    )

    raw = _rows(
        f"""
        SELECT o.o_orderpriority, CAST(l.l_quantity AS BIGINT)
        FROM read_parquet('{SF_DIR}/lineitem.parquet') l
        JOIN read_parquet('{SF_DIR}/orders.parquet') o
          ON l.l_orderkey = o.o_orderkey
        """
    )
    groups: dict[str, list[int]] = {}
    for grp, q in raw:
        groups.setdefault(grp, []).append(q)
    n_total, k, ssw, ssb, f = _anova_from_groups(groups)

    row = q_anova_oneway_quantity(spark, SF_DIR).collect()[0]
    assert (
        row["n_total"],
        row["k_groups"],
        row["ssw_milli"],
        row["ssb_milli"],
        row["f_permicro"],
    ) == (n_total, k, ssw, ssb, f)
    # decomposition conservation: SSW + SSB = SStot up to the k+1
    # truncating divisions' slack (each drops < 1 milli-unit)
    ss_all = sum(v * v for vals in groups.values() for v in vals)
    s_all = sum(sum(vals) for vals in groups.values())
    sstot_milli = (n_total * ss_all - s_all * s_all) * 1000 // n_total
    assert 0 <= sstot_milli - (ssw + ssb) <= (k + 1) * 1000


def test_brown_forsythe_replayed_from_raw_rows(spark):
    from etl_portofolio_spark.plans.round10_queries import (
        q_brown_forsythe_quantity,
    )

    raw = _rows(
        f"""
        SELECT o.o_orderpriority, CAST(l.l_quantity AS BIGINT)
        FROM read_parquet('{SF_DIR}/lineitem.parquet') l
        JOIN read_parquet('{SF_DIR}/orders.parquet') o
          ON l.l_orderkey = o.o_orderkey
        """
    )
    groups: dict[str, list[int]] = {}
    for grp, q in raw:
        groups.setdefault(grp, []).append(q)
    zgroups = {}
    for grp, vals in groups.items():
        sv = sorted(vals)
        n = len(sv)
        med2 = sv[n // 2] * 2 if n % 2 else sv[n // 2 - 1] + sv[n // 2]
        zgroups[grp] = [abs(2 * v - med2) for v in vals]
    n_total, k, ssw, ssb, f = _anova_from_groups(zgroups)

    row = q_brown_forsythe_quantity(spark, SF_DIR).collect()[0]
    assert (row["n_total"], row["k_groups"]) == (n_total, k)
    assert (row["ssw_milli"], row["ssb_milli"], row["bf_f_permicro"]) == (
        ssw,
        ssb,
        f,
    )


def test_logrank_replayed_from_raw_rows(spark):
    from etl_portofolio_spark.plans.round10_queries import (
        q_logrank_return_priority,
    )

    per_order = _rows(
        f"""
        WITH fr AS (
          SELECT l_orderkey, MIN(CAST(l_shipdate AS DATE)) AS ret_date
          FROM read_parquet('{SF_DIR}/lineitem.parquet')
          WHERE l_returnflag = 'R' GROUP BY 1
        ), gm AS (
          SELECT MAX(CAST(l_shipdate AS DATE)) AS g
          FROM read_parquet('{SF_DIR}/lineitem.parquet')
        )
        SELECT CASE WHEN fr.ret_date IS NOT NULL
                    THEN datediff('day', CAST(o.o_orderdate AS DATE), fr.ret_date)
                    ELSE datediff('day', CAST(o.o_orderdate AS DATE), gm.g)
               END,
               CASE WHEN fr.ret_date IS NOT NULL THEN 1 ELSE 0 END,
               CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END
        FROM read_parquet('{SF_DIR}/orders.parquet') o
        LEFT JOIN fr ON o.o_orderkey = fr.l_orderkey CROSS JOIN gm
        """
    )
    by_dur: dict[int, list[int]] = {}
    for dur, ev, g1 in per_order:
        c = by_dur.setdefault(dur, [0, 0, 0, 0])
        c[0] += 1
        c[1] += g1
        c[2] += ev
        c[3] += ev * g1
    n_at = n1_at = 0
    o1 = e1 = v = d_total = 0
    for dur in sorted(by_dur, reverse=True):
        c_all, c_g1, d_all, d_g1 = by_dur[dur]
        n_at += c_all
        n1_at += c_g1
        if d_all > 0:
            d_total += d_all
            o1 += d_g1
            e1 += d_all * n1_at * 1000000000 // n_at
            if n_at > 1:
                v += (
                    (
                        (d_all * (n_at - d_all) * 1000 // (n_at - 1))
                        * n1_at
                        // n_at
                    )
                    * (n_at - n1_at)
                ) * 1000000 // n_at
    diff = (o1 * 1000000000 - e1) // 1000000 if o1 * 1000000000 >= e1 else -(
        (e1 - o1 * 1000000000) // 1000000
    )
    chi2 = diff * diff // (v // 1000000)

    row = q_logrank_return_priority(spark, SF_DIR).collect()[0]
    assert row["d_total"] == d_total
    assert row["o1"] == o1
    assert row["e1_nano"] == e1
    assert row["v_nano"] == v
    assert row["chi2_milli"] == chi2
    assert row["chi2_milli"] >= 0
    assert row["o1"] <= row["d_total"]


def test_yule_walker_replayed_and_bounded(spark):
    from etl_portofolio_spark.plans.round10_queries import q_yule_walker_ar2

    daily = _rows(
        f"""
        SELECT CAST(o_orderdate AS DATE) AS day,
               SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) // 100
        FROM read_parquet('{SF_DIR}/orders.parquet')
        GROUP BY 1 ORDER BY 1
        """
    )
    rev = [int(r[1]) for r in daily]
    n = len(rev)
    s = sum(rev)
    m = s // n
    y = [r - m for r in rev]
    c0 = sum(v * v for v in y)
    c1 = sum(y[i] * y[i - 1] for i in range(1, n))
    c2 = sum(y[i] * y[i - 2] for i in range(2, n))

    def tdiv(a: int, b: int) -> int:
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    r1 = tdiv(c1, c0 // 1000000)
    r2 = tdiv(c2, c0 // 1000000)

    row = q_yule_walker_ar2(spark, SF_DIR).collect()[0]
    assert (row["n_days"], row["mean_dollars"]) == (n, m)
    assert (row["c0"], row["c1"], row["c2"]) == (c0, c1, c2)
    assert (row["r1_permicro"], row["r2_permicro"]) == (r1, r2)
    assert abs(row["r1_permicro"]) <= 1000000
    assert abs(row["r2_permicro"]) <= 1000000
    phi1 = tdiv(r1 * (1000000 - r2) * 1000000, 1000000000000 - r1 * r1)
    assert row["phi1_permicro"] == phi1


def test_gram_matrix_cells_match_numpy(spark):
    import numpy as np

    from etl_portofolio_spark.plans.round10_queries import (
        _GRAM_D,
        q_gram_matrix_block,
    )

    embs = _rows(
        f"SELECT embedding FROM read_parquet('{SF_DIR}/embeddings.parquet')"
    )
    q = np.array(
        [
            [math.floor(float(v) * 1000000 + 0.5) for v in e[0][:_GRAM_D]]
            for e in embs
        ],
        dtype=object,
    )
    rows = q_gram_matrix_block(spark, SF_DIR).collect()
    assert len(rows) == _GRAM_D * (_GRAM_D + 1) // 2
    got = {(r["i"], r["j"]): r["gram"] for r in rows}
    for i, j in [(0, 0), (0, 1), (5, 9), (_GRAM_D - 1, _GRAM_D - 1)]:
        expected = int(sum(q[:, i] * q[:, j]))
        assert got[(i, j)] == expected
    # diagonal cells are sums of squares: strictly nonnegative
    for i in range(_GRAM_D):
        assert got[(i, i)] >= 0
    assert all(r["n_vecs"] == len(embs) for r in rows)


def test_mutual_information_margins_and_sign(spark):
    from etl_portofolio_spark.plans.round10_queries import (
        q_mutual_information_discount_return,
    )

    rows = q_mutual_information_discount_return(spark, SF_DIR).collect()
    n_total = _rows(
        f"SELECT COUNT(*) FROM read_parquet('{SF_DIR}/lineitem.parquet')"
    )[0][0]
    assert sum(r["n_xy"] for r in rows) == n_total
    # plug-in MI is >= 0 in exact arithmetic; the nano-rounded integer
    # image can dip below by at most 1 nano per cell
    mi = rows[0]["mi_nano"]
    assert all(r["mi_nano"] == mi for r in rows)
    assert mi >= -len(rows)
    # per-cell pmi replays in Python within 1 nano (ln ulp slack)
    cells = {(r["discount_pct"], r["returnflag"]): r for r in rows}
    n_x: dict[int, int] = {}
    n_y: dict[str, int] = {}
    for (x, y), r in cells.items():
        n_x[x] = n_x.get(x, 0) + r["n_xy"]
        n_y[y] = n_y.get(y, 0) + r["n_xy"]
    for (x, y), r in cells.items():
        ratio = (r["n_xy"] * n_total) / (n_x[x] * n_y[y])
        py = round(math.log(ratio) * 1e9)
        assert abs(r["pmi_nano"] - py) <= 1


def test_good_turing_replayed_from_python_bigrams(spark):
    from etl_portofolio_spark.plans.round10_queries import (
        _GT_MAX_R,
        q_good_turing_smoothing,
    )

    texts = _rows(
        f"SELECT text FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    counts: dict[str, int] = {}
    total = 0
    for (t,) in texts:
        toks = re.split(r"\s+", t.strip().lower())
        for a, b in zip(toks, toks[1:]):
            bg = f"{a} {b}"
            counts[bg] = counts.get(bg, 0) + 1
    fof: dict[int, int] = {}
    for r in counts.values():
        fof[r] = fof.get(r, 0) + 1
    total = sum(r * n for r, n in fof.items())
    n1 = fof.get(1, 0)

    rows = q_good_turing_smoothing(spark, SF_DIR).collect()
    assert rows, "frequency-of-frequencies head must be non-empty"
    for row in rows:
        r = row["r"]
        assert r <= _GT_MAX_R
        assert row["n_r"] == fof[r]
        nxt = fof.get(r + 1, 0)
        assert row["r_star_permille"] == (
            (r + 1) * nxt * 1000 // fof[r] if nxt else 0
        )
        assert row["p0_permicro"] == n1 * 1000000 // total


def test_cohens_kappa_replayed_from_python(spark):
    from etl_portofolio_spark.plans.round10_queries import (
        q_cohens_kappa_heuristics,
    )

    docs = _rows(
        f"SELECT n_chars, text FROM read_parquet('{SF_DIR}/documents.parquet')"
    )
    ncs = sorted(d[0] for d in docs)
    wcs_all = [len(re.split(r"\s+", d[1].strip().lower())) for d in docs]
    wcs = sorted(wcs_all)
    n = len(docs)

    def med2(sv: list[int]) -> int:
        return sv[n // 2] * 2 if n % 2 else sv[n // 2 - 1] + sv[n // 2]

    t_nc2, t_wc2 = med2(ncs), med2(wcs)
    n11 = n10 = n01 = n00 = 0
    for (nc, _), wc in zip(docs, wcs_all):
        a = 2 * nc >= t_nc2
        b = 2 * wc >= t_wc2
        n11 += a and b
        n10 += a and not b
        n01 += (not a) and b
        n00 += (not a) and (not b)

    row = q_cohens_kappa_heuristics(spark, SF_DIR).collect()[0]
    assert (row["n11"], row["n10"], row["n01"], row["n00"]) == (
        n11,
        n10,
        n01,
        n00,
    )
    pe_num = (n11 + n10) * (n11 + n01) + (n01 + n00) * (n10 + n00)
    assert row["kappa_permicro"] == (n * (n11 + n00) - pe_num) * 1000000 // (
        n * n - pe_num
    )
    assert -1000000 <= row["kappa_permicro"] <= 1000000
