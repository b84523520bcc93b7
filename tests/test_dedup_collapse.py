"""Exact-duplicate collapse inside minhash_candidate_pairs: the
collapsed plan must return BYTE-IDENTICAL pairs to the uncollapsed
one on a corpus with real duplicate groups — including the 1.0
intra-group cliques, cross-group near-dup expansion, and the
shingle-less-text drop."""

from __future__ import annotations

from etl_portofolio_spark.caching import release_cached
from etl_portofolio_spark.operators.dedup import minhash_candidate_pairs


def _pairs(df):
    return sorted((r["id_a"], r["id_b"], round(r["jaccard"], 9)) for r in df.collect())


def test_collapse_matches_uncollapsed_on_dup_groups(spark):
    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron pi rho sigma tau upsilon"
    )
    near = base.replace("kappa", "kappax")  # near-dup of the base text
    rows = (
        [(i, base) for i in range(10, 15)]          # 5 exact copies
        + [(i, near) for i in range(20, 23)]        # 3 copies of a near-dup
        + [(30, "tiny"), (31, "tiny")]              # shingle-less duplicates
        + [(40, "completely different words about other things entirely here")]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    try:
        collapsed = _pairs(
            minhash_candidate_pairs(docs, "doc_id", "text", 0.5, collapse_exact=True)
        )
        release_cached()
        plain = _pairs(
            minhash_candidate_pairs(docs, "doc_id", "text", 0.5, collapse_exact=False)
        )
        assert collapsed == plain
        ids = {(a, b) for a, b, _ in collapsed}
        # intra-group cliques present, at exactly 1.0
        assert (10, 11) in ids and (13, 14) in ids and (20, 22) in ids
        assert all(
            j == 1.0 for a, b, j in collapsed if a >= 10 and b < 15
        )
        # cross-group near-dup pairs expanded to every member pair
        assert {(a, b) for a, b, _ in collapsed if a < 15 and 20 <= b < 23} == {
            (a, b) for a in range(10, 15) for b in range(20, 23)
        }
        # shingle-less duplicates never pair (NaN verdict drops them)
        assert (30, 31) not in ids
    finally:
        release_cached()
