"""Independent checks for queries whose DuckDB oracle SHARES its
algebra with the Spark plan (Python-interpolated constants or the same
decomposition), so the driver's hash match cannot falsify the rule
itself — the r9 a36 lesson: the Spark query and its oracle carried the
same wrong carry-in rule and hash-matched green twice; only a
hand-solved test plus a brute-force hypothesis property caught it.

Every test here computes ground truth through a DIFFERENT path than
the production decomposition: pure-Python set intersections instead of
the max-rank join trick (e21), per-doc Python dicts instead of SQL
joins/aggs over hashed features (m52), direct hashlib arithmetic (m53),
hand-solved mixtures including the 0/0 guard case (m57), and
math.log10 + hand-counted digits (a35). Fixtures that exercise the
registered query end-to-end write a tiny documents.parquet and pass its
directory as sf_dir — the production read path, not a test double.
"""

from __future__ import annotations

import hashlib
import math

from hypothesis import given, settings
from hypothesis import strategies as st

from tests.hyputil import hyp_examples

_settings = settings(max_examples=hyp_examples(7, 25), deadline=None)


def _md5_16(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:4], 16)


def _toks(text: str) -> list[str]:
    """Mirror of text.tokens: split on single space, drop empties."""
    return [t for t in text.split(" ") if t != ""]


def _write_documents(spark, path: str, rows: list[tuple]) -> str:
    """Write (doc_id, text, lang, source) rows in the testdata
    documents schema and return the sf_dir to pass to a query."""
    df = spark.createDataFrame(
        [(i, t, lg, s, len(t)) for i, t, lg, s in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.repartition(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")
    return path


# --- e21: rank-biased overlap ------------------------------------------------


def _rbo_python(a: list[int], b: list[int], k: int, p: float) -> float:
    """Textbook truncated RBO via per-depth SET INTERSECTIONS — no
    max-rank trick, no conditional aggregation."""
    return sum(
        (1.0 - p) * p ** (d - 1) * len(set(a[:d]) & set(b[:d])) / d
        for d in range(1, k + 1)
    )


def _ranking_df(spark, lists: dict[int, list[int]]):
    rows = [
        (q, item, r + 1)
        for q, items in lists.items()
        for r, item in enumerate(items)
    ]
    return spark.createDataFrame(
        rows, "query_id long, neighbor_id long, rank long"
    )


def test_rbo_overlap_hand_solved(spark):
    from group_2_shopware_enterprise_data_engineering_project_spark.operators import (
        similarity,
    )

    k, p = 5, 0.9
    a = {0: [1, 2, 3, 4, 5], 1: [1, 2, 3], 2: [10, 11]}
    b = {0: [2, 1, 3, 6, 7], 1: [1, 2, 3], 2: [20, 21]}
    out = {
        r.query_id: r
        for r in similarity.rbo_overlap(
            _ranking_df(spark, a), _ranking_df(spark, b), k=k, p=p
        ).collect()
    }
    # identical rankings score the truncated-RBO maximum
    assert out[1].n_common == 3
    assert out[1].rbo == _rbo_python([1, 2, 3], [1, 2, 3], k, p)
    # disjoint rankings score exactly zero through the left-join path
    assert out[2].n_common == 0 and out[2].rbo == 0.0
    # the general case, hand-checkable: overlaps at depths 1..5 are
    # 0, 2, 3, 3, 3 -> rbo = sum w_d * |A_:d ∩ B_:d| with w from the
    # Webber formula
    assert out[0].n_common == 3  # top-5 intersection {1, 2, 3}
    assert abs(out[0].rbo - _rbo_python(a[0], b[0], k, p)) == 0.0


@given(
    a=st.lists(
        st.integers(min_value=0, max_value=15),
        unique=True, min_size=1, max_size=5,
    ),
    b=st.lists(
        st.integers(min_value=0, max_value=15),
        unique=True, min_size=1, max_size=5,
    ),
)
@_settings
def test_rbo_overlap_matches_set_intersections(spark, a, b):
    from group_2_shopware_enterprise_data_engineering_project_spark.operators import (
        similarity,
    )

    k, p = 5, 0.9
    got = similarity.rbo_overlap(
        _ranking_df(spark, {7: a}), _ranking_df(spark, {7: b}), k=k, p=p
    ).collect()[0]
    assert got.n_common == len(set(a) & set(b))
    assert math.isclose(
        got.rbo, _rbo_python(a, b, k, p), rel_tol=0, abs_tol=1e-15
    )


# --- m52: hashed-feature importance selection --------------------------------


def test_m52_importance_selection_brute_force(spark, tmp_path):
    """Reimplement the DSIR-lite selection rule with per-doc Python
    dicts over hashlib-hashed features — no joins, no SQL — and demand
    the registered query reproduce it on a crafted corpus where the
    target (src0) and raw pools share some tokens and not others."""
    from group_2_shopware_enterprise_data_engineering_project_spark.queries.ml_prep import (
        _M52_D,
        m52_importance_selection,
    )

    rows = [
        (1, "ml ml ml data", "en", "src0"),       # target
        (2, "ml data data web", "en", "src0"),    # target
        (10, "ml ml data cats", "en", "src1"),    # raw, ml-leaning
        (11, "web web cats dogs", "en", "src1"),  # raw, off-target
        (12, "ml", "en", "src2"),                 # raw, single token
        (13, "dogs dogs", "en", "src2"),          # raw, off-target
    ]
    sf = _write_documents(spark, str(tmp_path), rows)

    # brute force: feature counts per doc, target/raw totals, leaning
    # features by exact cross-multiplication, keep when 2*leaning>=all
    def fidx(tok: str) -> int:
        return _md5_16(tok) % _M52_D

    tc: dict[int, int] = {}
    rc: dict[int, int] = {}
    per_doc: dict[int, dict[int, int]] = {}
    for doc_id, text, _lg, source in rows:
        d = per_doc.setdefault(doc_id, {})
        for tok in _toks(text):
            i = fidx(tok)
            d[i] = d.get(i, 0) + 1
            tgt = tc if source == "src0" else rc
            tgt[i] = tgt.get(i, 0) + 1
    tt, tr = sum(tc.values()), sum(rc.values())
    lean = {
        i
        for i in set(tc) | set(rc)
        if tc.get(i, 0) * tr > rc.get(i, 0) * tt
    }
    expect = {}
    for doc_id, text, _lg, source in rows:
        if source == "src0":
            continue
        n_tokens = sum(per_doc[doc_id].values())
        n_leaning = sum(
            n for i, n in per_doc[doc_id].items() if i in lean
        )
        expect[doc_id] = (n_tokens, n_leaning, int(2 * n_leaning >= n_tokens))

    got = {
        r.doc_id: (r.n_tokens, r.n_leaning, r.keep_flag)
        for r in m52_importance_selection(spark, sf).collect()
    }
    assert got == expect
    # the fixture is discriminative: at least one kept, one dropped
    assert {v[2] for v in expect.values()} == {0, 1}


# --- m53: span-corruption layout ----------------------------------------------


def test_m53_span_corruption_hand_solved(spark, tmp_path):
    """Direct hashlib arithmetic for the hash-placed start slots: one
    3-token span per 20-token chunk, start = chunk_base + md5_16 mod 18.
    Docs under 20 tokens emit nothing; 45 tokens emit exactly 2 chunks
    (the 5-token tail is dropped, not a short span)."""
    from group_2_shopware_enterprise_data_engineering_project_spark.queries.ml_prep import (
        _M53_CHUNK,
        _M53_SLOTS,
        _M53_SPAN,
        m53_span_corruption,
    )

    rows = [
        (1, " ".join(f"w{i}" for i in range(19)), "en", "src0"),  # too short
        (2, " ".join(f"w{i}" for i in range(20)), "en", "src0"),  # 1 chunk
        (3, " ".join(f"w{i}" for i in range(45)), "en", "src1"),  # 2 chunks
    ]
    sf = _write_documents(spark, str(tmp_path), rows)
    expect = set()
    for doc_id, n_chunks in ((2, 1), (3, 2)):
        for c in range(n_chunks):
            slot = _md5_16(f"span:{doc_id}:{c}") % _M53_SLOTS
            expect.add((doc_id, c, c * _M53_CHUNK + slot, _M53_SPAN))
    got = {
        (r.doc_id, r.span_idx, r.start_tok, r.span_len)
        for r in m53_span_corruption(spark, sf).collect()
    }
    assert got == expect
    # every span stays inside its chunk
    for _doc, c, start, ln in got:
        assert c * _M53_CHUNK <= start and start + ln <= (c + 1) * _M53_CHUNK


# --- m57: effective-mixture audit ----------------------------------------------


def test_m57_effective_mixture_hand_solved(spark, tmp_path):
    """Hand-solved mixture: an intra-source exact dup, a CROSS-source
    dup (canonical ownership goes to the min doc_id's source), and an
    all-empty source exercising the 0/0 guard (dup_token_share must be
    0.0, not NaN)."""
    from group_2_shopware_enterprise_data_engineering_project_spark.queries.ml_prep import (
        m57_effective_mixture,
    )

    rows = [
        (1, "a b c", "en", "srcA"),
        (2, "a b c", "en", "srcA"),  # dup of 1 (same source)
        (3, "x y", "en", "srcA"),
        (6, "a b c", "en", "srcC"),  # dup of 1 (other source)
        (4, "", "en", "srcB"),       # empty
        (5, "", "en", "srcB"),       # empty (dup of 4)
    ]
    sf = _write_documents(spark, str(tmp_path), rows)
    got = {
        r.source: (
            r.raw_tokens,
            r.effective_tokens,
            r.dup_token_share,
            r.effective_weight,
        )
        for r in m57_effective_mixture(spark, sf).collect()
    }
    # srcA: raw 3+3+2=8, effective 3+2=5 (doc 2 deduped), share 3/8
    assert got["srcA"] == (8, 5, 0.375, 1.0)
    # srcB: zero raw tokens -> guarded share 0.0 (not NaN), weight 0
    assert got["srcB"] == (0, 0, 0.0, 0.0)
    # srcC: its only doc is canonical elsewhere -> all duplicated
    assert got["srcC"] == (3, 0, 1.0, 0.0)


# --- a35: Benford first-digit audit --------------------------------------------


def test_benford_audit_hand_solved(spark):
    """math.log10 ground truth for the expected shares (independently
    re-deriving the BENFORD_EXPECTED literals) plus hand-counted digits
    over a crafted amounts column, including the sub-cent rounding edge
    (0.004 -> 0 cents, filtered) and a negative amount (filtered)."""
    from group_2_shopware_enterprise_data_engineering_project_spark.operators import (
        stats,
    )

    # independently re-derive the interpolated constants
    for d in range(1, 10):
        assert math.isclose(
            stats.BENFORD_EXPECTED[d - 1],
            math.log10(1.0 + 1.0 / d),
            rel_tol=0,
            abs_tol=1e-15,
        )

    amounts = [1.00, 19.99, 1234.56, 0.005, 0.004, -5.0, 9.99, 2.50, 25.0]
    # cents: 100, 1999, 123456, 1, 0(drop), -500(drop), 999, 250, 2500
    # first digits:  1,  1,  1,  1,        9,  2,  2   -> total 7
    hand = {1: 4, 2: 2, 9: 1}
    total = 7
    df = spark.createDataFrame([(a,) for a in amounts], "amt double")
    got = {r.digit: r for r in stats.benford_audit(df, "amt").collect()}
    assert set(got) == set(range(1, 10))
    for d in range(1, 10):
        n = hand.get(d, 0)
        assert got[d].n == n
        share = n / total if n else 0.0
        assert math.isclose(got[d].share, share, rel_tol=0, abs_tol=1e-15)
        dev = share - math.log10(1.0 + 1.0 / d)
        assert math.isclose(got[d].deviation, dev, rel_tol=0, abs_tol=1e-12)
        assert got[d].flagged == int(abs(dev) > 0.02)


# --- a37: EWMA revenue baseline -------------------------------------------------


def test_a37_ewma_hand_solved(spark, tmp_path):
    """Textbook-float ground truth for the integer-weight EWMA: compute
    alpha(1-alpha)^j renormalized weights in pure Python and the
    smoothed series by direct summation, then demand the query's exact
    dyadic-rational formulation agree to 1e-12 relative — plus an
    engineered spike day the flag must catch and a quiet day it must
    not."""
    from datetime import datetime

    from group_2_shopware_enterprise_data_engineering_project_spark.queries.batch_analytics import (
        a37_ewma_revenue,
    )

    # one "click" event per day; day 4 spikes 10x
    daily = [100.0, 110.0, 90.0, 105.0, 1000.0, 95.0]
    rows = [
        (i, datetime(2024, 3, 1 + i, 12, 0, 0), 7, "click", v, "{}")
        for i, v in enumerate(daily)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.repartition(1).write.mode("overwrite").parquet(
        f"{tmp_path}/events.parquet"
    )
    got = {
        str(r.day): r
        for r in a37_ewma_revenue(spark, str(tmp_path)).collect()
    }
    assert len(got) == len(daily)

    a, L = 0.25, 7
    w = [a * (1 - a) ** j for j in range(L)]
    w = [x / sum(w) for x in w]
    cents = [round(v * 100) for v in daily]
    for i, c in enumerate(cents):
        lags = [cents[i - j] if i - j >= 0 else 0 for j in range(L)]
        want = sum(wj * cj for wj, cj in zip(w, lags))
        r = got[f"2024-03-{1 + i:02d}"]
        assert r.cents == c
        assert math.isclose(r.ewma_7, want, rel_tol=1e-12)
        assert r.spike_flag == int(c > 2 * want)
    assert got["2024-03-05"].spike_flag == 1  # the engineered spike
    assert got["2024-03-06"].spike_flag == 0  # quiet day after


# --- t33: per-source term concentration (HHI) -----------------------------------


def test_t33_hhi_hand_solved(spark, tmp_path):
    """Hand-counted HHI: 'x x x y' -> (9+1)/16 = 0.625; a single
    repeated term -> exactly 1.0; a uniform vocabulary -> 1/n_terms."""
    from group_2_shopware_enterprise_data_engineering_project_spark.queries.text_pipeline import (
        t33_term_concentration,
    )

    rows = [
        (1, "x x x y", "en", "srcA"),
        (2, "z z z", "en", "srcB"),
        (3, "a b", "en", "srcC"),
        (4, "c d", "en", "srcC"),
    ]
    sf = _write_documents(spark, str(tmp_path), rows)
    got = {
        r.source: (r.n_terms, r.total_tokens, r.sum_sq, r.hhi)
        for r in t33_term_concentration(spark, sf).collect()
    }
    assert got["srcA"] == (2, 4, 10, 0.625)
    assert got["srcB"] == (1, 3, 9, 1.0)
    assert got["srcC"] == (4, 4, 4, 0.25)


# --- a38: order-total reconciliation ---------------------------------------------


def test_a38_reconciliation_hand_solved(spark, tmp_path):
    """Hand-built star fixture: an order whose stored total equals the
    exact-cents recomputed charge (reconciled), one off by a cent
    (flagged with diff +1), a line-less zero-total order (reconciled),
    and a line-less nonzero order (diff = -total)."""
    from group_2_shopware_enterprise_data_engineering_project_spark.queries.warehouse_q import (
        a38_totalprice_reconciliation,
    )

    def charge(p, d, t):
        return math.floor(p * (1 - d) * (1 + t) * 100.0 + 0.5)

    lines = [
        (1, 100.00, 0.05, 0.08),
        (1, 250.50, 0.00, 0.04),
        (2, 10.00, 0.10, 0.00),
    ]
    ok_total = (charge(100.00, 0.05, 0.08) + charge(250.50, 0.00, 0.04)) / 100.0
    off_total = (charge(10.00, 0.10, 0.00) - 1) / 100.0  # one cent short
    orders = [(1, ok_total), (2, off_total), (3, 0.0), (4, 42.00)]
    spark.createDataFrame(
        orders, "o_orderkey long, o_totalprice double"
    ).repartition(1).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    spark.createDataFrame(
        lines,
        "l_orderkey long, l_extendedprice double, l_discount double,"
        " l_tax double",
    ).repartition(1).write.mode("overwrite").parquet(
        f"{tmp_path}/lineitem.parquet"
    )
    got = {
        r.o_orderkey: (r.n_lines, r.diff_cents, r.reconciled)
        for r in a38_totalprice_reconciliation(spark, str(tmp_path)).collect()
    }
    assert got == {
        1: (2, 0, 1),
        2: (1, 1, 0),    # recomputed is one cent MORE than stored
        3: (0, 0, 1),    # no lines, zero total: vacuously consistent
        4: (0, -4200, 0),
    }


# --- m61: soft-dedup weights ------------------------------------------------------


def test_m61_softdedup_weights_hand_solved(spark, tmp_path):
    """Planted clusters: three identical docs form one cluster (each
    weighted 1/3), two other docs are singletons (weight 1.0); every
    cluster's weights sum to exactly one document's worth of mass."""
    from group_2_shopware_enterprise_data_engineering_project_spark.queries.ml_prep import (
        m61_softdedup_weights,
    )

    dup = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (1, dup, "en", "srcA"),
        (2, dup, "en", "srcA"),
        (3, dup, "en", "srcB"),
        (4, "completely different text about spark partitions and shuffles", "en", "srcA"),
        (5, "yet another unrelated document mentioning parquet footers", "en", "srcB"),
    ]
    sf = _write_documents(spark, str(tmp_path), rows)
    got = {
        r.doc_id: (r.cluster_rep, r.cluster_size, r.weight)
        for r in m61_softdedup_weights(spark, sf).collect()
    }
    assert got[1] == (1, 3, 1.0 / 3.0)
    assert got[2] == (1, 3, 1.0 / 3.0)
    assert got[3] == (1, 3, 1.0 / 3.0)
    assert got[4] == (4, 1, 1.0)
    assert got[5] == (5, 1, 1.0)
    # gradient-mass conservation: per-cluster weights sum to 1
    mass: dict[int, float] = {}
    for rep, _n, w in got.values():
        mass[rep] = mass.get(rep, 0.0) + w
    assert all(abs(m - 1.0) < 1e-12 for m in mass.values())


# --- a39: day-of-week seasonality -------------------------------------------------


def test_a39_seasonality_hand_solved(spark, tmp_path):
    """Hand-computed index on a crafted fortnight: one event type with
    double revenue every epoch-dow 0 (Thursdays). Two Thursdays at 200
    cents, twelve other days at 100: overall avg = 1600/14, Thursday
    index = 200/(1600/14) = 1.75, other days 0.875."""
    from datetime import datetime

    from group_2_shopware_enterprise_data_engineering_project_spark.queries.batch_analytics import (
        a39_seasonality_index,
    )

    rows = []
    for i in range(14):  # 1970-01-01 was a Thursday; use 2024-01-04 (also Thu)
        day = datetime(2024, 1, 4 + i, 9, 0, 0)
        dow = (day.date() - datetime(1970, 1, 1).date()).days % 7
        v = 2.0 if dow == 0 else 1.0
        rows.append((i, day, 1, "sale", v, "{}"))
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).repartition(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    got = {
        r.dow: (r.n_days, r.cents, r.seasonality_index)
        for r in a39_seasonality_index(spark, str(tmp_path)).collect()
    }
    assert got[0] == (2, 400, (400 * 14) / (2 * 1600))
    for d in range(1, 7):
        assert got[d] == (2, 200, (200 * 14) / (2 * 1600))


# --- a40: time-bound conversion ---------------------------------------------------


def test_a40_timebound_conversion_hand_solved(spark, tmp_path):
    """Window-edge semantics pinned by hand: a purchase exactly at the
    view instant converts (closed start), exactly at view+1h does NOT
    (open end), another user's purchase never converts a view, and a
    view with two in-window purchases counts once."""
    from datetime import datetime, timedelta

    from group_2_shopware_enterprise_data_engineering_project_spark.queries.batch_analytics import (
        a40_timebound_conversion,
    )

    t0 = datetime(2024, 5, 1, 10, 0, 0)
    rows = [
        # (event_id, ts, user_id, event_type, value, props)
        (1, t0, 1, "view", 1.0, "{}"),                                  # converts (instant purchase)
        (2, t0, 1, "purchase", 1.0, "{}"),
        (3, t0, 2, "view", 1.0, "{}"),                                  # does NOT (purchase at +1h exactly)
        (4, t0 + timedelta(hours=1), 2, "purchase", 1.0, "{}"),
        (5, t0, 3, "view", 1.0, "{}"),                                  # does NOT (other user's purchase)
        (6, t0 + timedelta(minutes=5), 4, "purchase", 1.0, "{}"),
        (7, t0, 5, "view", 1.0, "{}"),                                  # converts once despite 2 purchases
        (8, t0 + timedelta(minutes=1), 5, "purchase", 1.0, "{}"),
        (9, t0 + timedelta(minutes=2), 5, "purchase", 1.0, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).repartition(1).write.mode("overwrite").parquet(f"{tmp_path}/events.parquet")
    got = a40_timebound_conversion(spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.n_views, r.n_converted) == (4, 2)
    assert r.conversion_rate == 0.5


# --- e22/e23/e24: PQ distortion + recall curves (r10 verdict item 5) ----------
#
# The oracles share the one-plan decomposition with the Spark operators
# (same CTE structure interpolated from the same constants), so the
# driver hash cannot catch a shared wrong rule. Ground truth here is
# pure numpy over INTEGER-valued vectors: every dot product and squared
# norm is an exact integer in float64 (no accumulation-order ambiguity),
# sqrt and division are IEEE-correctly-rounded, so cosines — and hence
# rankings — are bit-identical no matter which engine or fold order
# computed them.


def _int_vectors(n: int, dim: int = 64, seed: int = 7) -> list[list[float]]:
    import random

    rng = random.Random(seed)
    return [
        [float(rng.randint(-4, 4)) for _ in range(dim)] for _ in range(n)
    ]


def _emb_df(spark, vecs):
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )


def _cos(a, b, d=None):
    d = d or len(a)
    dot = sum(x * y for x, y in zip(a[:d], b[:d]))
    na = math.sqrt(sum(x * x for x in a[:d]))
    nb = math.sqrt(sum(x * x for x in b[:d]))
    return dot / (na * nb)


def _topk(vecs, q, k, d=None):
    """Brute-force top-k neighbor ids for query index q (cos desc,
    id asc), excluding self."""
    sims = [
        (-_cos(vecs[q], v, d), i)
        for i, v in enumerate(vecs)
        if i != q
    ]
    sims.sort()
    return [i for _, i in sims[:k]]


def test_e22_pq_distortion_matches_numpy(spark):
    from group_2_shopware_enterprise_data_engineering_project_spark.operators import (
        similarity,
    )

    vecs = _int_vectors(40)
    emb = _emb_df(spark, vecs)
    got = {
        r.vec_id: r.sq_err
        for r in similarity.pq_distortion(
            emb, similarity.pq_seed_codebook(emb)
        ).collect()
    }
    m, k_codes, sub = similarity.PQ_M, similarity.PQ_CODES, similarity.PQ_SUB_DIM
    for vid, v in enumerate(vecs):
        want = 0.0
        for s in range(m):
            sl = v[s * sub : (s + 1) * sub]
            want += min(
                sum((x - y) * (x - y) for x, y in zip(sl, vecs[c][s * sub : (s + 1) * sub]))
                for c in range(k_codes)
            )
        # integer arithmetic throughout -> exact equality
        assert got[vid] == want, (vid, got[vid], want)
    # sanity: the first k_codes vectors ARE codes -> zero distortion
    for vid in range(k_codes):
        assert got[vid] == 0.0


def test_e23_ivf_recall_curve_matches_python(spark):
    from pyspark.sql import functions as F

    from group_2_shopware_enterprise_data_engineering_project_spark.operators import (
        similarity,
    )

    vecs = _int_vectors(36, seed=23)
    emb = _emb_df(spark, vecs)
    n_cent, probes, k, n_q = 4, (1, 2), 3, 5
    got = {
        (r.n_probe, r.query_id): (r.n_hits, r.recall)
        for r in similarity.ivf_recall_curve(
            emb, F.col("vec_id") < n_q, probes=probes, k=k, n_centroids=n_cent
        ).collect()
    }
    # python reimplementation: centroids = first n_cent vectors by id
    cents = list(range(n_cent))
    assign = {}
    for i, v in enumerate(vecs):
        best = max(cents, key=lambda c: (_cos(v, vecs[c]), -c))
        assign[i] = best
    want = {}
    for q in range(n_q):
        probe_order = sorted(
            cents, key=lambda c: (-_cos(vecs[q], vecs[c]), c)
        )
        truth = set(_topk(vecs, q, k))
        for p in probes:
            probed = set(probe_order[:p])
            cand = [
                i for i in range(len(vecs))
                if i != q and assign[i] in probed
            ]
            cand.sort(key=lambda i: (-_cos(vecs[q], vecs[i]), i))
            hits = len(set(cand[:k]) & truth)
            want[(p, q)] = (hits, hits / k)
    assert got == want
    # the curve must be monotone in n_probe per query (nested candidates)
    for q in range(n_q):
        assert got[(2, q)][0] >= got[(1, q)][0]


def test_e24_prefix_recall_curve_matches_python(spark):
    from pyspark.sql import functions as F

    from group_2_shopware_enterprise_data_engineering_project_spark.operators import (
        similarity,
    )

    vecs = _int_vectors(30, seed=24)
    emb = _emb_df(spark, vecs)
    dims, k, n_q = (8, 16), 3, 4
    got = {
        (r.dim, r.query_id): (r.n_hits, r.recall)
        for r in similarity.prefix_recall_curve(
            emb, F.col("vec_id") < n_q, dims=dims, k=k
        ).collect()
    }
    want = {}
    for q in range(n_q):
        truth = set(_topk(vecs, q, k))  # full-dim truth
        for d in dims:
            hits = len(set(_topk(vecs, q, k, d)) & truth)
            want[(d, q)] = (hits, hits / k)
    assert got == want


# --- t34: length Gini ----------------------------------------------------------


def _gini_python(xs: list[int]) -> float:
    """Textbook rank-based Gini over a sorted copy — the direct
    definition, no frequency-block algebra."""
    xs = sorted(xs)
    n = len(xs)
    s0 = sum(xs)
    if n * s0 == 0:
        return 0.0
    s1 = sum((i + 1) * x for i, x in enumerate(xs))
    return (2 * s1 - (n + 1) * s0) / (n * s0)


def test_t34_length_gini_hand_solved(spark, tmp_path):
    from group_2_shopware_enterprise_data_engineering_project_spark.queries.text_pipeline import (
        t34_length_gini,
    )

    rows = []
    # A: lengths 1,2,3,4 -> G = (2*30 - 5*10)/(4*10) = 0.25
    for i, ln in enumerate((1, 2, 3, 4)):
        rows.append((10 + i, " ".join(["w"] * ln), "en", "A"))
    # B: equal lengths -> G = 0 (ties exercise the block algebra)
    rows.append((20, "w w w w w", "en", "B"))
    rows.append((21, "x x x x x", "en", "B"))
    # C: all-empty docs -> guarded 0/0 -> 0.0
    rows.append((30, "", "en", "C"))
    rows.append((31, "", "en", "C"))
    # D: single doc -> 0
    rows.append((40, "w w w w w w w", "en", "D"))
    sf = _write_documents(spark, str(tmp_path), rows)
    got = {r.source: r for r in t34_length_gini(spark, sf).collect()}
    assert got["A"].gini == 0.25
    assert (got["A"].n_docs, got["A"].total_tokens) == (4, 10)
    assert got["B"].gini == 0.0
    assert got["C"].gini == 0.0 and got["C"].total_tokens == 0
    assert got["D"].gini == 0.0


@_settings
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=12), min_size=1, max_size=12),
        min_size=1,
        max_size=4,
    )
)
def test_t34_length_gini_matches_brute_force(spark, lengths_per_source):
    from group_2_shopware_enterprise_data_engineering_project_spark.operators import (
        stats,
    )

    rows, want = [], {}
    did = 0
    for s, lens in enumerate(lengths_per_source):
        src = f"s{s}"
        want[src] = _gini_python(lens)
        for ln in lens:
            rows.append((did, " ".join(["w"] * ln), src))
            did += 1
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )
    got = {r.source: r.gini for r in stats.length_gini(docs).collect()}
    assert set(got) == set(want)
    for src in want:
        assert math.isclose(got[src], want[src], rel_tol=0, abs_tol=1e-12), (
            src, got[src], want[src],
        )


# --- a42 / k33: brute-force properties over random order histories ------------


def _write_orders(spark, path: str, rows: list[tuple]) -> str:
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).repartition(1).write.mode("overwrite").parquet(f"{path}/orders.parquet")
    return path


@_settings
@given(
    st.lists(
        st.lists(st.integers(min_value=0, max_value=200), min_size=1, max_size=10),
        min_size=1,
        max_size=4,
    )
)
def test_a42_reorder_latency_matches_brute_force(spark, tmp_path_factory, day_lists):
    """Brute force: sort each customer's (date, key) pairs, diff
    consecutive days, reduce by hand. Duplicate dates exercise the
    unique-key tiebreak; single-order customers must emit nothing."""
    import datetime as dt

    from group_2_shopware_enterprise_data_engineering_project_spark.queries.batch_analytics import (
        a42_reorder_latency,
    )

    base = dt.datetime(2024, 1, 1)
    rows, key = [], 0
    per_cust = {}
    for c, days in enumerate(day_lists):
        per_cust[c] = []
        for d in days:
            per_cust[c].append((base + dt.timedelta(days=d), key))
            rows.append(
                (key, c, "O", 1.0, base + dt.timedelta(days=d), "1-URGENT")
            )
            key += 1
    sf = _write_orders(spark, str(tmp_path_factory.mktemp("a42")), rows)
    got = {
        r.customer_id: (r.n_orders, r.n_gaps, r.min_gap_days, r.max_gap_days, r.avg_gap_days)
        for r in a42_reorder_latency(spark, sf).collect()
    }
    want = {}
    for c, pairs in per_cust.items():
        pairs.sort()
        gaps = [
            (b[0] - a[0]).days for a, b in zip(pairs, pairs[1:])
        ]
        if gaps:
            want[c] = (
                len(gaps) + 1,
                len(gaps),
                min(gaps),
                max(gaps),
                sum(gaps) / len(gaps),
            )
    assert got == want


@_settings
@given(
    st.sets(st.integers(min_value=0, max_value=120), min_size=1, max_size=25)
)
def test_k33_retention_matches_brute_force(spark, tmp_path_factory, day_set):
    """Brute force the retention policy over random version-date sets:
    newest 7 are recent; among the rest, keep exactly the max date of
    each ISO week; everything else expires. Weeks computed with
    Python's isocalendar — independent of either engine's
    date_trunc."""
    import datetime as dt

    from group_2_shopware_enterprise_data_engineering_project_spark.queries.warehouse_q import (
        k33_retention_plan,
    )

    base = dt.datetime(2024, 1, 1)
    dates = sorted(base + dt.timedelta(days=d) for d in day_set)
    rows = [
        (i, 1, "O", 1.0, ts, "1-URGENT") for i, ts in enumerate(dates)
    ]
    sf = _write_orders(spark, str(tmp_path_factory.mktemp("k33")), rows)
    got = {
        r.version_ts: (r.rn, r.keep_reason, r.keep_flag)
        for r in k33_retention_plan(spark, sf).collect()
    }
    desc = sorted(dates, reverse=True)
    recent = set(desc[:7])
    older = desc[7:]
    week_latest = {}
    for ts in older:
        wk = ts.isocalendar()[:2]
        if wk not in week_latest or ts > week_latest[wk]:
            week_latest[wk] = ts
    keep_weekly = set(week_latest.values())
    want = {}
    for i, ts in enumerate(desc):
        if ts in recent:
            want[ts] = (i + 1, "recent", 1)
        elif ts in keep_weekly:
            want[ts] = (i + 1, "weekly", 1)
        else:
            want[ts] = (i + 1, "expire", 0)
    assert got == want


# --- a41: ship priority boundary semantics ------------------------------------


def test_a41_ship_priority_cutoff_boundaries(spark, tmp_path):
    """The two classic off-by-ones by hand: an order dated EXACTLY at
    the cutoff is excluded (strict <), a lineitem shipped EXACTLY at
    the cutoff is excluded (strict >), wrong-segment customers drop,
    and revenue is the exact-cents sum over surviving lines only."""
    import datetime as dt
    import math as m

    from group_2_shopware_enterprise_data_engineering_project_spark.queries.batch_analytics import (
        _A41_DATE,
        _A41_SEG,
        a41_ship_priority,
    )

    cut = dt.datetime.fromisoformat(_A41_DATE)
    day = dt.timedelta(days=1)
    custs = [
        (1, "c1", 0, 0.0, _A41_SEG),
        (2, "c2", 0, 0.0, "MACHINERY"),  # wrong segment
    ]
    orders = [
        # (key, cust, status, total, date, prio)
        (10, 1, "O", 0.0, cut - day, "1-URGENT"),   # in
        (11, 1, "O", 0.0, cut, "2-HIGH"),           # AT cutoff: excluded
        (12, 2, "O", 0.0, cut - day, "3-MEDIUM"),   # wrong segment
    ]
    lines = [
        # (orderkey, partkey, suppkey, lineno, qty, extprice, disc, tax,
        #  rflag, lstatus, shipdate)
        (10, 1, 1, 1, 1.0, 100.00, 0.10, 0.0, "N", "O", cut + day),  # in
        (10, 1, 1, 2, 1.0, 50.00, 0.00, 0.0, "N", "O", cut),  # AT cutoff: out
        (10, 1, 1, 3, 1.0, 70.00, 0.50, 0.0, "N", "O", cut - day),  # shipped
        (11, 1, 1, 1, 1.0, 999.0, 0.00, 0.0, "N", "O", cut + day),
        (12, 1, 1, 1, 1.0, 999.0, 0.00, 0.0, "N", "O", cut + day),
    ]
    spark.createDataFrame(
        custs,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string",
    ).repartition(1).write.mode("overwrite").parquet(f"{tmp_path}/customer.parquet")
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).repartition(1).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    spark.createDataFrame(
        lines,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    ).repartition(1).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    got = a41_ship_priority(spark, str(tmp_path)).collect()
    assert len(got) == 1
    r = got[0]
    want_cents = m.floor(100.00 * 0.90 * 100.0 + 0.5)  # only the post-cutoff line
    assert (r.orderkey, r.orderpriority) == (10, "1-URGENT")
    assert r.revenue_cents == want_cents
    assert r.revenue == want_cents / 100.0


# --- a43: small-quantity revenue (Q17 shape) -----------------------------------


def test_a43_small_qty_revenue_hand_solved(spark, tmp_path):
    """The integer cross-multiplied average compare by hand: a line
    with 5*qty*n == sum_qty sits EXACTLY at 20% of the average and is
    excluded (strict <); only brand parts participate in the stats
    AND the revenue; revenue is exact cents over surviving lines."""
    from group_2_shopware_enterprise_data_engineering_project_spark.queries.batch_analytics import (
        _A43_BRAND,
        a43_small_qty_revenue,
    )

    parts = [(1, _A43_BRAND), (2, "Brand#99")]
    spark.createDataFrame(
        parts, "p_partkey long, p_brand string"
    ).repartition(1).write.mode("overwrite").parquet(f"{tmp_path}/part.parquet")
    import datetime as dt

    d = dt.datetime(2024, 1, 1)
    # part 1: quantities 1, 4, 10, 25 -> n=4, sum=40, avg=10.
    # 5*qty*n < 40 <=> qty < 2 <=> only qty=1 survives.
    # qty=2 would give 5*2*4=40 == sum_qty: test the boundary too.
    lines = [
        (100, 1, 1, 1, 1.0, 100.00, 0.0, 0.0, "N", "O", d),   # in (qty 1)
        (100, 1, 1, 2, 4.0, 999.0, 0.0, 0.0, "N", "O", d),
        (101, 1, 1, 1, 10.0, 999.0, 0.0, 0.0, "N", "O", d),
        (101, 1, 1, 2, 25.0, 999.0, 0.0, 0.0, "N", "O", d),
        (102, 2, 1, 1, 1.0, 555.0, 0.0, 0.0, "N", "O", d),    # wrong brand
    ]
    spark.createDataFrame(
        lines,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    ).repartition(1).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    r = a43_small_qty_revenue(spark, str(tmp_path)).collect()[0]
    assert r.n_lineitems == 1
    assert r.total_revenue == 100.0
    assert abs(r.avg_yearly - 100.0 / 7.0) < 1e-12

    # boundary: adding a qty-2 line changes n and sum (n=5, sum=42):
    # 5*2*5 = 50 >= 42 -> still excluded; qty-1 line: 5*1*5=25 < 42 in.
    lines.append((103, 1, 1, 1, 2.0, 777.0, 0.0, 0.0, "N", "O", d))
    spark.createDataFrame(
        lines,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    ).repartition(1).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    r2 = a43_small_qty_revenue(spark, str(tmp_path)).collect()[0]
    assert r2.n_lineitems == 1 and r2.total_revenue == 100.0


# --- a44: semi-join existence semantics ----------------------------------------


def test_a44_semijoin_counts_once_and_boundary(spark, tmp_path):
    """Existence, not multiplication: an order with THREE late lines
    counts once without any distinct; a line shipped EXACTLY at
    orderdate + 60 days is not late (strict >); an order with only
    on-time lines is absent."""
    import datetime as dt

    from group_2_shopware_enterprise_data_engineering_project_spark.queries.batch_analytics import (
        _A44_LATE_DAYS,
        a44_late_ship_semijoin,
    )

    d0 = dt.datetime(2024, 1, 1)
    late = d0 + dt.timedelta(days=_A44_LATE_DAYS, seconds=1)
    at_cut = d0 + dt.timedelta(days=_A44_LATE_DAYS)
    orders = [
        (10, 1, "O", 0.0, d0, "1-URGENT"),   # three late lines -> once
        (11, 1, "O", 0.0, d0, "1-URGENT"),   # only at-cutoff line -> out
        (12, 1, "O", 0.0, d0, "2-HIGH"),     # one late line -> once
        (13, 1, "O", 0.0, d0, "3-MEDIUM"),   # on-time only -> out
    ]
    lines = [
        (10, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", late),
        (10, 1, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", late),
        (10, 1, 1, 3, 1.0, 1.0, 0.0, 0.0, "N", "O", late),
        (11, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", at_cut),
        (12, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", late),
        (13, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d0),
    ]
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).repartition(1).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    spark.createDataFrame(
        lines,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    ).repartition(1).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")
    q = a44_late_ship_semijoin(spark, str(tmp_path))
    got = {r.o_orderpriority: r.n_late_orders for r in q.collect()}
    assert got == {"1-URGENT": 1, "2-HIGH": 1}
    # plan is a semi join, not inner+distinct
    assert "LeftSemi" in q._jdf.queryExecution().optimizedPlan().toString()


@settings(max_examples=hyp_examples(4, 8), deadline=None)  # parquet round-trip per example
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=4),    # partkey
            st.integers(min_value=1, max_value=12),   # quantity
            st.integers(min_value=1, max_value=500),  # price dollars
        ),
        min_size=1,
        max_size=16,
    )
)
def test_a43_matches_brute_force(spark, tmp_path_factory, lines):
    """Property vs a literal Python Q17: per-part average from raw
    floats, keep rows with qty < 0.2*avg, sum prices — built WITHOUT
    the cross-multiply trick, so a wrong inequality rewrite (>= vs <,
    n vs n+1, sum vs avg) diverges. All parts are the filtered brand
    so the whole fixture participates."""
    import collections

    from group_2_shopware_enterprise_data_engineering_project_spark.queries.batch_analytics import (
        _A43_BRAND,
        a43_small_qty_revenue,
    )

    tmp_path = tmp_path_factory.mktemp("a43")
    import datetime as dt

    d = dt.datetime(2024, 1, 1)
    parts = [(pk, _A43_BRAND) for pk in {pk for pk, _, _ in lines}]
    spark.createDataFrame(
        parts, "p_partkey long, p_brand string"
    ).repartition(1).write.mode("overwrite").parquet(f"{tmp_path}/part.parquet")
    rows = [
        (i, pk, 1, 1, float(q), float(p), 0.0, 0.0, "N", "O", d)
        for i, (pk, q, p) in enumerate(lines)
    ]
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    ).repartition(1).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")

    per_part = collections.defaultdict(list)
    for pk, q, p in lines:
        per_part[pk].append((q, p))
    want_n, want_cents = 0, 0
    for pk, qs in per_part.items():
        avg = sum(q for q, _ in qs) / len(qs)
        for q, p in qs:
            if q < 0.2 * avg:
                want_n += 1
                want_cents += p * 100
    r = a43_small_qty_revenue(spark, str(tmp_path)).collect()[0]
    assert r.n_lineitems == want_n
    if want_n:
        assert r.total_revenue == want_cents / 100.0
    else:
        assert r.total_revenue is None  # SUM over empty -> NULL, both engines


@settings(max_examples=hyp_examples(4, 8), deadline=None)  # parquet round-trip per example
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=5),    # custkey -> orderkey base
            st.integers(min_value=-3, max_value=120),  # ship offset days
        ),
        min_size=1,
        max_size=14,
    )
)
def test_a44_matches_brute_force(spark, tmp_path_factory, lines):
    """Property vs a literal Python EXISTS: an order counts once iff
    ANY of its lines ships strictly more than the cutoff days after
    the order date — a wrong join type (inner without distinct) or a
    >= boundary diverges."""
    import datetime as dt

    from group_2_shopware_enterprise_data_engineering_project_spark.queries.batch_analytics import (
        _A44_LATE_DAYS,
        a44_late_ship_semijoin,
    )

    tmp_path = tmp_path_factory.mktemp("a44")
    d0 = dt.datetime(2024, 1, 1)
    okeys = sorted({ok for ok, _ in lines})
    orders = [(ok, 1, "O", 0.0, d0, f"P{ok % 3}") for ok in okeys]
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).repartition(1).write.mode("overwrite").parquet(f"{tmp_path}/orders.parquet")
    li = [
        (ok, 1, 1, i, 1.0, 1.0, 0.0, 0.0, "N", "O",
         d0 + dt.timedelta(days=off))
        for i, (ok, off) in enumerate(lines)
    ]
    spark.createDataFrame(
        li,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int,"
        " l_quantity double, l_extendedprice double, l_discount double,"
        " l_tax double, l_returnflag string, l_linestatus string,"
        " l_shipdate timestamp",
    ).repartition(1).write.mode("overwrite").parquet(f"{tmp_path}/lineitem.parquet")

    late_orders = {ok for ok, off in lines if off > _A44_LATE_DAYS}
    want = {}
    for ok in okeys:
        if ok in late_orders:
            prio = f"P{ok % 3}"
            want[prio] = want.get(prio, 0) + 1
    got = {
        r.o_orderpriority: r.n_late_orders
        for r in a44_late_ship_semijoin(spark, str(tmp_path)).collect()
    }
    assert got == want


@settings(max_examples=hyp_examples(6, 15), deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10**12),  # doc_id (sparse ok)
            st.sampled_from(["a", "b", None]),           # source
        ),
        min_size=1,
        max_size=20,
        unique_by=lambda t: t[0],
    ),
    st.integers(min_value=1, max_value=6),  # cap
)
def test_m64_matches_brute_force(spark, ids_sources, cap):
    """Property vs plain-Python modular arithmetic over arbitrary
    (sparse) ids and a varying cap — catches a wrong modulus, a
    truncating threshold rewrite, or a null-source drop."""
    from group_2_shopware_enterprise_data_engineering_project_spark.operators import (
        prep,
    )

    M = (1 << 31) - 1
    A = 2654435761 % M
    docs = spark.createDataFrame(ids_sources, "doc_id long, source string")
    got = {
        r.doc_id: r.keep_flag
        for r in prep.deterministic_downsample(
            docs, cap_per_source=cap
        ).collect()
    }
    from collections import Counter

    n_per = Counter(s for _, s in ids_sources)
    assert set(got) == {i for i, _ in ids_sources}  # total
    for i, s in ids_sources:
        t = (M * cap) // n_per[s]
        assert got[i] == int(((i % M) * A) % M < t)
