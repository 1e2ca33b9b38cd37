"""Taily threshold estimation: incomplete-gamma math against closed
forms, the cutoff formula against its exponential special case, and the
end-to-end tool on a built index (the taily_thresholds.cpp capability —
no SQL oracle possible, the Gamma quantile is not DuckDB-expressible)."""

import math

import numpy as np
import pyarrow as pa
import pytest

from pisa_ray.gammainc import gammainc_p, gamma_ppf
from tests.oracle import OracleIndex, make_corpus


# -- incomplete gamma vs closed forms ---------------------------------------

@pytest.mark.parametrize("x", [0.01, 0.3, 1.0, 2.5, 7.0, 30.0])
def test_gammainc_shape1_is_exponential_cdf(x):
    assert gammainc_p(1.0, x) == pytest.approx(1.0 - math.exp(-x), abs=1e-13)


@pytest.mark.parametrize("x", [0.05, 0.5, 1.7, 4.0, 12.0])
def test_gammainc_half_is_erf(x):
    # P(1/2, x) = erf(sqrt(x))
    assert gammainc_p(0.5, x) == pytest.approx(
        math.erf(math.sqrt(x)), abs=1e-13)


@pytest.mark.parametrize("x", [0.2, 1.0, 3.0, 8.0, 25.0])
def test_gammainc_shape3_poisson_sum(x):
    # integer shape a: Q(a, x) = e^-x Σ_{j<a} x^j/j!
    q = math.exp(-x) * (1.0 + x + x * x / 2.0)
    assert gammainc_p(3.0, x) == pytest.approx(1.0 - q, abs=1e-13)


def test_gammainc_bounds_and_monotonicity():
    assert gammainc_p(2.3, 0.0) == 0.0
    xs = np.linspace(0.01, 60.0, 200)
    ps = [gammainc_p(2.3, float(x)) for x in xs]
    assert all(b >= a for a, b in zip(ps, ps[1:]))
    assert ps[-1] > 1.0 - 1e-12


@pytest.mark.parametrize("shape,scale,q", [
    (1.0, 2.0, 0.5), (0.7, 1.3, 0.9), (5.0, 0.25, 0.99),
    (25.0, 3.0, 0.1), (0.5, 1.0, 0.999),
])
def test_gamma_ppf_roundtrip(shape, scale, q):
    x = gamma_ppf(shape, scale, q)
    assert gammainc_p(shape, x / scale) == pytest.approx(q, abs=1e-11)


def test_gamma_ppf_edges():
    assert gamma_ppf(3.0, 2.0, 0.0) == 0.0
    assert gamma_ppf(3.0, 2.0, 1.0) == math.inf


# -- cutoff formula ----------------------------------------------------------

def test_cutoff_exponential_special_case():
    """shape 1 (V = E²) is an exponential tail with a closed-form
    quantile: cutoff = −θ·ln(k/all)."""
    from pisa_ray.tools import taily_estimate_cutoff

    e, n, df, k = 2.0, 10_000, 600.0, 10
    cutoff, any_, all_ = taily_estimate_cutoff(
        np.array([e]), np.array([e * e]), np.array([df]), n, k)
    assert any_ == pytest.approx(600.0)
    assert all_ == pytest.approx(600.0)  # single term: all = any = df
    assert cutoff == pytest.approx(-e * math.log(k / 600.0), rel=1e-9)


def test_cutoff_any_all_two_terms():
    from pisa_ray.tools import taily_estimate_cutoff

    n = 1000
    f = np.array([100.0, 200.0])
    _, any_, all_ = taily_estimate_cutoff(
        np.array([1.0, 1.0]), np.array([0.5, 0.5]), f, n, 10)
    want_any = n * (1 - (1 - 0.1) * (1 - 0.2))
    assert any_ == pytest.approx(want_any)
    assert all_ == pytest.approx(want_any * (100 / want_any) * (200 / want_any))


def test_cutoff_degenerate_and_small_result_sets():
    from pisa_ray.tools import taily_estimate_cutoff

    # expected results below k → no safe cutoff
    c, _, all_ = taily_estimate_cutoff(
        np.array([3.0]), np.array([1.0]), np.array([5.0]), 1000, 10)
    assert all_ == pytest.approx(5.0) and c == 0.0
    # zero variance → cutoff collapses to E (Gamma variance→0 limit)
    c, _, _ = taily_estimate_cutoff(
        np.array([3.0]), np.array([0.0]), np.array([500.0]), 1000, 10)
    assert c == 3.0
    # empty query
    assert taily_estimate_cutoff(
        np.array([]), np.array([]), np.array([]), 1000, 10) == (0.0, 0.0, 0.0)


def test_cutoff_monotone_in_k():
    from pisa_ray.tools import taily_estimate_cutoff

    e, v = np.array([2.0, 1.5]), np.array([1.0, 2.0])
    f = np.array([400.0, 300.0])
    cuts = [taily_estimate_cutoff(e, v, f, 1000, k)[0] for k in (5, 10, 20)]
    assert cuts[0] > cuts[1] > cuts[2] > 0.0


# -- end-to-end on a built index ---------------------------------------------

@pytest.fixture(scope="module")
def taily_env(ray_session, tmp_path_factory):
    import ray.data

    from pisa_ray.index.build import IndexConfig, build_index
    from pisa_ray.query.engine import QueryEngine

    texts = make_corpus(60)
    out = str(tmp_path_factory.mktemp("taily"))
    corpus = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    }))
    build_index(corpus, out, config=IndexConfig(num_shards=2, block_size=16))
    return QueryEngine(out), OracleIndex(texts), out


def test_taily_feature_stats_match_postings(taily_env):
    """The distributed stats pass reproduces per-term df and BM25 score
    moments computed directly from the oracle's postings."""
    from pisa_ray.tools import taily_feature_stats

    eng, oracle, out = taily_env
    stats = taily_feature_stats(out)
    for term in ("thehot", "term007", "term059"):
        tid_eng = eng.index.term_ids([term])[0]
        tid_or = oracle.term_to_id[term]
        ws = np.array([oracle.bm25_weight(tf, d, oracle.df[tid_or])
                       for d, tf in oracle.postings[tid_or]])
        row = stats.loc[tid_eng]
        assert int(row["df"]) == oracle.df[tid_or]
        # index path scores in float32 (parity with the engine); the
        # direct oracle is float64 — compare at float32 precision
        assert row["exp"] == pytest.approx(ws.mean(), rel=1e-6)
        assert row["var"] == pytest.approx(ws.var(), rel=1e-4, abs=1e-9)


def test_taily_thresholds_tool(taily_env):
    from pisa_ray.tools import taily_feature_stats, taily_thresholds

    eng, oracle, out = taily_env
    stats = taily_feature_stats(out)
    qs = [("Q1", "thehot"), ("Q2", "thehot term007"), ("Q3", "zzznope")]
    df = taily_thresholds(eng, qs, k=5, stats=stats)
    assert list(df["qid"]) == ["Q1", "Q2", "Q3"]
    assert (df["threshold"] >= 0).all()
    # unknown term → empty query → zero estimate
    assert df.loc[2, "threshold"] == 0.0 and df.loc[2, "all_est"] == 0.0
    # single-term query: any = all = df(term); cutoff below the max score
    tid = eng.index.term_ids(["thehot"])[0]
    assert df.loc[0, "any_est"] == pytest.approx(float(eng.index.term_df(tid)))
    # deterministic
    df2 = taily_thresholds(eng, qs, k=5, stats=stats)
    assert df.equals(df2)


# -- property tests (hypothesis) ---------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(a=st.floats(0.05, 80.0), x=st.floats(0.0, 200.0))
def test_gammainc_in_unit_interval_and_complement(a, x):
    p = gammainc_p(a, x)
    assert 0.0 <= p <= 1.0
    # recurrence P(a, x) = P(a+1, x) + x^a e^-x / Γ(a+1)  (A&S 6.5.21)
    import math

    lterm = a * math.log(x) - x - math.lgamma(a + 1.0) if x > 0 else None
    if lterm is not None and lterm > -700:
        assert p == pytest.approx(gammainc_p(a + 1.0, x) + math.exp(lterm),
                                  abs=1e-10)


@settings(max_examples=25, deadline=None)
@given(shape=st.floats(0.1, 50.0), scale=st.floats(0.01, 100.0),
       q=st.floats(0.001, 0.999))
def test_gamma_ppf_inverts_cdf(shape, scale, q):
    x = gamma_ppf(shape, scale, q)
    assert gammainc_p(shape, x / scale) == pytest.approx(q, abs=1e-9)
