"""Property tests for the salted-exchange partitioning invariants.

The partition-exchange reader merges a term's per-partition segments by
``first_doc`` (pisa_ray/index/exchange.py module docstring), which is only
correct if ``_partition_ids`` guarantees, for EVERY (P, skew) layout:

1. range:        every partition id lies in [0, P)
2. bucket unity: all postings of one term land in ONE term bucket's salt
                 range [db_off[tb], db_off[tb] + db_arr[tb])
3. monotonicity: within a term, the salt is monotone non-decreasing in
                 docid — so one partition holds one CONTIGUOUS docid range
                 per term, and ranges across partitions are disjoint and
                 ordered by salt
4. determinism:  same inputs → same partition ids

Pure-numpy function; no Ray session needed.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from pisa_ray.index.exchange import _partition_ids, plan_buckets


@st.composite
def _layouts(draw):
    num_terms = draw(st.integers(min_value=1, max_value=50_000))
    num_docs = draw(st.integers(min_value=1, max_value=1_000_000))
    term_buckets = draw(st.integers(min_value=1, max_value=32))
    # skew-proportional salting: salt counts per bucket can be wildly
    # uneven (a stopword bucket gets many, a rare bucket gets 1)
    db_arr = np.asarray(draw(st.lists(
        st.integers(min_value=1, max_value=64),
        min_size=term_buckets, max_size=term_buckets)), dtype=np.uint64)
    n = draw(st.integers(min_value=1, max_value=2_000))
    seed = draw(st.integers(min_value=0, max_value=2**32 - 1))
    rng = np.random.default_rng(seed)
    # skewed postings: a few hot terms/docs dominate (zipf-ish via square)
    t_u = rng.random(n)
    term_ids = np.minimum((t_u * t_u * num_terms).astype(np.uint64),
                          num_terms - 1)
    d_u = rng.random(n)
    doc_ids = np.minimum((d_u * d_u * num_docs).astype(np.uint64),
                         num_docs - 1)
    return (term_ids, doc_ids, num_terms, num_docs, term_buckets, db_arr)


@given(_layouts())
@settings(max_examples=150, deadline=None)
def test_partition_id_invariants(layout):
    term_ids, doc_ids, num_terms, num_docs, term_buckets, db_arr = layout
    db_off = np.concatenate(([0], np.cumsum(db_arr)[:-1])).astype(np.uint64)
    P = int(db_arr.sum())

    parts = _partition_ids(term_ids, doc_ids, num_terms, num_docs,
                           term_buckets, db_arr, db_off)

    # 1. range
    assert parts.min() >= 0 and parts.max() < P

    # 4. determinism
    again = _partition_ids(term_ids, doc_ids, num_terms, num_docs,
                           term_buckets, db_arr, db_off)
    assert np.array_equal(parts, again)

    off = db_off.astype(np.int64)
    cnt = db_arr.astype(np.int64)
    order = np.lexsort((doc_ids, term_ids))
    t_s, d_s, p_s = term_ids[order], doc_ids[order], parts[order]
    new_term = np.ones(len(t_s), dtype=bool)
    new_term[1:] = t_s[1:] != t_s[:-1]
    # 2. bucket unity: within a term run, every partition falls in one
    # bucket's salt range (the same bucket for the whole run)
    bucket = np.searchsorted(off, p_s, side="right") - 1
    run_id = np.cumsum(new_term) - 1
    first_bucket = bucket[new_term][run_id]
    assert np.array_equal(bucket, first_bucket)
    assert (p_s >= off[bucket]).all()
    assert (p_s < off[bucket] + cnt[bucket]).all()

    # 3. monotonicity: within a term (docid-sorted), partition id never
    # decreases — contiguous disjoint docid ranges ordered by salt
    same_term = ~new_term[1:]
    assert (p_s[1:][same_term] >= p_s[:-1][same_term]).all()


@given(st.lists(st.integers(min_value=0, max_value=10**12),
                min_size=1, max_size=32),
       st.integers(min_value=1, max_value=10**7))
@settings(max_examples=100, deadline=None)
def test_plan_buckets_positive_and_proportional(bucket_occ, target):
    """Every bucket gets >= 1 salt; counts track posting mass at the
    configured target rows-per-partition."""

    class _Cfg:
        exchange_rows_per_part = target

    db = plan_buckets(_Cfg(), num_terms=1000,
                      bucket_occ=np.asarray(bucket_occ, dtype=np.int64))
    assert len(db) == len(bucket_occ)
    assert all(x >= 1 for x in db)
    for occ, d in zip(bucket_occ, db):
        assert d == max(1, int(round(occ / target)))
