"""Distributed term-id assignment: tokens ⋈ lexicon hash join (the
vocab-beyond-worker-memory path, TERM_BROADCAST_MAX) must produce an
index identical to the broadcast `map_term_ids` path — both over the
fused in-memory token blocks and over the distributed fwd checkpoint."""

import numpy as np
import pyarrow as pa


def _corpus(n=90):
    rng = np.random.default_rng(11)
    ids, texts = [], []
    for d in range(n):
        ids.append(d)
        ts = [f"tok{rng.integers(0, 55):02d}" for _ in range(14)]
        texts.append(" ".join(ts))
    return ids, texts


def _assert_index_equal(out_a, out_b):
    from pisa_ray.index.reader import InvertedIndex

    a, b = InvertedIndex(out_a), InvertedIndex(out_b)
    assert a.num_terms == b.num_terms
    assert [t.as_py() for t in a.terms] == [t.as_py() for t in b.terms]
    assert a.stats.num_docs == b.stats.num_docs
    assert a.stats.collection_len == b.stats.collection_len
    assert (np.asarray(a.doc_lens) == np.asarray(b.doc_lens)).all()
    assert (a.df_arr == b.df_arr).all()
    assert (a.occ_arr == b.occ_arr).all()
    for tid in range(a.num_terms):
        da, fa = a.posting_list(tid).decode()
        db, fb = b.posting_list(tid).decode()
        assert list(da) == list(db), tid
        assert list(fa) == list(fb), tid


def test_term_join_matches_broadcast(ray_session, tmp_path, monkeypatch):
    import ray.data

    import pisa_ray.index.build as B

    ids, texts = _corpus()
    tbl = pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                    "text": pa.array(texts, type=pa.string())})

    out_a = str(tmp_path / "broadcast")
    B.build_index(ray.data.from_arrow(tbl), out_a,
                  config=B.IndexConfig(num_shards=2))

    # force the hash-join term remap over the fused in-memory token blocks
    monkeypatch.setattr(B, "TERM_BROADCAST_MAX", 0)
    out_b = str(tmp_path / "join_fused")
    B.build_index(ray.data.from_arrow(tbl), out_b,
                  config=B.IndexConfig(num_shards=2))
    _assert_index_equal(out_a, out_b)

    # distributed stage path: sharded lexicon (sorted_with_rank, no driver
    # drain) + join over the fwd parquet checkpoint
    out_c = str(tmp_path / "join_dist")
    B.build_index(ray.data.from_arrow(tbl), out_c,
                  config=B.IndexConfig(num_shards=2,
                                       small_tables_on_driver=False))
    _assert_index_equal(out_a, out_c)


def test_distributed_lexicon_is_sharded_and_ranked(ray_session, tmp_path):
    """The distributed-branch lexicon must not depend on a driver-side
    drain: term_id must equal the global sorted-term rank regardless of
    output sharding."""
    import glob

    import pyarrow.parquet as pq
    import ray.data

    import pisa_ray.index.build as B

    ids, texts = _corpus(60)
    tbl = pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                    "text": pa.array(texts, type=pa.string())})
    out = str(tmp_path / "dist")
    B.build_index(ray.data.from_arrow(tbl), out,
                  config=B.IndexConfig(num_shards=2,
                                       small_tables_on_driver=False))
    files = sorted(glob.glob(out + "/lexicon/*.parquet"))
    lex = pa.concat_tables([pq.read_table(f) for f in files]) \
        .sort_by("term_id")
    terms = lex["term"].to_pylist()
    assert terms == sorted(terms)
    assert lex["term_id"].to_pylist() == list(range(len(terms)))
