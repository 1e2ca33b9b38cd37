"""Distributed docid assignment: tokens ⋈ docmap hash join (the >50M-doc
path) must produce an index identical to the broadcast path."""

import numpy as np
import pyarrow as pa


def _corpus(n=80):
    rng = np.random.default_rng(5)
    urls, texts = [], []
    for d in range(n):
        urls.append(f"http://site{rng.integers(0, 30):02d}.test/p{d:03d}")
        ts = [f"w{rng.integers(0, 40):02d}" for _ in range(12)]
        texts.append(" ".join(ts))
    return urls, texts


def test_docid_join_matches_broadcast(ray_session, tmp_path, monkeypatch):
    import ray.data

    import pisa_ray.index.build as B
    from pisa_ray.index.reader import InvertedIndex

    urls, texts = _corpus()
    tbl = pa.table({"url": pa.array(urls, type=pa.string()),
                    "text": pa.array(texts, type=pa.string())})

    out_a = str(tmp_path / "broadcast")
    B.build_index(ray.data.from_arrow(tbl), out_a,
                  config=B.IndexConfig(num_shards=2),
                  id_col=None, url_col="url")

    # force the distributed docmap + hash-join path
    monkeypatch.setattr(B, "DOCID_BROADCAST_MAX", 10)
    out_b = str(tmp_path / "join")
    B.build_index(ray.data.from_arrow(tbl), out_b,
                  config=B.IndexConfig(num_shards=2),
                  id_col=None, url_col="url")

    a, b = InvertedIndex(out_a), InvertedIndex(out_b)
    assert a.num_terms == b.num_terms
    assert [t.as_py() for t in a.terms] == [t.as_py() for t in b.terms]
    assert a.stats.num_docs == b.stats.num_docs
    assert (np.asarray(a.doc_lens) == np.asarray(b.doc_lens)).all()
    for tid in range(a.num_terms):
        da, fa = a.posting_list(tid).decode()
        db, fb = b.posting_list(tid).decode()
        assert list(da) == list(db), tid
        assert list(fa) == list(fb), tid
