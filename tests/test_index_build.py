import json
import os

import numpy as np
import pyarrow as pa
import pytest

from tests.oracle import OracleIndex, make_corpus


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    import ray.data

    from pisa_ray.index.build import IndexConfig, build_index

    texts = make_corpus()
    out_dir = str(tmp_path_factory.mktemp("idx"))
    corpus = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    }))
    cfg = IndexConfig(num_shards=4)
    info = build_index(corpus, out_dir, config=cfg, analyzer_batch_size=16)
    oracle = OracleIndex(texts)
    return texts, out_dir, info, oracle


def test_stats(built):
    _, _, info, oracle = built
    s = info["stats"]
    assert s.num_docs == oracle.num_docs
    assert s.collection_len == oracle.collection_len
    assert abs(s.avg_len - oracle.avg_len) < 1e-9
    assert info["num_terms"] == len(oracle.lexicon)


def test_lexicon_matches_oracle(built):
    _, out_dir, _, oracle = built
    from pisa_ray.index.reader import InvertedIndex

    idx = InvertedIndex(out_dir)
    assert idx.terms.to_pylist() == oracle.lexicon
    for t, tid in oracle.term_to_id.items():
        assert idx.term_df(tid) == oracle.df[tid]
        assert idx.term_occ(tid) == oracle.occ[tid]


def test_postings_match_oracle(built):
    _, out_dir, _, oracle = built
    from pisa_ray.index.reader import InvertedIndex

    idx = InvertedIndex(out_dir)
    for tid, plist in oracle.postings.items():
        pl = idx.posting_list(tid)
        assert pl is not None, f"term {tid} missing"
        docs, freqs = pl.decode()
        assert list(docs) == [d for d, _ in plist], f"docs差 term {tid}"
        assert list(freqs) == [tf for _, tf in plist]
        assert pl.df == len(plist)


def test_doc_lens(built):
    _, out_dir, _, oracle = built
    from pisa_ray.index.reader import InvertedIndex

    idx = InvertedIndex(out_dir)
    for d, ln in oracle.doc_lens.items():
        assert idx.doc_lens[d] == ln


def test_wand_metadata(built):
    """Per-term max_score equals the max float32 BM25 weight over postings."""
    _, out_dir, _, oracle = built
    from pisa_ray.index.reader import InvertedIndex

    idx = InvertedIndex(out_dir)
    for tid, plist in oracle.postings.items():
        want = max(float(oracle.bm25_weight(tf, d, oracle.df[tid]))
                   for d, tf in plist)
        pl = idx.posting_list(tid)
        assert pl.max_score == pytest.approx(want, rel=1e-6)


def test_sharded_layout_and_manifests(built):
    _, out_dir, _, _ = built
    shard_dirs = [d for d in os.listdir(os.path.join(out_dir, "index"))
                  if d.startswith("shard=")]
    assert len(shard_dirs) > 1
    for stage in ("fwd", "lexicon", "sizes", "index"):
        mpath = os.path.join(out_dir, stage, "_MANIFEST.json")
        assert os.path.exists(mpath)
        assert json.load(open(mpath))["complete"]


def test_resume_skips_completed_stages(built, ray_session):
    import ray.data

    from pisa_ray.index.build import IndexConfig, build_index

    texts, out_dir, _, _ = built
    mtimes = {}
    for stage in ("fwd", "lexicon", "sizes", "index"):
        mtimes[stage] = os.path.getmtime(
            os.path.join(out_dir, stage, "_MANIFEST.json"))
    corpus = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    }))
    build_index(corpus, out_dir, config=IndexConfig(num_shards=4), resume=True)
    for stage, old in mtimes.items():
        assert os.path.getmtime(
            os.path.join(out_dir, stage, "_MANIFEST.json")) == old, stage


def test_url_docid_assignment(ray_session, tmp_path):
    """docid = global sorted-url rank (by-URL reordering for free)."""
    import ray.data

    from pisa_ray.index.build import IndexConfig, build_index
    from pisa_ray.index.reader import InvertedIndex

    urls = [f"https://site{i % 3}.example/p/{i:04d}" for i in (5, 2, 9, 0, 7)]
    texts = [f"alpha beta w{i}" for i in (5, 2, 9, 0, 7)]
    corpus = ray.data.from_arrow(pa.table({"url": urls, "text": texts}))
    out = str(tmp_path / "urlidx")
    build_index(corpus, out, config=IndexConfig(num_shards=1),
                id_col=None, url_col="url")
    idx = InvertedIndex(out)
    # every doc contains "alpha": its posting list enumerates docids 0..4
    tid = idx.term_id("alpha")
    docs, _ = idx.posting_list(tid).decode()
    assert list(docs) == [0, 1, 2, 3, 4]
    # w0 belongs to the lexicographically-smallest url → doc_id 0
    tid0 = idx.term_id("w0")
    docs0, _ = idx.posting_list(tid0).decode()
    assert list(docs0) == [0]


def test_partition_exchange_matches_sort(built, ray_session, tmp_path):
    """The salted partition exchange produces an index identical (decoded)
    to the Dataset.sort path, including hot-term segment merging."""
    import ray.data

    from pisa_ray.index.build import IndexConfig, build_index
    from pisa_ray.index.reader import InvertedIndex

    texts, _, _, oracle = built
    corpus = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    }))
    out = str(tmp_path / "pex")
    # tiny rows-per-partition target forces multiple doc-range salts even
    # at test scale (the plan is data-proportional: P tracks volume)
    build_index(corpus, out,
                config=IndexConfig(num_shards=3, exchange="partition",
                                   block_size=16, exchange_rows_per_part=50))
    idx = InvertedIndex(out)
    for tid, plist in oracle.postings.items():
        pl = idx.posting_list(tid)
        docs, freqs = pl.decode()
        assert list(docs) == [d for d, _ in plist], f"term {tid}"
        assert list(freqs) == [tf for _, tf in plist]
    # hot term got salted into multiple segments
    hot = oracle.term_to_id["thehot"]
    assert len(idx.posting_list(hot).segments) > 1

    # per-partition resume: second run skips every partition
    import json

    from pisa_ray.index.build import build_index as bi
    import shutil

    shutil.rmtree(os.path.join(out, "index"), ignore_errors=False) \
        if False else None
    info2 = bi(corpus, out,
               config=IndexConfig(num_shards=3, exchange="partition",
                                  block_size=16, exchange_rows_per_part=50),
               resume=True)
    assert info2["num_terms"] == len(oracle.lexicon)


def test_partition_exchange_queries(built, ray_session, tmp_path):
    import ray.data

    from pisa_ray.index.build import IndexConfig, build_index
    from pisa_ray.query.engine import QueryEngine

    texts, _, _, oracle = built
    corpus = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    }))
    out = str(tmp_path / "pexq")
    build_index(corpus, out,
                config=IndexConfig(num_shards=2, exchange="partition"))
    eng = QueryEngine(out)
    for text in ["thehot term003 term010", "term000 term004 term009"]:
        got = eng.run(text, k=10, algorithm="block_max_wand")
        want = oracle.topk(text, k=10)
        assert [d for _, d in got] == [d for _, d in want]
