import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pisa_ray.codecs import get_codec
from pisa_ray.index.postings import encode_segment, SegmentView


BLOCK_CODECS = ["bitpack", "varbyte", "streamvbyte", "simple8b", "optpfor",
                "maskedvbyte", "varintgb", "qmx"]
MONO_CODECS = ["ef", "pefuniform", "pefopt", "interpolative"]


@pytest.mark.parametrize("codec", BLOCK_CODECS)
def test_roundtrip_simple(codec):
    enc, dec = get_codec(codec)
    top = 2**32 - 1 if codec != "simple8b" else 2**31 - 1
    for arr in ([0], [1, 2, 3], [0, 0, 0], [top], list(range(200))):
        a = np.array(arr, dtype=np.uint32)
        assert list(dec(enc(a), len(a))) == arr


@pytest.mark.parametrize("codec", BLOCK_CODECS)
@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**31 - 1),
                min_size=1, max_size=256))
def test_roundtrip_property(codec, values):
    enc, dec = get_codec(codec)
    a = np.array(values, dtype=np.uint32)
    out = dec(enc(a), len(a))
    assert out.dtype == np.uint32
    assert list(out) == values


@pytest.mark.parametrize("codec", MONO_CODECS)
@settings(max_examples=40, deadline=None)
@given(values=st.sets(st.integers(min_value=0, max_value=10**9), min_size=1,
                      max_size=400))
def test_monotone_roundtrip_property(codec, values):
    enc, dec = get_codec(codec)
    vals = np.array(sorted(values), dtype=np.uint64)
    out = dec(enc(vals), len(vals))
    assert list(out) == list(vals)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**28 - 1),
                min_size=1, max_size=256))
def test_simple16_roundtrip(values):
    enc, dec = get_codec("simple16")
    a = np.array(values, dtype=np.uint32)
    out = dec(enc(a), len(a))
    assert out.dtype == np.uint32
    assert list(out) == values


def test_simple16_rejects_wide():
    enc, _ = get_codec("simple16")
    with pytest.raises(ValueError):
        enc(np.array([1 << 28], dtype=np.uint32))


def test_empty():
    for codec in BLOCK_CODECS + MONO_CODECS + ["simple16"]:
        enc, dec = get_codec(codec)
        assert enc(np.empty(0, dtype=np.uint32)) == b""
        assert len(dec(b"", 0)) == 0


@pytest.mark.parametrize("codec", ["streamvbyte", "simple8b", "optpfor",
                                   "pefuniform", "pefopt",
                                   "interpolative", "maskedvbyte",
                                   "varintgb", "simple16", "qmx"])
@settings(max_examples=20, deadline=None)
@given(docset=st.sets(st.integers(min_value=0, max_value=10**6), min_size=1,
                      max_size=500),
       tf_base=st.integers(min_value=1, max_value=7))
def test_segment_roundtrip_new_codecs(codec, docset, tf_base):
    docs = np.array(sorted(docset), dtype=np.uint64)
    tfs = (np.arange(len(docs)) % tf_base + 1).astype(np.uint32)
    row = encode_segment(docs, tfs, None, block_size=128, codec=codec)
    view = SegmentView(row, codec=codec)
    assert list(view.decode_docs()) == list(docs)
    assert list(view.decode_freqs()) == list(tfs)


@settings(max_examples=30, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=10**6), min_size=1,
               max_size=1000), st.integers(min_value=1, max_value=5))
def test_segment_roundtrip(docset, tf_base):
    docs = np.array(sorted(docset), dtype=np.uint64)
    tfs = (np.arange(len(docs)) % tf_base + 1).astype(np.uint32)
    scores = np.log1p(tfs.astype(np.float32))
    row = encode_segment(docs, tfs, scores, block_size=128)
    view = SegmentView(row)
    assert list(view.decode_docs()) == list(docs)
    assert list(view.decode_freqs()) == list(tfs)
    # block metadata
    assert view.num_blocks == (len(docs) + 127) // 128
    assert view.block_last_docs[-1] == docs[-1]
    assert np.isclose(view.max_score, scores.max())
    # per-block maxes cover block slices
    for b in range(view.num_blocks):
        lo, hi = b * 128, min((b + 1) * 128, len(docs))
        assert np.isclose(view.block_max_scores[b], scores[lo:hi].max())
        assert view.block_last_docs[b] == docs[hi - 1]


def test_segment_block_random_access():
    docs = np.arange(0, 1000, 3, dtype=np.uint64) + 7
    tfs = np.ones(len(docs), dtype=np.uint32)
    view = SegmentView(encode_segment(docs, tfs, None, block_size=64),
                       block_size=64)
    # decode a middle block directly without touching earlier blocks
    b = 3
    lo = b * 64
    assert list(view.decode_block_docs(b)) == list(docs[lo:lo + 64])
    assert list(view.decode_block_freqs(b)) == [1] * 64


def test_segment_rejects_empty():
    with pytest.raises(ValueError):
        encode_segment(np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.uint32))


@settings(max_examples=40, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=10**9), min_size=1,
               max_size=500))
def test_ef_roundtrip(values):
    from pisa_ray.codecs.ef import ef_encode, ef_decode

    vals = np.array(sorted(values), dtype=np.uint64)
    assert list(ef_decode(ef_encode(vals), len(vals))) == list(vals)


def test_ef_nondecreasing_with_dups():
    from pisa_ray.codecs.ef import ef_encode, ef_decode

    vals = np.array([0, 0, 1, 5, 5, 5, 100], dtype=np.uint64)
    assert list(ef_decode(ef_encode(vals), len(vals))) == list(vals)


@settings(max_examples=25, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=10**6), min_size=1,
               max_size=600), st.integers(min_value=1, max_value=7))
def test_segment_roundtrip_ef(docset, tf_base):
    docs = np.array(sorted(docset), dtype=np.uint64)
    tfs = (np.arange(len(docs)) % tf_base + 1).astype(np.uint32)
    row = encode_segment(docs, tfs, None, block_size=128, codec="ef")
    view = SegmentView(row, codec="ef")
    assert list(view.decode_docs()) == list(docs)
    assert list(view.decode_freqs()) == list(tfs)


def test_ef_index_build_end_to_end(ray_session, tmp_path):
    import ray.data
    import pyarrow as pa

    from pisa_ray.index.build import IndexConfig, build_index
    from pisa_ray.index.reader import InvertedIndex
    from tests.oracle import OracleIndex, make_corpus

    texts = make_corpus(40)
    corpus = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    }))
    out = str(tmp_path / "efidx")
    build_index(corpus, out, config=IndexConfig(codec="ef", num_shards=2,
                                                block_size=16))
    idx = InvertedIndex(out)
    oracle = OracleIndex(texts)
    for tid, plist in oracle.postings.items():
        docs, freqs = idx.posting_list(tid).decode()
        assert list(docs) == [d for d, _ in plist]
        assert list(freqs) == [tf for _, tf in plist]


@settings(max_examples=25, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=5000), min_size=5,
               max_size=400),
       st.lists(st.integers(min_value=0, max_value=5000), min_size=8,
                max_size=8))
def test_cursor_next_geq_property(docset, targets):
    """Cursor skip behavior matches brute force on random lists."""
    from pisa_ray.index.reader import PostingList
    from pisa_ray.query.cursors import Cursor

    docs = np.array(sorted(docset), dtype=np.uint64)
    tfs = (np.arange(len(docs)) % 3 + 1).astype(np.uint32)
    seg = SegmentView(encode_segment(docs, tfs, np.ones(len(docs),
                                                        dtype=np.float32),
                                     block_size=16), block_size=16)
    pl = PostingList(0, [seg])
    cur = Cursor(pl, lambda f, d: f.astype(np.float64), 10**9)
    arr = docs.astype(np.int64)
    for t in sorted(targets):
        cur.next_geq(t)
        i = np.searchsorted(arr, t)
        want = int(arr[i]) if i < len(arr) else 10**9
        assert cur.docid() == want, (t, cur.docid(), want)


@settings(max_examples=20, deadline=None)
@given(st.sets(st.integers(min_value=0, max_value=3000), min_size=3,
               max_size=300), st.floats(min_value=0.05, max_value=2.0))
def test_wand_partition_variable_properties(docset, lam):
    """Variable partition: covers the list, maxes are exact per block."""
    from pisa_ray.index.postings import wand_partition_variable

    docs = np.array(sorted(docset), dtype=np.uint64)
    rng = np.random.default_rng(len(docs))
    scores = rng.random(len(docs)).astype(np.float32)
    last, maxes = wand_partition_variable(docs, scores, lam)
    assert last[-1] == docs[-1]
    assert np.all(np.diff(last.astype(np.int64)) > 0)
    lo = 0
    for ld, mx in zip(last, maxes):
        hi = np.searchsorted(docs, ld, side="right")
        assert mx == pytest.approx(float(scores[lo:hi].max()), rel=1e-6)
        lo = hi
    assert lo == len(docs)
