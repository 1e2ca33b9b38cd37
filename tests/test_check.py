"""Index self-check (the ``compress --check`` capability): a freshly
built index passes; tampered lexicon stats and tampered fwd content are
both detected."""

import glob
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.oracle import make_corpus


@pytest.fixture(scope="module")
def built_index(ray_session, tmp_path_factory):
    import ray.data

    from pisa_ray.index.build import IndexConfig, build_index

    texts = make_corpus(50)
    out = str(tmp_path_factory.mktemp("check"))
    corpus = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    }))
    build_index(corpus, out, config=IndexConfig(num_shards=2, block_size=16))
    return out


def test_check_clean_index_ok(built_index):
    from pisa_ray.index.check import check_index

    s = check_index(built_index)
    assert s["ok"], s["errors"]
    assert s["checked_against_fwd"]
    assert s["postings"] == s["fwd_postings"] > 0
    assert s["terms"] > 0


def test_check_detects_lexicon_tamper(built_index, tmp_path):
    from pisa_ray.index.check import check_index

    bad = str(tmp_path / "tampered_lex")
    shutil.copytree(built_index, bad)
    lf = glob.glob(os.path.join(bad, "lexicon", "*.parquet"))[0]
    t = pq.read_table(lf)
    df = t.column("df").to_numpy().copy()
    df[0] += 1
    pq.write_table(t.set_column(t.schema.get_field_index("df"), "df",
                                pa.array(df, type=pa.int64())), lf)
    s = check_index(bad, against_fwd=False)
    assert not s["ok"]
    assert any("lexicon df" in e for e in s["errors"])


def test_check_detects_fwd_content_mismatch(built_index, tmp_path):
    """Flip one tf in the fwd checkpoint — df/occ partials shift AND the
    content hash differs: the decode-vs-input compare catches it."""
    from pisa_ray.index.check import check_index

    bad = str(tmp_path / "tampered_fwd")
    shutil.copytree(built_index, bad)
    ff = sorted(glob.glob(os.path.join(bad, "fwd", "*.parquet")))[0]
    t = pq.read_table(ff)
    tf = t.column("tf").to_numpy().copy()
    tf[0] += 1
    pq.write_table(t.set_column(t.schema.get_field_index("tf"), "tf",
                                pa.array(tf, type=pa.uint32())), ff)
    s = check_index(bad)
    assert not s["ok"]
    assert any("vs fwd" in e for e in s["errors"])


def test_check_quantized_index_ok(ray_session, tmp_path_factory):
    """Quantized builds store impact scores as freqs; the check must
    compare docid structure only (tf-derived checks skipped) and pass."""
    import ray.data

    from pisa_ray.index.build import IndexConfig, build_index
    from pisa_ray.index.check import check_index

    texts = make_corpus(30)
    out = str(tmp_path_factory.mktemp("check_q"))
    corpus = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    }))
    build_index(corpus, out, config=IndexConfig(
        num_shards=2, block_size=16, quantize_bits=8))
    s = check_index(out)
    assert s["ok"], s["errors"]
    assert s["checked_against_fwd"]
