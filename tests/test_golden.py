"""Golden-file verification for the approximate (non-SQL-expressible) ops.

The driver's DuckDB oracle cannot express MinHash/SimHash/LSH-ANN (nor
IVF-ANN's kmeans or Taily's Gamma quantile), so these pipelines are
pinned against seed-fixed golden Parquet generated at sf0.01
and reviewed by hand (the minhash golden was cross-checked to equal the
EXACT n-gram-Jaccard pair set, and simhash overlaps 23/25 of it — see
tests/golden/).  Any change to the hash functions, seeds, banding, or
thresholds must consciously regenerate these files.
"""

import os

import numpy as np
import pandas as pd
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
SF_DIR = "/root/testdata/sf0.01"


def _docs():
    import ray.data

    return ray.data.read_parquet(os.path.join(SF_DIR, "documents.parquet"),
                                 columns=["doc_id", "text"])


def _minhash_xx(_sf):
    # the DEFAULT xxhash mode with the pinned round-2 parameters (the
    # catalog entry moved to the md5 oracle-compat mode, which the driver
    # now SQL-checks; the hot-path mode stays golden-pinned here)
    from pisa_ray.ops.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(_docs(), num_perm=64, bands=16,
                             verify_threshold=0.2)


def _simhash_xx(_sf):
    from pisa_ray.ops.dedup import simhash_pairs

    return simhash_pairs(_docs(), max_hamming=6)


def _embeddings():
    import ray.data

    return ray.data.read_parquet(
        os.path.join(SF_DIR, "embeddings.parquet"),
        columns=["vec_id", "embedding"])


def _lsh_ann_approx(_sf):
    # the APPROXIMATE configuration (n_planes=12, Hamming-1 probes) — the
    # catalog entry moved to the provably-exact n_planes=1 config, which
    # the driver now SQL-checks; the scale-path config stays golden-pinned
    from pisa_ray.catalog import TOPK, _query_vectors
    from pisa_ray.ops.similarity import lsh_ann_topk

    qm, qids = _query_vectors(SF_DIR)
    return lsh_ann_topk(_embeddings(), qm, qids, k=TOPK)


def _ivf_ann_approx(_sf):
    # the APPROXIMATE configuration (nprobe=4 of 16 cells) — same story
    from pisa_ray.catalog import TOPK, _query_vectors
    from pisa_ray.ops.similarity import ivf_ann_topk

    qm, qids = _query_vectors(SF_DIR)
    return ivf_ann_topk(_embeddings(), qm, qids, k=TOPK, n_centroids=16,
                        nprobe=4)


_GOLDEN_FNS = {"minhash_lsh_pairs": _minhash_xx,
               "simhash_pairs": _simhash_xx,
               "lsh_ann_topk": _lsh_ann_approx,
               "ivf_ann_topk": _ivf_ann_approx}


@pytest.mark.parametrize("name", [
    "minhash_lsh_pairs", "simhash_pairs", "lsh_ann_topk",
    "ivf_ann_topk", "taily_thresholds"])
def test_golden(name, ray_session):
    from pisa_ray.catalog import QUERIES

    golden = pd.read_parquet(
        os.path.join(GOLDEN_DIR, f"{name}_sf001.parquet"))
    fn = _GOLDEN_FNS.get(name, QUERIES.get(name))
    res = fn(SF_DIR)
    df = res.to_pandas() if hasattr(res, "to_pandas") else res
    df = df.sort_values(list(golden.columns)).reset_index(drop=True)
    assert list(df.columns) == list(golden.columns)
    assert len(df) == len(golden)
    for c in golden.columns:
        if golden[c].dtype == object:
            assert (df[c].values == golden[c].values).all(), c
        else:
            assert np.allclose(df[c].values.astype(float),
                               golden[c].values.astype(float)), c
