"""Golden-file verification for the approximate (non-SQL-expressible) ops.

The driver's DuckDB oracle cannot express MinHash/SimHash/LSH-ANN, so these
pipelines are pinned against seed-fixed golden Parquet generated at sf0.01
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


@pytest.mark.parametrize("name", [
    "minhash_lsh_pairs", "simhash_pairs", "lsh_ann_topk"])
def test_golden(name, ray_session):
    from pisa_ray.catalog import QUERIES

    golden = pd.read_parquet(
        os.path.join(GOLDEN_DIR, f"{name}_sf001.parquet"))
    res = QUERIES[name](SF_DIR)
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
