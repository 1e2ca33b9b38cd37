"""Document-identifier reordering (pre-index docid assignment policies).

The reference reorders docids of an existing index (random / by-feature /
explicit mapping / recursive graph bisection,
``/root/reference/include/pisa/reorder_docids.hpp:225-290``).  In a
rebuild-from-Parquet engine the same capability is a docid *assignment
policy* applied before ``build_index``: each function returns the corpus
with a ``doc_id`` column to pass as ``id_col="doc_id"``.

* ``assign_random``   — seeded permutation (create_random_mapping,
  ``src/sharding.cpp:105-134`` semantics: deterministic shuffle).
* ``assign_by_feature`` — docid = global rank of a sort key (url → the
  reference's by-URL reordering; any column works).
* ``assign_mapping``  — explicit old→new docid mapping (broadcast dict).

Recursive graph bisection (BP, SIGKDD'16) is intentionally out of scope
for v1 — it needs an iterative distributed bisection driver; the hook is
the same ``assign_mapping`` interface fed by an external BP run.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import pyarrow as pa

from pisa_ray.utils import sorted_with_rank


def assign_random(ds, *, id_col: str = "doc_id", seed: int = 42,
                  num_docs: Optional[int] = None):
    """Seeded random permutation of dense docids.  The permutation is
    broadcast (num_docs × 8B); at 10^12 docs use a seeded hash-rank sort
    (``assign_by_feature`` on a hash column) instead."""
    import ray

    n = num_docs if num_docs is not None else ds.count()
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n).astype(np.uint64)
    perm_ref = ray.put(perm)

    def remap(batch: pa.Table) -> pa.Table:
        p = _cached(perm_ref)
        old = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        batch = batch.drop_columns([id_col])
        return batch.append_column(id_col, pa.array(p[old], type=pa.uint64()))

    return ds.map_batches(remap, batch_format="pyarrow")


def assign_by_feature(ds, feature_col: str, *, id_col: str = "doc_id"):
    """docid = global rank of ``feature_col`` (sorted ascending) — the
    by-URL reordering of the reference, as a sort + rank."""
    if id_col in ds.schema().names:
        ds = ds.drop_columns([id_col])
    return sorted_with_rank(ds, feature_col, id_col, pa.uint64())


def assign_mapping(ds, mapping: Dict[int, int], *, id_col: str = "doc_id"):
    """Explicit docid mapping (reorder_docids.hpp:268-290 capability)."""
    import ray

    map_ref = ray.put(dict(mapping))

    def remap(batch: pa.Table) -> pa.Table:
        m = _cached(map_ref)
        old = batch[id_col].to_pylist()
        batch = batch.drop_columns([id_col])
        return batch.append_column(
            id_col, pa.array([m[o] for o in old], type=pa.uint64()))

    return ds.map_batches(remap, batch_format="pyarrow")


_CACHE: Dict = {}


def _cached(ref):
    import ray

    val = _CACHE.get(ref)
    if val is None:
        val = ray.get(ref)
        _CACHE[ref] = val
    return val
