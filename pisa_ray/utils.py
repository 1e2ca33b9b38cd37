"""Ray Data utilities that the Dataset API cannot express directly.

``sorted_with_rank`` assigns a dense global rank (0..n-1) to a sorted
Dataset — the distributed analogue of the reference's single-threaded
"term id = line number in the sorted lexicon" / "docid = arrival order"
assignments (``/root/reference/src/forward_index_builder.cpp:166-175,
220-243``).  It sorts, reads per-block row counts from the executed plan's
metadata, and adds ``offset + arange(len(block))`` per block via raw Ray
tasks — the one place raw tasks are justified (a global prefix-sum over
block sizes has no Dataset-API expression).  The dataset is materialized in
the object store; use it only for the *small* tables (lexicon, doc map),
never the postings stream.
"""

from __future__ import annotations

from typing import List, Union

import numpy as np
import pyarrow as pa
import ray
import ray.data


@ray.remote
def _add_rank_block(block: pa.Table, offset: int, col: str, dtype) -> pa.Table:
    ranks = pa.array(np.arange(offset, offset + block.num_rows), type=dtype)
    return block.append_column(col, ranks)


def sorted_with_rank(
    ds: "ray.data.Dataset",
    sort_key: Union[str, List[str]],
    rank_col: str,
    dtype: pa.DataType = pa.uint32(),
) -> "ray.data.Dataset":
    """Sort ``ds`` by ``sort_key`` and append ``rank_col`` = global row rank."""
    ds = ds.sort(sort_key)
    block_refs: List = []
    counts: List[int] = []
    for bundle in ds.iter_internal_ref_bundles():
        for block_ref, meta in bundle.blocks:
            block_refs.append(block_ref)
            counts.append(meta.num_rows)
    offsets = np.zeros(len(counts), dtype=np.int64)
    if counts:
        offsets[1:] = np.cumsum(counts[:-1])
    new_refs = [
        _add_rank_block.remote(ref, int(off), rank_col, dtype)
        for ref, off in zip(block_refs, offsets)
    ]
    if not new_refs:
        schema = ds.schema()
        empty = pa.table(
            {f.name: pa.array([], type=f.type) for f in schema.base_schema}
            | {rank_col: pa.array([], type=dtype)}
        )
        return ray.data.from_arrow(empty)
    return ray.data.from_arrow_refs(new_refs)


_MAP_POPULATE = 0x8000  # linux mmap flag

_malloc_tuned = False


def in_ray_worker() -> bool:
    """True iff this process is a Ray WORKER (task/actor), not the driver.

    Used to keep worker-only side effects (malloc tuning) off the driver:
    every tools.py estimator constructs a ``QueryEngine`` on the driver,
    and tuning there re-introduces the retained-RSS cost the refactor
    moved off import specifically to spare drivers and tests."""
    try:
        import ray

        if not ray.is_initialized():
            return False
        return ray.get_runtime_context().worker.mode == ray.WORKER_MODE
    except Exception:
        return False


def ensure_malloc_tuned() -> None:
    """Keep large numpy buffers on the reused heap instead of mmap —
    called from hot-path WORKER setup (analyzer cache, ``alloc_array``),
    NOT at import time, so the driver, tests and library consumers don't
    inherit up to ~256 MiB of retained RSS per arena as a side effect.

    The exchange/encode hot paths allocate tens-of-MB numpy arrays per
    task.  glibc serves those via mmap (they exceed even the 32 MiB
    dynamic-threshold cap), so every free munmaps and the NEXT task
    re-faults its whole working set — and on the shared-host microVMs
    this code targets, first-touch fault handling is the contended
    resource under many-core concurrency (measured: allocation-heavy
    stages inflate 4-17x at 32-way).  Raising M_MMAP_THRESHOLD and
    disabling trim makes a long-lived Ray worker reuse its arena across
    tasks: pages fault once per worker, not once per task.  Idempotent;
    opt out with PISA_RAY_NO_MALLOC_TUNE=1."""
    global _malloc_tuned
    if _malloc_tuned:
        return
    _malloc_tuned = True
    import os

    if os.environ.get("PISA_RAY_NO_MALLOC_TUNE"):
        return
    try:
        import ctypes
        libc = ctypes.CDLL(None, use_errno=True)
        M_TRIM_THRESHOLD, M_MMAP_THRESHOLD = -1, -3
        libc.mallopt(M_MMAP_THRESHOLD, 1 << 28)   # 256 MiB
        libc.mallopt(M_TRIM_THRESHOLD, 1 << 28)
    except (OSError, AttributeError):  # non-glibc platform
        pass


def alloc_array(n: int, dtype, populate_min_bytes: int = 1 << 22) -> np.ndarray:
    """Allocate a length-``n`` array with pages PRE-POPULATED in one
    mmap(MAP_POPULATE) syscall instead of ~n·itemsize/4096 individual
    first-touch faults.

    On the shared-host microVMs this engine targets, per-fault overhead
    is catastrophic under concurrency: 8 processes each touching a fresh
    400 MB np.empty take 31 s apiece, the same buffers via MAP_POPULATE
    take 0.27 s (116x; measured 2026-08-17).  Every multi-MB scratch or
    output buffer in a hot task should come from here.  Small requests
    (< ``populate_min_bytes``) and non-Linux platforms fall back to
    ``np.empty`` (glibc reuse — see :func:`ensure_malloc_tuned` — makes
    small churn cheap).  Contents are uninitialized from the caller's
    perspective (kernel-zeroed)."""
    ensure_malloc_tuned()
    dtype = np.dtype(dtype)
    nbytes = int(n) * dtype.itemsize
    if nbytes < populate_min_bytes:
        return np.empty(n, dtype=dtype)
    try:
        import mmap
        mm = mmap.mmap(-1, nbytes,
                       flags=(mmap.MAP_PRIVATE | mmap.MAP_ANONYMOUS
                              | _MAP_POPULATE))
    except (ValueError, OSError, AttributeError):
        return np.empty(n, dtype=dtype)
    return np.frombuffer(mm, dtype=dtype, count=n)


def round_half_away(arr, ndigits: int):
    """Round half away from zero — matches SQL ROUND (numpy's np.round is
    banker's rounding and disagrees on exact .5 cases like 105/128)."""
    s = 10.0 ** ndigits
    a = np.asarray(arr, dtype=np.float64)
    return np.sign(a) * np.floor(np.abs(a) * s + 0.5) / s


def hash_sample_mask(ids, rate: float, *, mult: int = 2654435761):
    """Deterministic Knuth-multiplicative sampling predicate over an id
    column: ``(id · mult) mod 2³² < rate · 2³²``.  The ONE definition
    shared by sample_inverted_index, the kth-threshold sampling family,
    the simulator and IVF training — their SQL oracles hard-code the
    same arithmetic, so any change here must update those strings too."""
    import numpy as np

    thresh = np.uint64(int(rate * 4294967296.0))
    u = np.asarray(ids).astype(np.uint64)
    return (u * np.uint64(mult)) % np.uint64(4294967296) < thresh
