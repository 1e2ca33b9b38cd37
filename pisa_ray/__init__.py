"""pisa_ray — a Ray-Data-native full-text index build + BM25 query engine.

A brand-new engine with the capabilities of PISA (reference: bmmliu/pisa):
streaming ingestion of Common-Crawl-style web pages from Parquet, HTML text
extraction, tokenization, term-ID assignment, a groupby-term shuffle building
sorted-docid posting lists with delta-gap block compression and per-block
max-score (WAND) metadata, sharded index layout with lineage manifests, and
BM25 top-k retrieval with dynamic pruning (WAND / Block-Max WAND / MaxScore).

Everything is expressed Ray-Data-first: ``ray.data.Dataset`` pipelines over
zero-copy Arrow batches, actor pools for stateful stages, and explicit
groupby/sort shuffles for the wide steps.
"""

import os as _os

# Cap polars' internal thread pool before any worker imports it: every
# map_batches task runs under num_cpus=1, and an uncapped Rust pool per
# task oversubscribes the node.  Export POLARS_MAX_THREADS yourself to
# override (read once at polars import).
_os.environ.setdefault("POLARS_MAX_THREADS", "1")


def _tune_malloc() -> None:
    """Keep large numpy buffers on the reused heap instead of mmap.

    The exchange/encode hot paths allocate tens-of-MB numpy arrays per
    task.  glibc serves those via mmap (they exceed even the 32 MiB
    dynamic-threshold cap), so every free munmaps and the NEXT task
    re-faults its whole working set — and on the shared-host microVMs
    this code targets, first-touch fault handling is the contended
    resource under many-core concurrency (measured: allocation-heavy
    stages inflate 4-17x at 32-way).  Raising M_MMAP_THRESHOLD and
    disabling trim makes a long-lived Ray worker reuse its arena across
    tasks: pages fault once per worker, not once per task.  Cost: up to
    ~threshold of retained RSS per worker, fine on the target boxes.
    Opt out with PISA_RAY_NO_MALLOC_TUNE=1."""
    if _os.environ.get("PISA_RAY_NO_MALLOC_TUNE"):
        return
    try:
        import ctypes
        libc = ctypes.CDLL(None, use_errno=True)
        M_TRIM_THRESHOLD, M_MMAP_THRESHOLD = -1, -3
        libc.mallopt(M_MMAP_THRESHOLD, 1 << 28)   # 256 MiB
        libc.mallopt(M_TRIM_THRESHOLD, 1 << 28)
    except (OSError, AttributeError):  # non-glibc platform
        pass


_tune_malloc()


__version__ = "0.1.0"
