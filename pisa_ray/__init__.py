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


# malloc arena tuning (M_MMAP_THRESHOLD / M_TRIM_THRESHOLD) is NOT an
# import side effect: it retains up to ~256 MiB RSS per arena, which the
# driver, tests and library consumers shouldn't pay.  Hot-path worker
# setup calls pisa_ray.utils.ensure_malloc_tuned() instead (analyzer
# cache, alloc_array).

__version__ = "0.1.0"
