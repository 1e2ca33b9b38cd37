"""Partitioned inversion exchange: explicit salted shuffle with raw Ray.

The Dataset-native inversion (`build_index` with ``exchange="sort"``) uses
``Dataset.sort`` — correct and idiomatic, but its sample/split machinery
costs a flat ~6 s per job on one box and its range partitioning is opaque.
This module is the documented escape hatch (SURVEY §2/§4 "salted keys"):

* **map** — one task per fwd file: term→id remap, then scatter rows to
  ``P = term_buckets × doc_buckets`` partitions keyed by
  ``(term-range bucket, doc-range salt)``.  The doc-range salt splits a
  stopword-grade term into contiguous, disjoint docid ranges — each
  partition's segments stay mergeable and no hot key lands on one reducer.
* **reduce** — one task per partition: concat map outputs, sort by the
  packed ``(term_id << bits) | doc_id`` key, encode posting-list segments
  (reusing ``encode_segments_batch``), and write one Parquet file directly
  into its term-range shard directory + a per-partition manifest.

Per-partition manifests make the index stage resumable at *partition*
granularity: a rerun skips partitions whose manifest exists (the
reference's re-runnable staged batches, ``tools/parse_collection.cpp:45-52``,
at shuffle-partition grain).

Partitioning assumption (documented per SURVEY §2 custom-operator rule):
within one partition a term's postings form one contiguous docid range;
across partitions a term's ranges are disjoint, ordered by the salt — the
reader merges segments by ``first_doc``.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray


def _partition_ids(term_ids: np.ndarray, doc_ids: np.ndarray,
                   num_terms: int, num_docs: int, term_buckets: int,
                   db_arr: np.ndarray, db_off: np.ndarray) -> np.ndarray:
    """Partition id per posting.  ``db_arr[b]`` = number of doc-range salts
    for term bucket ``b``, sized ∝ the bucket's posting mass so a
    stopword-heavy bucket splits into more partitions (skew-proportional
    salting, SURVEY §4); ``db_off`` is its exclusive prefix sum.

    Bucket/salt boundaries use float64 multiply instead of u64 integer
    division (≈5× faster, and division was a hot kernel).  A float
    boundary can differ from the integer formula by one docid — harmless:
    the invariants only need determinism (this is the ONLY place partition
    ids are computed), per-term bucket constancy, and salt monotone in
    docid, all of which hold; salts are clipped into [0, db)."""
    tb = np.minimum(
        (term_ids.astype(np.float64)
         * (term_buckets / max(1, num_terms))).astype(np.int64),
        term_buckets - 1)
    db = db_arr.astype(np.int64)[tb]
    salt = (doc_ids.astype(np.float64)
            * (db.astype(np.float64) / max(1, num_docs))).astype(np.int64)
    np.minimum(salt, db - 1, out=salt)
    return (db_off.astype(np.int64)[tb] + salt).astype(np.int32)


@ray.remote
def _exchange_map(files: List, terms_ref_box, doc_id_bits: int,
                  num_terms: int, num_docs: int,
                  term_buckets: int, db_arr: np.ndarray,
                  db_off: np.ndarray) -> List[pa.Table]:
    """Read fwd blocks → remap term ids → scatter to P partition tables.

    ``files`` is either parquet paths (resume from the fwd checkpoint) or
    boxed ObjectRefs of token tables (zero-copy plasma reads when the
    analyze stage just ran in this process)."""
    P = int(db_off[-1] + db_arr[-1])
    import time as _t
    _t0 = _t.time()
    _marks = {}
    if files and isinstance(files[0], str):
        tables = [pq.read_table(f) for f in files]
    else:
        tables = list(ray.get(list(files)))
    _marks["fetch"] = _t.time() - _t0
    # refs are boxed in a list so Ray doesn't auto-deref them per task;
    # fetched once per worker via the plasma cache
    from pisa_ray.index.build import term_ids_from_column

    terms = ray.get(terms_ref_box[0])

    # Two-pass per-block counting scatter.  Each input block (~75k rows)
    # is processed in cache-resident pieces: pass 1 computes its partition
    # ids and per-partition counts; pass 2 sorts WITHIN the block (tiny)
    # and copies each partition run sequentially into the preallocated
    # output arrays.  This replaces one task-wide argsort + three fancy
    # gathers over ~110 MB arrays — random-access traffic that collapsed
    # under full-node memory/page-fault contention — with small sequential
    # copies.  NEVER return pyarrow Table.slice() views here: pickling a
    # sliced Table serializes the FULL parent buffers (P × table size).
    per_block = []
    counts = np.zeros(P, dtype=np.int64)
    n_total = 0
    for t in tables:
        for b in t.to_batches():
            n = b.num_rows
            if n == 0:
                continue
            tbl1 = pa.Table.from_batches([b])
            tid = term_ids_from_column(tbl1["term"], terms)
            did = tbl1["doc_id"].to_numpy(zero_copy_only=False).astype(
                np.uint64, copy=False)
            tid <<= np.uint64(doc_id_bits)
            key = tid
            key |= did
            parts = _partition_ids(
                (key >> np.uint64(doc_id_bits)), did, num_terms, num_docs,
                term_buckets, db_arr, db_off)
            counts += np.bincount(parts, minlength=P)
            tf = tbl1["tf"].to_numpy(zero_copy_only=False)
            dl = tbl1["doc_len"].to_numpy(zero_copy_only=False)
            per_block.append((key, parts, tf, dl))
            n_total += n
    _marks["scan"] = _t.time() - _t0

    from pisa_ray.utils import alloc_array

    offsets = np.zeros(P + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    # MAP_POPULATE buffers: one populate syscall instead of ~100k
    # first-touch faults per task — the faults, not the copies, were the
    # scatter wall under concurrency (54 s/task measured at 16-way)
    key_out = alloc_array(n_total, np.uint64)
    tf_out = alloc_array(n_total, np.uint32)
    dl_out = alloc_array(n_total, np.uint32)
    cursor = offsets[:-1].copy()
    for key, parts, tf, dl in per_block:
        order = np.argsort(parts, kind="stable")
        sp = parts[order]
        run_starts = np.concatenate(
            ([0], np.flatnonzero(np.diff(sp)) + 1, [len(sp)]))
        kk, tt, dd = key[order], tf[order], dl[order]
        for ri in range(len(run_starts) - 1):
            lo, hi = int(run_starts[ri]), int(run_starts[ri + 1])
            p = int(sp[lo])
            c = cursor[p]
            key_out[c:c + hi - lo] = kk[lo:hi]
            tf_out[c:c + hi - lo] = tt[lo:hi]
            dl_out[c:c + hi - lo] = dd[lo:hi]
            cursor[p] = c + hi - lo
    _marks["scatter"] = _t.time() - _t0
    if os.environ.get("PISA_RAY_TRACE"):
        print(f"[maptask] rows={n_total} "
              + " ".join(f"{k}={v:.2f}" for k, v in _marks.items()),
              flush=True)
    return [pa.table({
        "sort_key": pa.array(key_out[int(offsets[p]):int(offsets[p + 1])],
                             type=pa.uint64()),
        "tf": pa.array(tf_out[int(offsets[p]):int(offsets[p + 1])],
                       type=pa.uint32()),
        "doc_len": pa.array(dl_out[int(offsets[p]):int(offsets[p + 1])],
                            type=pa.uint32()),
    }) for p in range(P)]


@ray.remote
def _exchange_reduce(part_idx: int, shard: int, out_dir: str, stats,
                     term_stats_ref_box, config, cfg_hash: str,
                     num_parts: int, *tables) -> Dict:
    """Concat one partition, sort by packed key, encode, write its file."""
    from pisa_ray.index.build import encode_segments_batch

    live = [t for t in tables if t.num_rows]
    if not live:
        _write_part_manifest(out_dir, part_idx, cfg_hash=cfg_hash,
                             num_parts=num_parts, rows=0, segments=0)
        return {"part": part_idx, "rows": 0, "segments": 0}
    from pisa_ray.utils import alloc_array

    # numpy-side concat + sort + gather through MAP_POPULATE buffers
    # (arrow concat_tables/take allocate fresh faulting memory per call —
    # the reduce leg scaled 1.7x for exactly that reason)
    n = sum(t.num_rows for t in live)

    def _gather(col: str, dt) -> np.ndarray:
        buf = alloc_array(n, dt)
        pos = 0
        for t in live:
            for c in t[col].chunks:
                a = c.to_numpy(zero_copy_only=False)
                buf[pos:pos + len(a)] = a
                pos += len(a)
        return buf

    keys = _gather("sort_key", np.uint64)
    tfs = _gather("tf", np.uint32)
    dls = _gather("doc_len", np.uint32)
    order = np.argsort(keys, kind="stable")
    key_s = alloc_array(n, np.uint64)
    tf_s = alloc_array(n, np.uint32)
    dl_s = alloc_array(n, np.uint32)
    np.take(keys, order, out=key_s)
    np.take(tfs, order, out=tf_s)
    np.take(dls, order, out=dl_s)
    tbl = pa.table({"sort_key": pa.array(key_s, type=pa.uint64()),
                    "tf": pa.array(tf_s, type=pa.uint32()),
                    "doc_len": pa.array(dl_s, type=pa.uint32())})
    encoded = encode_segments_batch(
        tbl, stats=stats, term_stats_ref=term_stats_ref_box[0],
        config=config)
    shard_dir = os.path.join(out_dir, "index", f"shard={shard}")
    os.makedirs(shard_dir, exist_ok=True)
    encoded = encoded.drop_columns(["shard"])
    pq.write_table(encoded, os.path.join(shard_dir,
                                         f"part-{part_idx:05d}.parquet"))
    _write_part_manifest(out_dir, part_idx, cfg_hash=cfg_hash,
                         num_parts=num_parts, rows=tbl.num_rows,
                         segments=encoded.num_rows)
    return {"part": part_idx, "rows": tbl.num_rows,
            "segments": encoded.num_rows}


def _parts_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "index", "_parts")


def _write_part_manifest(out_dir: str, part_idx: int, *, cfg_hash: str,
                         num_parts: int, **info) -> None:
    os.makedirs(_parts_dir(out_dir), exist_ok=True)
    p = os.path.join(_parts_dir(out_dir), f"part-{part_idx:05d}.json")
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"complete": True, "config_hash": cfg_hash,
                   "num_parts": num_parts, **info}, f)
    os.replace(tmp, p)


def part_complete(out_dir: str, part_idx: int, cfg_hash: str,
                  num_parts: int) -> bool:
    """A partition counts as done only if its manifest matches THIS build's
    config hash and partition count — a rerun after a config change (codec
    swap) or on a cluster with different CPU count must not splice stale
    payloads or misaligned partition indices into the index."""
    p = os.path.join(_parts_dir(out_dir), f"part-{part_idx:05d}.json")
    try:
        with open(p) as f:
            m = json.load(f)
        return (m.get("complete", False)
                and m.get("config_hash") == cfg_hash
                and m.get("num_parts") == num_parts)
    except (OSError, json.JSONDecodeError):
        return False


def _exchange_plan_path(out_dir: str) -> str:
    return os.path.join(_parts_dir(out_dir), "_PLAN.json")


def load_or_pin_plan(out_dir: str, cfg_hash: str,
                     db_arr: List[int]) -> List[int]:
    """Pin the per-bucket salt counts across reruns: the first run records
    them; a resume reuses the recorded plan instead of re-deriving it from
    live cluster state (which would change P and misalign partition
    indices).  A config-hash mismatch wipes index/ entirely — old part
    files from a different config must never coexist with new ones."""
    plan_p = _exchange_plan_path(out_dir)
    try:
        with open(plan_p) as f:
            plan = json.load(f)
        if plan.get("config_hash") == cfg_hash:
            return [int(x) for x in plan["doc_buckets"]]
    except (OSError, json.JSONDecodeError, KeyError):
        pass
    # no valid plan for this config → start the exchange from scratch
    import shutil
    idx_dir = os.path.join(out_dir, "index")
    if os.path.exists(idx_dir):
        shutil.rmtree(idx_dir)
    os.makedirs(_parts_dir(out_dir), exist_ok=True)
    tmp = plan_p + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"config_hash": cfg_hash, "doc_buckets": list(db_arr)}, f)
    os.replace(tmp, plan_p)
    return list(db_arr)


# target postings per reduce partition: large enough that per-partition
# task/object overhead amortizes (the map fans out M × P plasma objects),
# small enough that one partition's rows × 16 B fits comfortably in a
# worker heap (3M × 16 B ≈ 50 MB).  Independent of cluster size —
# partition COUNT tracks data volume, so the same corpus produces the same
# partition layout at any parallelism (and reduce work scales with CPUs).
ROWS_PER_PARTITION = int(os.environ.get("PISA_RAY_EXCHANGE_ROWS_PER_PART",
                                        3_000_000))


def plan_buckets(config, num_terms: int, bucket_occ: np.ndarray) -> List[int]:
    """Per-term-bucket salt counts ∝ that bucket's posting mass."""
    target = getattr(config, "exchange_rows_per_part", 0) or ROWS_PER_PARTITION
    return [max(1, int(round(occ / target))) for occ in bucket_occ]


def run_exchange(fwd_files: List[str], out_dir: str, *, terms_ref,
                 term_stats_ref, stats, config, num_terms: int,
                 num_docs: int, bucket_occ: Optional[np.ndarray] = None,
                 files_per_map: Optional[int] = None,
                 resume: bool = True) -> Dict:
    """Full map→reduce inversion exchange.  Returns counts.

    ``bucket_occ[b]`` = total postings whose term falls in term bucket b
    (computed from the lexicon, free).  Partition count follows DATA volume
    (ROWS_PER_PARTITION), not cluster size — running the same corpus at 8
    or 32 CPUs yields the identical partition layout, and each partition is
    ~equal-sized regardless of term skew."""
    term_buckets = config.num_shards
    if bucket_occ is None:
        bucket_occ = np.full(term_buckets,
                             max(1, num_docs * 100 // max(1, term_buckets)))
    db_list = plan_buckets(config, num_terms, np.asarray(bucket_occ))
    cfg_hash = config.config_hash()
    # pin the plan (and hence P) across reruns; wipe index/ on config change
    db_list = load_or_pin_plan(out_dir, cfg_hash, db_list)
    db_arr = np.asarray(db_list, dtype=np.uint64)
    db_off = np.concatenate(([0], np.cumsum(db_arr)[:-1])).astype(np.uint64)
    P = int(db_arr.sum())
    # shard (term bucket) for each partition index
    part_shard = np.repeat(np.arange(term_buckets), db_list)

    import time as _time
    _trace = (lambda m: print(f"[exchange {_time.time() % 1000:.1f}] {m}",
                              flush=True)) \
        if os.environ.get("PISA_RAY_TRACE") else (lambda m: None)

    if files_per_map is None:
        # ONE map wave across the cluster: the map side fans out M × P
        # plasma objects and every reduce task fetches M of them, so M is
        # the object-count multiplier — keep it at the CPU count
        cpus = int(ray.cluster_resources().get("CPU", 8))
        files_per_map = max(1, -(-len(fwd_files) // cpus))
    groups = [fwd_files[i: i + files_per_map]
              for i in range(0, len(fwd_files), files_per_map)]
    _trace(f"map: {len(groups)} tasks x {P} partitions")
    map_refs = [
        _exchange_map.options(num_returns=P).remote(
            g, [terms_ref], config.doc_id_bits, num_terms, num_docs,
            term_buckets, db_arr, db_off)
        for g in groups
    ]
    # normalize: with num_returns=P each entry is a list of P refs
    per_map = [r if isinstance(r, list) else [r] for r in map_refs]

    reduce_refs = []
    skipped = 0
    for p in range(P):
        if resume and part_complete(out_dir, p, cfg_hash, P):
            skipped += 1
            continue
        reduce_refs.append(_exchange_reduce.remote(
            p, int(part_shard[p]), out_dir, stats, [term_stats_ref], config,
            cfg_hash, P, *[m[p] for m in per_map]))
    if os.environ.get("PISA_RAY_TRACE"):
        # wait on ONE ref per map task — cheap proxy for the map wall
        ray.wait([m[0] for m in per_map], num_returns=len(per_map),
                 fetch_local=False)
        _trace("map done")
    results = ray.get(reduce_refs)
    _trace("reduce done")
    return {
        "partitions": P,
        "skipped": skipped,
        "rows": int(sum(r["rows"] for r in results)),
        "segments": int(sum(r["segments"] for r in results)),
    }
