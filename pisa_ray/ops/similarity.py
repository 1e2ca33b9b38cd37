"""Similarity search over an embedding column (``list<float>``).

* ``ann_topk``        — brute-force cosine top-k per query: a broadcast
  query matrix, one numpy matmul per batch, per-query merge.  The exact
  baseline.
* ``lsh_ann_topk``    — random-hyperplane LSH bucketing: probe only
  matching buckets (the scale path; approximate).
* ``cosine_dup_pairs`` — all-pairs cosine ≥ τ near-dup pairs via
  distributed block-pair products (exact; no driver or broadcast
  materialization — peak memory is two blocks per task).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import pyarrow as pa

from pisa_ray.utils import round_half_away


_CACHE: Dict = {}


def _cached_get(ref):
    import ray

    val = _CACHE.get(ref)
    if val is None:
        val = ray.get(ref)
        _CACHE[ref] = val
    return val


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def ann_topk(ds, query_matrix: np.ndarray, query_ids, *, k: int = 10,
             vec_col: str = "embedding", id_col: str = "vec_id",
             round_decimals: Optional[int] = 6):
    """→ Dataset(qid, rank, vec_id, sim): exact cosine top-k per query.

    The query matrix is ``ray.put`` once; each batch computes
    ``Q_norm @ E_norm.T`` (vectorized) and emits per-batch partial top-k
    rows; a small ``groupby(qid)`` merge picks the global top-k — the
    batch-partial-then-merge pattern that avoids shuffling full scores."""
    import ray
    import pandas as pd

    qn = _normalize(np.asarray(query_matrix, dtype=np.float64))
    q_ref = ray.put((qn, list(query_ids)))

    def partial_topk(batch: pa.Table) -> pa.Table:
        qmat, qids = _cached_get(q_ref)
        emb = np.array(batch[vec_col].to_pylist(), dtype=np.float64)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        sims = qmat @ _normalize(emb).T  # (Q, B)
        out_q, out_v, out_s = [], [], []
        kk = min(k, sims.shape[1])
        for qi in range(sims.shape[0]):
            row = sims[qi]
            part = np.argpartition(-row, kk - 1)[:kk]
            out_q.extend([qids[qi]] * len(part))
            out_v.extend(ids[part])
            out_s.extend(row[part])
        return pa.table({
            "qid": pa.array(out_q, type=pa.int64()),
            "vec_id": pa.array(out_v, type=pa.int64()),
            "sim": pa.array(out_s, type=pa.float64()),
        })

    def merge_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.copy()
        if round_decimals is not None:
            g["sim"] = round_half_away(g["sim"].to_numpy(), round_decimals)
        g = g.sort_values(["sim", "vec_id"], ascending=[False, True]).head(k)
        g["rank"] = np.arange(1, len(g) + 1)
        return g[["qid", "rank", "vec_id", "sim"]]

    partials = ds.map_batches(partial_topk, batch_format="pyarrow")
    return partials.groupby("qid").map_groups(merge_topk, batch_format="pandas")


def lsh_ann_topk(ds, query_matrix: np.ndarray, query_ids, *, k: int = 10,
                 n_planes: int = 12, seed: int = 11,
                 vec_col: str = "embedding", id_col: str = "vec_id"):
    """Approximate top-k: random-hyperplane signatures bucket the vectors;
    each query scans only its bucket (plus Hamming≤1 probes)."""
    import ray
    import pandas as pd

    dim = np.asarray(query_matrix).shape[1]
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    qn = _normalize(np.asarray(query_matrix, dtype=np.float64))
    qsig = ((qn @ planes.T) > 0).astype(np.uint32)
    qcodes = (qsig << np.arange(n_planes, dtype=np.uint32)).sum(axis=1)
    # multi-probe: query code + all Hamming-1 neighbors
    probe_codes = {}
    for qi, code in enumerate(qcodes):
        codes = {int(code)} | {int(code) ^ (1 << p) for p in range(n_planes)}
        for c in codes:
            probe_codes.setdefault(c, []).append(qi)
    ref = ray.put((qn, list(query_ids), planes, probe_codes))

    def partial(batch: pa.Table) -> pa.Table:
        qmat, qids, pl, probes = _cached_get(ref)
        emb = np.array(batch[vec_col].to_pylist(), dtype=np.float64)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        en = _normalize(emb)
        sig = ((en @ pl.T) > 0).astype(np.uint32)
        codes = (sig << np.arange(pl.shape[0], dtype=np.uint32)).sum(axis=1)
        out_q, out_v, out_s = [], [], []
        for bi, code in enumerate(codes):
            for qi in probes.get(int(code), ()):
                out_q.append(qids[qi])
                out_v.append(ids[bi])
                out_s.append(float(qmat[qi] @ en[bi]))
        return pa.table({
            "qid": pa.array(out_q, type=pa.int64()),
            "vec_id": pa.array(out_v, type=pa.int64()),
            "sim": pa.array(out_s, type=pa.float64()),
        })

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["sim", "vec_id"],
                              ascending=[False, True]).head(k)
        g = g.copy()
        g["rank"] = np.arange(1, len(g) + 1)
        return g[["qid", "rank", "vec_id", "sim"]]

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("qid").map_groups(merge, batch_format="pandas"))


def _block_pair_sims(tbl_a: pa.Table, tbl_b: pa.Table, same: bool,
                     threshold: float, id_col: str, round_decimals: int
                     ) -> pa.Table:
    """Cosine submatrix between two normalized blocks → pairs ≥ τ."""
    ids_a = tbl_a[id_col].to_numpy(zero_copy_only=False)
    ids_b = tbl_b[id_col].to_numpy(zero_copy_only=False)
    ma = np.asarray(tbl_a["_nvec"].combine_chunks().flatten().to_numpy(
        zero_copy_only=False), dtype=np.float64).reshape(len(ids_a), -1)
    mb = np.asarray(tbl_b["_nvec"].combine_chunks().flatten().to_numpy(
        zero_copy_only=False), dtype=np.float64).reshape(len(ids_b), -1)
    sims = ma @ mb.T
    ai, bi = np.nonzero(sims >= threshold)
    a, b = ids_a[ai], ids_b[bi]
    s = sims[ai, bi]
    # orient every pair a < b; same-block pairs drop the diagonal/mirror
    if same:
        keep = a < b
        a, b, s = a[keep], b[keep], s[keep]
    else:
        flip = a > b
        a2 = np.where(flip, b, a)
        b2 = np.where(flip, a, b)
        a, b = a2, b2
    return pa.table({
        "vec_a": pa.array(a.astype(np.int64), type=pa.int64()),
        "vec_b": pa.array(b.astype(np.int64), type=pa.int64()),
        "sim": pa.array(round_half_away(s, round_decimals),
                        type=pa.float64()),
    })


def cosine_dup_pairs(ds, *, threshold: float = 0.95,
                     vec_col: str = "embedding", id_col: str = "vec_id",
                     round_decimals: int = 6):
    """Exact near-dup pairs (cosine ≥ τ, a < b), distributed block-pair.

    The (id, normalized-vector) dataset is materialized in the object
    store; one Ray task per block pair (i ≤ j) computes that cosine
    submatrix.  No driver-side or per-worker full-matrix materialization —
    peak memory per task is two blocks.  The O(N²) compute is inherent to
    the exact op; the sub-quadratic approximate path is LSH bucketing
    (``lsh_ann_topk``'s hyperplane banding)."""
    import ray
    import ray.data

    def norm_batch(t: pa.Table) -> pa.Table:
        emb = np.array(t[vec_col].to_pylist(), dtype=np.float64)
        nv = _normalize(emb)
        return pa.table({
            id_col: pc_cast_i64(t[id_col]),
            "_nvec": pa.array(list(nv), type=pa.list_(pa.float64())),
        })

    import pyarrow.compute as _pc

    def pc_cast_i64(col):
        return _pc.cast(col, pa.int64())

    compact = ds.map_batches(norm_batch, batch_format="pyarrow").materialize()
    block_refs = [block_ref
                  for bundle in compact.iter_internal_ref_bundles()
                  for block_ref, _m in bundle.blocks]
    pair_task = ray.remote(_block_pair_sims)
    out_refs = []
    for i in range(len(block_refs)):
        for j in range(i, len(block_refs)):
            out_refs.append(pair_task.remote(
                block_refs[i], block_refs[j], i == j, threshold, id_col,
                round_decimals))
    if not out_refs:
        return ray.data.from_arrow(pa.table({
            "vec_a": pa.array([], type=pa.int64()),
            "vec_b": pa.array([], type=pa.int64()),
            "sim": pa.array([], type=pa.float64())}))
    return ray.data.from_arrow_refs(out_refs)
