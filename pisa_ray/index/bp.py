"""Recursive graph bisection (BP) document reordering.

The reference's flagship index optimization
(``/root/reference/include/pisa/recursive_graph_bisection.hpp``,
``reorder_docids.hpp:75-129``), re-derived from the public algorithm
(Dhulipala et al., "Compressing Graphs and Indexes with Recursive Graph
Bisection", KDD 2016): documents are vertices, each term's posting list an
edge set; recursively split the document range in two and iteratively swap
documents between halves to minimize the estimated delta-gap cost

    cost(half) = Σ_t deg_half(t) · log2(n_half / (deg_half(t) + 1))

Move gains are computed VECTORIZED per iteration: a per-term gain table
(leave-left + join-right, and vice versa) is gathered through the doc→term
CSR with ``np.add.reduceat`` — no per-doc Python loop.  Docs in each half
are sorted by gain and the top pairs swap while the combined gain is
positive.

Scale path: each recursion branch is independent — ``bp_mapping`` runs the
top ``ray_depth`` levels as Ray tasks (one task per branch, shipping only
that branch's CSR slice); below that the branch is a single in-memory
numpy job.  The output is an old→new docid permutation to feed
``assign_mapping`` / ``build_index``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def _csr_from_lists(doc_terms) -> Tuple[np.ndarray, np.ndarray]:
    indptr = np.zeros(len(doc_terms) + 1, dtype=np.int64)
    for i, ts in enumerate(doc_terms):
        indptr[i + 1] = indptr[i] + len(ts)
    indices = np.empty(indptr[-1], dtype=np.int64)
    for i, ts in enumerate(doc_terms):
        indices[indptr[i]: indptr[i + 1]] = ts
    return indptr, indices


def _log2p1(x: np.ndarray) -> np.ndarray:
    return np.log2(x + 1.0)


def _flat_idx(indptr: np.ndarray, docs: np.ndarray) -> np.ndarray:
    """CSR row indices for a doc set, fully vectorized (no per-doc loop):
    concatenation of ``range(indptr[d], indptr[d+1])`` for d in docs."""
    if len(docs) == 0:
        return np.empty(0, dtype=np.int64)
    lens = indptr[docs + 1] - indptr[docs]
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    out = np.ones(total, dtype=np.int64)
    keep = lens > 0
    kd = docs[keep]
    kl = lens[keep]
    starts = np.cumsum(kl)[:-1]
    out[0] = indptr[kd[0]]
    if len(kd) > 1:
        out[starts] = indptr[kd[1:]] - (indptr[kd[:-1]] + kl[:-1]) + 1
    return np.cumsum(out)


def _term_degrees(indices: np.ndarray, order: np.ndarray,
                  indptr: np.ndarray, mask_left: np.ndarray,
                  num_terms: int) -> Tuple[np.ndarray, np.ndarray]:
    """Degrees of each term in the left/right halves of ``order``."""
    lengths = indptr[order + 1] - indptr[order]
    side = np.repeat(mask_left, lengths)
    terms = indices[_flat_idx(indptr, order)]
    deg_l = np.bincount(terms[side], minlength=num_terms).astype(np.float64)
    deg_r = np.bincount(terms[~side], minlength=num_terms).astype(np.float64)
    return deg_l, deg_r


def _bisect(indptr: np.ndarray, indices: np.ndarray, order: np.ndarray,
            num_terms: int, iterations: int, rng_seed: int) -> np.ndarray:
    """One bisection level: returns ``order`` rearranged so the first half
    precedes the second (docs swapped to minimize cost)."""
    n = len(order)
    half = n // 2
    cur = order.copy()
    for it in range(iterations):
        left, right = cur[:half], cur[half:]
        mask = np.zeros(n, dtype=bool)
        mask[:half] = True
        deg_l, deg_r = _term_degrees(indices, cur, indptr, mask, num_terms)
        n_l, n_r = float(half), float(n - half)
        # per-term gain tables: cost change of moving ONE doc containing t
        # from L→R (and R→L); gain = cost(current) - cost(after), positive
        # = improvement.  deg==0 guards: the gather below only touches
        # terms actually present in the moving doc, so those entries are
        # never read with deg 0 on the source side.
        cur_l = deg_l * _log2p1(n_l / (deg_l + 1))
        cur_r = deg_r * _log2p1(n_r / (deg_r + 1))
        new_l = np.where(deg_l > 0,
                         (deg_l - 1) * _log2p1(n_l / np.maximum(deg_l, 1)),
                         0.0)
        new_r = (deg_r + 1) * _log2p1(n_r / (deg_r + 2))
        gain_lr = (cur_l + cur_r) - (new_l + new_r)
        new_r2 = np.where(deg_r > 0,
                          (deg_r - 1) * _log2p1(n_r / np.maximum(deg_r, 1)),
                          0.0)
        new_l2 = (deg_l + 1) * _log2p1(n_l / (deg_l + 2))
        gain_rl = (cur_l + cur_r) - (new_l2 + new_r2)

        def doc_gains(docs: np.ndarray, table: np.ndarray) -> np.ndarray:
            if len(docs) == 0:
                return np.empty(0)
            lens = indptr[docs + 1] - indptr[docs]
            vals = table[indices[_flat_idx(indptr, docs)]]
            starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            out = np.zeros(len(docs))
            nonempty = lens > 0
            if nonempty.any() and len(vals):
                out[nonempty] = np.add.reduceat(vals, starts[nonempty])
            return out

        g_left = doc_gains(left, gain_lr)
        g_right = doc_gains(right, gain_rl)
        ol = np.argsort(-g_left, kind="stable")
        orr = np.argsort(-g_right, kind="stable")
        m = min(len(ol), len(orr))
        combined = g_left[ol[:m]] + g_right[orr[:m]]
        n_swap = int(np.searchsorted(-combined, 0.0))  # gains desc; >0 swap
        if n_swap == 0:
            break
        li, ri = ol[:n_swap], orr[:n_swap]
        tmp = left[li].copy()
        left[li] = right[ri]
        right[ri] = tmp
        cur = np.concatenate([left, right])
    return cur


def _bp_order(indptr: np.ndarray, indices: np.ndarray, order: np.ndarray,
              num_terms: int, *, iterations: int, min_partition: int,
              seed: int) -> np.ndarray:
    if len(order) <= min_partition:
        return np.sort(order)  # stabilize leaves by original id
    cur = _bisect(indptr, indices, order, num_terms, iterations, seed)
    half = len(cur) // 2
    left = _bp_order(indptr, indices, cur[:half], num_terms,
                     iterations=iterations, min_partition=min_partition,
                     seed=seed * 2 + 1)
    right = _bp_order(indptr, indices, cur[half:], num_terms,
                      iterations=iterations, min_partition=min_partition,
                      seed=seed * 2 + 2)
    return np.concatenate([left, right])


def bp_mapping_from_fwd(fwd_dir: str, *, iterations: int = 20,
                        min_partition: int = 32, seed: int = 1,
                        ray_depth: int = 2,
                        num_docs: int | None = None) -> np.ndarray:
    """old→new docid permutation from a build's fwd/ checkpoint.

    Reads (doc_id, term) rows, builds the doc→term-id CSR, runs BP.  The
    top ``ray_depth`` recursion levels fan out as Ray tasks (independent
    branches); deeper levels run in-task with numpy.

    ``num_docs``: total collection size.  Docids absent from the fwd
    checkpoint (documents whose tokens were all filtered out) get empty
    CSR rows and participate in the permutation, so the mapping is total
    — without it a trailing all-filtered doc would be missing and the
    reorder rebuild would KeyError.  Defaults to ``fwd``'s max docid + 1
    (read stats.json and pass num_docs when trailing docs may be empty)."""
    import glob
    import os

    import pyarrow.parquet as pq
    import pyarrow as pa
    import ray

    files = sorted(glob.glob(os.path.join(fwd_dir, "*.parquet")))
    tbl = pa.concat_tables(
        [pq.read_table(f, columns=["doc_id", "term"]) for f in files])
    # fwd checkpoints may carry dictionary-encoded terms
    terms = tbl["term"].cast(pa.string()).combine_chunks()
    uniq = terms.unique().sort()
    import pyarrow.compute as pc

    tids = pc.index_in(terms, value_set=uniq).to_numpy(zero_copy_only=False)
    docs = tbl["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    num_terms = len(uniq)
    n = int(docs.max()) + 1 if len(docs) else 0
    if num_docs is not None:
        n = max(n, int(num_docs))
    order_by_doc = np.argsort(docs, kind="stable")
    docs_s, tids_s = docs[order_by_doc], tids[order_by_doc]
    counts = np.bincount(docs_s, minlength=n)
    indptr = np.zeros(n + 1, dtype=np.int64)
    indptr[1:] = np.cumsum(counts)
    indices = tids_s.astype(np.int64)

    def run_branch(order: np.ndarray, depth: int) -> np.ndarray:
        if depth >= ray_depth or len(order) <= min_partition:
            return _bp_order(indptr, indices, order, num_terms,
                             iterations=iterations,
                             min_partition=min_partition, seed=seed + depth)
        cur = _bisect(indptr, indices, order, num_terms, iterations,
                      seed + depth)
        half = len(cur) // 2
        left_ref = _bp_branch_task.remote(indptr, indices, cur[:half],
                                          num_terms, iterations,
                                          min_partition, seed + depth * 2)
        right = run_branch(cur[half:], depth + 1)
        left = ray.get(left_ref)
        return np.concatenate([left, right])

    final_order = run_branch(np.arange(n, dtype=np.int64), 0)
    perm = np.empty(n, dtype=np.uint64)
    perm[final_order] = np.arange(n, dtype=np.uint64)
    return perm


import ray as _ray


@_ray.remote
def _bp_branch_task(indptr, indices, order, num_terms, iterations,
                    min_partition, seed):
    return _bp_order(indptr, indices, order, num_terms,
                     iterations=iterations, min_partition=min_partition,
                     seed=seed)


# ---------------------------------------------------------------------------
# distributed BP: block-diagonal partitioned bisection

def bp_mapping_partitioned(fwd_dir: str, num_docs: int, *,
                           partition_docs: int = 1 << 20,
                           iterations: int = 20, min_partition: int = 32,
                           seed: int = 1):
    """→ Dataset(doc_id, new_doc_id): BP reordering that scales past the
    single-driver CSR (``bp_mapping_from_fwd`` tops out around ~10M docs).

    The docid space is cut into fixed ``partition_docs``-wide ranges and
    BP runs INDEPENDENTLY inside each range (one ``map_groups`` call per
    range, local CSR, local term ids).  The permutation is therefore
    block-diagonal: range r's docs are reordered within
    ``[r·W, min((r+1)·W, num_docs))``.  This is the standard scale-out
    of the KDD'16 algorithm — the top ``log2(P)`` bisection levels are
    replaced by the existing global order's range splits, which for this
    engine's sorted-URL docid assignment (SURVEY §2.7) is exactly the
    locality BP's own first levels would rediscover: gap-locality is a
    within-neighborhood property, and ranges preserve URL neighborhoods.
    Docs absent from the fwd checkpoint (all tokens filtered) fill each
    range's trailing slots in old-docid order; ranges with NO fwd rows
    produce no group — consume the mapping with ``assign_mapping_ds``,
    whose left join fills identity for them (identity within a full
    block is closed, so the global mapping stays a bijection).

    Shuffle cost: ONE groupby of (doc_id, term) rows keyed by
    ``doc_id // W`` — and because the fwd checkpoint is already written
    in docid order, that exchange moves nearly-sorted blocks."""
    import os

    import pyarrow as pa
    import pandas as pd
    import ray.data

    W = int(partition_docs)

    def add_part(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("part", pa.array(d // W, type=pa.int64()))

    def bp_group(df: pd.DataFrame) -> pd.DataFrame:
        part = int(df["part"].iloc[0])
        base = part * W
        hi = min(base + W, int(num_docs))
        docs = df["doc_id"].to_numpy().astype(np.int64)
        tids, _uniq = pd.factorize(df["term"], sort=True)
        present = np.unique(docs)
        local = np.searchsorted(present, docs)
        order_rows = np.argsort(local, kind="stable")
        counts = np.bincount(local, minlength=len(present))
        indptr = np.zeros(len(present) + 1, dtype=np.int64)
        indptr[1:] = np.cumsum(counts)
        indices = tids[order_rows].astype(np.int64)
        bp = _bp_order(indptr, indices,
                       np.arange(len(present), dtype=np.int64),
                       int(tids.max()) + 1 if len(tids) else 0,
                       iterations=iterations, min_partition=min_partition,
                       seed=seed + part)
        new_of_present = np.empty(len(present), dtype=np.int64)
        new_of_present[bp] = base + np.arange(len(present), dtype=np.int64)
        absent = np.setdiff1d(np.arange(base, hi, dtype=np.int64), present,
                              assume_unique=True)
        return pd.DataFrame({
            "doc_id": np.concatenate([present, absent]),
            "new_doc_id": np.concatenate([
                new_of_present,
                base + len(present) + np.arange(len(absent),
                                                dtype=np.int64)]),
        })

    fwd = ray.data.read_parquet(fwd_dir, columns=["doc_id", "term"])
    return (fwd.map_batches(add_part, batch_format="pyarrow")
            .groupby("part")
            .map_groups(bp_group, batch_format="pandas"))


def assign_mapping_ds(ds, mapping_ds, *, id_col: str = "doc_id",
                      num_partitions: int = 8):
    """Distributed docid remap: left-join ``ds`` against a
    Dataset(doc_id, new_doc_id) mapping (the ``bp_mapping_partitioned``
    output) and swap ids; docs missing from the mapping keep their id
    (identity fill — see ``bp_mapping_partitioned``).  The Dataset-join
    counterpart of ``reorder.assign_mapping``'s broadcast dict."""
    import pyarrow as pa
    import pyarrow.compute as pc

    joined = ds.join(mapping_ds, join_type="left_outer",
                     num_partitions=num_partitions,
                     on=(id_col,), right_on=("doc_id",))

    def swap(t: pa.Table) -> pa.Table:
        new = pc.coalesce(pc.cast(t["new_doc_id"], pa.int64()),
                          pc.cast(t[id_col], pa.int64()))
        i = t.schema.get_field_index(id_col)
        return t.set_column(i, id_col, new).drop_columns(["new_doc_id"])

    return joined.map_batches(swap, batch_format="pyarrow")
