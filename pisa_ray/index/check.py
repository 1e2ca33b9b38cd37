"""Distributed index self-check — the ``compress_inverted_index --check``
capability (``/root/reference/src/compress.cpp:108-110,217-220``: decode
the whole compressed index and compare against the uncompressed input).

Two distributed passes, no driver materialization beyond vocab-sized
aggregates (the same ceiling the lexicon build already accepts):

1. *Structural* — ``map_batches`` over index segment rows: decode every
   block, assert strictly-ascending docids, tf ≥ 1, docids < num_docs,
   segment metadata (df, occ, first/last doc, per-block last-docs)
   consistent with the decoded postings.  Emits per-term partials
   (n, Σtf, commutative content hash).
2. *Content* — the same partials recomputed from the ``fwd/`` checkpoint
   (the uncompressed input): term → term_id via the sorted-lexicon rank,
   identical per-posting mix.  Per-term equality of (df, occ, hash) makes
   the multiset of (term, doc, tf) provably identical — duplicated,
   dropped, reordered-across-segment or corrupted postings all surface.

Both sides reduce through one vocab-sized groupby; the compare is a
driver pass over the vocab-sized frame (explicitly gated like the
lexicon's ``small_tables_on_driver`` path).
"""

from __future__ import annotations

import glob
import os
from typing import Dict, List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _mix64(x: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer, vectorized (u64 wraparound arithmetic)."""
    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def _posting_hashes(docs: np.ndarray, tfs: np.ndarray) -> np.ndarray:
    d = docs.astype(np.uint64)
    t = tfs.astype(np.uint64)
    return _mix64(d * np.uint64(0x9E3779B97F4A7C15) ^ (t + np.uint64(1)))


def _partial_table(tids, ns, occs, hs) -> pa.Table:
    """One partial row per term in this batch: counts and a mod-2^64
    content hash.  The wrap-sum happens HERE in uint64; downstream the
    hash ships as two 32-bit halves because Ray's Sum aggregate
    accumulates in arbitrary-precision Python ints (no int64 wrap) —
    half-sums stay exact under it and recombine mod 2^64 on the driver."""
    tid = np.asarray(tids, dtype=np.int64)
    n = np.asarray(ns, dtype=np.int64)
    occ = np.asarray(occs, dtype=np.int64)
    h = np.asarray(hs, dtype=np.uint64)
    order = np.argsort(tid, kind="stable")
    tid, n, occ, h = tid[order], n[order], occ[order], h[order]
    brk = np.empty(len(tid), dtype=bool)
    if len(tid):
        brk[0] = True
        np.not_equal(tid[1:], tid[:-1], out=brk[1:])
    starts = np.flatnonzero(brk)
    hsum = np.add.reduceat(h, starts) if len(tid) else h  # u64 wrap
    return pa.table({
        "term_id": pa.array(tid[starts] if len(tid) else tid),
        "n": pa.array(np.add.reduceat(n, starts) if len(tid) else n),
        "occ": pa.array(np.add.reduceat(occ, starts) if len(tid) else occ),
        "h_lo": pa.array((hsum & np.uint64(0xFFFFFFFF)).astype(np.int64)),
        "h_hi": pa.array((hsum >> np.uint64(32)).astype(np.int64)),
    })


def check_index(index_dir: str, *, against_fwd: bool = True,
                max_errors: int = 20) -> Dict[str, object]:
    """Validate an index directory; returns a summary dict with
    ``ok``, counters, and up to ``max_errors`` error strings."""
    import json

    import ray
    import ray.data

    from ray.data.aggregate import Sum

    from pisa_ray.index.postings import SegmentView

    with open(os.path.join(index_dir, "stats.json")) as f:
        num_docs = int(json.load(f)["num_docs"])
    with open(os.path.join(index_dir, "config.json")) as f:
        cfg = json.load(f)
    block_size = int(cfg.get("block_size", 128))
    codec = cfg.get("codec", "bitpack")
    # quantized indexes store ceil-quantized impact scores as the freq
    # stream (build.encode_segments_batch), so tf-derived checks (occ vs
    # lexicon, tf content hash vs fwd) compare docid structure only
    tf_checked = not int(cfg.get("quantize_bits", 0) or 0)

    # -- pass 1: decode + structural asserts, per-term partials ----------
    def seg_check(batch: pa.Table) -> pa.Table:
        errs: List[str] = []
        tids: List[int] = []
        ns: List[int] = []
        occs: List[int] = []
        hs: List[int] = []
        cols = batch.to_pylist()
        for row in cols:
            tid = int(row["term_id"])
            tag = f"term {tid} seg@{row['first_doc']}"
            try:
                view = SegmentView(row, block_size=block_size, codec=codec)
                docs = view.decode_docs()
                tfs = view.decode_freqs()
            except Exception as ex:  # corrupted payload/endpoints
                errs.append(f"{tag}: decode raised {type(ex).__name__}: "
                            f"{ex}")
                continue
            if len(docs) != int(row["df"]) or len(tfs) != len(docs):
                errs.append(f"{tag}: decoded {len(docs)} docs/{len(tfs)} "
                            f"tfs, df={row['df']}")
                continue
            if len(docs):
                if np.any(docs[1:] <= docs[:-1]):
                    errs.append(f"{tag}: docids not strictly ascending")
                if int(docs[0]) != int(row["first_doc"]) \
                        or int(docs[-1]) != int(row["last_doc"]):
                    errs.append(f"{tag}: first/last metadata mismatch")
                if int(docs[-1]) >= num_docs:
                    errs.append(f"{tag}: docid {int(docs[-1])} >= "
                                f"num_docs {num_docs}")
                bl = np.asarray(row["block_last_docs"], dtype=np.uint64)
                want_nblocks = -(-len(docs) // block_size)
                if len(bl) != want_nblocks:
                    errs.append(f"{tag}: {len(bl)} blocks, expected "
                                f"{want_nblocks}")
                else:
                    want_bl = docs[np.minimum(
                        np.arange(1, len(bl) + 1) * block_size,
                        len(docs)) - 1]
                    if np.any(bl != want_bl):
                        errs.append(f"{tag}: block_last_docs mismatch")
            if np.any(tfs < 1):
                errs.append(f"{tag}: tf < 1")
            if tf_checked and int(tfs.sum()) != int(row["occ"]):
                errs.append(f"{tag}: Σtf {int(tfs.sum())} != occ "
                            f"{row['occ']}")
            tids.append(tid)
            ns.append(len(docs))
            occs.append(int(tfs.sum()))
            h = _posting_hashes(docs, tfs) if tf_checked \
                else _posting_hashes(docs, np.zeros(len(docs)))
            hs.append(int(h.sum(dtype=np.uint64)))
        if not tids and errs:
            tids, ns, occs, hs = [-1], [0], [0], [0]
        out = _partial_table(tids, ns, occs, hs)
        errcol = [errs] + [[]] * (out.num_rows - 1) if out.num_rows else []
        return out.append_column(
            "errs", pa.array(errcol, type=pa.list_(pa.string())))

    idx = ray.data.read_parquet(os.path.join(index_dir, "index"))
    # one decode pass: partial rows are vocab×batch-sized aggregates, so
    # the mid-pipeline materialize holds partials, never raw postings
    seg = idx.map_batches(seg_check, batch_format="pyarrow").materialize()
    agg = seg.groupby("term_id").aggregate(
        Sum("n", alias_name="n"), Sum("occ", alias_name="occ"),
        Sum("h_lo", alias_name="h_lo"),
        Sum("h_hi", alias_name="h_hi")).to_pandas()  # vocab-sized
    agg = agg[agg["term_id"] >= 0].reset_index(drop=True)
    agg["h"] = [(int(lo) + (int(hi) << 32)) % (1 << 64)
                for lo, hi in zip(agg.pop("h_lo"), agg.pop("h_hi"))]
    errors: List[str] = []
    for blk in seg.select_columns(["errs"]).iter_batches(
            batch_format="pyarrow"):
        for lst in blk["errs"].to_pylist():
            errors.extend(lst)
            if len(errors) >= max_errors:
                break
        if len(errors) >= max_errors:
            break

    # -- lexicon cross-check ---------------------------------------------
    lex = ray.data.read_parquet(
        os.path.join(index_dir, "lexicon")).to_pandas()  # vocab-sized
    lex = lex.sort_values("term_id").reset_index(drop=True)
    agg = agg.sort_values("term_id").reset_index(drop=True)
    n_terms = len(lex)
    if len(agg) != n_terms:
        errors.append(f"index has {len(agg)} terms, lexicon {n_terms}")
    m = lex.merge(agg, on="term_id", how="inner",
                  suffixes=("_lex", "_idx"))
    bad_df = m[m["df"] != m["n"]]
    bad_occ = m[m["occ_lex"] != m["occ_idx"]] if tf_checked \
        else m.iloc[0:0]
    for _, r in bad_df.head(max_errors).iterrows():
        errors.append(f"term {int(r.term_id)} ({r.term}): index df "
                      f"{int(r.n)} != lexicon df {int(r.df)}")
    for _, r in bad_occ.head(max_errors).iterrows():
        errors.append(f"term {int(r.term_id)} ({r.term}): index occ "
                      f"{int(r.occ_idx)} != lexicon occ {int(r.occ_lex)}")

    summary: Dict[str, object] = {
        "num_docs": num_docs,
        "terms": n_terms,
        "postings": int(agg["n"].sum()),
        "checked_against_fwd": False,
    }

    # -- pass 2: recompute the partials from the uncompressed input ------
    fwd_dir = os.path.join(index_dir, "fwd")
    if against_fwd and glob.glob(os.path.join(fwd_dir, "*.parquet")):
        # lexicon term_id IS the sorted rank, so the index_in position
        # against the term_id-ordered vocab is the term_id itself
        vocab_ref = ray.put(pa.array(lex["term"], type=pa.string()))

        def fwd_partial(batch: pa.Table) -> pa.Table:
            from pisa_ray.ops.similarity import _cached_get

            vocab = _cached_get(vocab_ref)
            pos = pc.index_in(pc.cast(batch["term"], pa.string()),
                              value_set=vocab).fill_null(-1).to_numpy(
                zero_copy_only=False).astype(np.int64)
            known = pos >= 0
            docs = batch["doc_id"].to_numpy(
                zero_copy_only=False).astype(np.uint64)[known]
            tfs = batch["tf"].to_numpy(
                zero_copy_only=False).astype(np.uint64)[known]
            tid = pos[known]
            if not tf_checked:
                tfs = np.zeros(len(tfs), dtype=np.uint64)
            h = _posting_hashes(docs, tfs)
            n_unknown = int((~known).sum())
            if n_unknown:
                # surface as a sentinel partial so a term dropped from
                # BOTH lexicon and index still fails the check
                tid = np.concatenate([tid, [-1]])
                h = np.concatenate([h, [np.uint64(0)]])
                ones = np.concatenate(
                    [np.ones(len(tfs), dtype=np.int64), [n_unknown]])
                occ = np.concatenate(
                    [tfs.astype(np.int64), [0]])
                return _partial_table(tid, ones, occ, h)
            return _partial_table(tid, np.ones(len(tid), dtype=np.int64),
                                  tfs.astype(np.int64), h)

        fagg = (ray.data.read_parquet(
                    fwd_dir, columns=["doc_id", "term", "tf"])
                .map_batches(fwd_partial, batch_format="pyarrow")
                .groupby("term_id")
                .aggregate(Sum("n", alias_name="n"),
                           Sum("occ", alias_name="occ"),
                           Sum("h_lo", alias_name="h_lo"),
                           Sum("h_hi", alias_name="h_hi"))
                .to_pandas())  # vocab-sized
        fagg["h"] = [(int(lo) + (int(hi) << 32)) % (1 << 64)
                     for lo, hi in zip(fagg.pop("h_lo"),
                                       fagg.pop("h_hi"))]
        unk = fagg[fagg["term_id"] < 0]
        if len(unk):
            errors.append(f"{int(unk['n'].sum())} fwd postings reference "
                          "terms missing from the lexicon")
        fagg = fagg[fagg["term_id"] >= 0].reset_index(drop=True)
        a = agg.set_index("term_id")
        b = fagg.set_index("term_id")
        union = a.index.union(b.index)
        a = a.reindex(union, fill_value=0)
        b = b.reindex(union, fill_value=0)
        bad_mask = (a["n"] != b["n"]) | (a["h"] != b["h"])
        if tf_checked:
            bad_mask |= a["occ"] != b["occ"]
        for term_id in union[bad_mask][:max_errors]:
            ra, rb = a.loc[term_id], b.loc[term_id]
            errors.append(
                f"term_id {int(term_id)}: index (n={int(ra.n)}, "
                f"occ={int(ra.occ)}) vs fwd (n={int(rb.n)}, "
                f"occ={int(rb.occ)})"
                + ("" if ra.h == rb.h else " [content hash differs]"))
        summary["checked_against_fwd"] = True
        summary["fwd_postings"] = int(fagg["n"].sum())

    summary["errors"] = errors[:max_errors]
    summary["ok"] = not errors
    return summary



