"""Inverted-index reader: loads the sharded index layout for query serving.

The on-disk layout (see ``pisa_ray.index.build``) is Parquet:

* ``lexicon/``  — term, df, occ, term_id (sorted-term rank)
* ``sizes/``    — doc_id, doc_len (dense ids)
* ``index/shard=K/`` — posting-list segments (blocks + WAND metadata)
* ``stats.json`` / ``config.json`` — collection stats + build config

One ``InvertedIndex`` per serving actor (loaded once in ``__init__`` —
the analogue of the reference mmap-ing index+wand+lexicons once per process,
``/root/reference/tools/queries.cpp:132-151``).  A term's posting list is
the concatenation of its segments in ``first_doc`` order (segments come
from independent sorted blocks with disjoint docid ranges).
"""

from __future__ import annotations

import glob
import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from pisa_ray.index.postings import SegmentView
from pisa_ray.query.scorers import CollectionStats


class PostingList:
    """All segments of one term, ordered by first_doc."""

    __slots__ = ("term_id", "df", "occ", "max_score", "segments")

    def __init__(self, term_id: int, segments: List[SegmentView]):
        self.term_id = term_id
        self.segments = segments
        self.df = sum(s.n for s in segments)
        self.occ = 0  # filled by reader from lexicon
        self.max_score = max((s.max_score for s in segments), default=0.0)

    # -- whole-list decode (vectorized TAAT path) ---------------------------
    def decode(self) -> tuple[np.ndarray, np.ndarray]:
        docs = np.concatenate([s.decode_docs() for s in self.segments])
        freqs = np.concatenate([s.decode_freqs() for s in self.segments])
        return docs, freqs

    # -- flat block view (for cursors) --------------------------------------
    def blocks(self):
        """Yields (segment, block_idx) pairs in global docid order."""
        for seg in self.segments:
            for b in range(seg.num_blocks):
                yield seg, b


class DocLens:
    """Doc-length lookup backed by only a [lo, hi) slice of the collection.

    Supports scalar and vectorized fancy indexing (``doc_lens[doc_array]``)
    like the dense array it replaces; ``len()`` reports the GLOBAL doc
    count (dense TAAT accumulators use it, and TAAT runs unsharded).  This
    is what makes doc-sharded serving actually sharded: per-actor memory
    for sizes is (hi-lo), not num_docs."""

    __slots__ = ("arr", "lo", "num_docs")

    def __init__(self, arr: np.ndarray, lo: int, num_docs: int):
        self.arr = arr
        self.lo = lo
        self.num_docs = num_docs

    def __getitem__(self, doc):
        # segments overlapping the shard boundary decode whole blocks, so
        # cursors score some docids outside [lo, hi); those scores are
        # discarded by the range-bound cursor, so a clipped neighbor length
        # is fine — never an IndexError
        idx = np.clip(np.asarray(doc, dtype=np.int64) - self.lo,
                      0, max(0, len(self.arr) - 1))
        return self.arr[idx]

    def __len__(self) -> int:
        return self.num_docs


class InvertedIndex:
    def __init__(self, out_dir: str, doc_range=None):
        """``doc_range=(lo, hi)`` restricts loading to segments whose docid
        range overlaps [lo, hi) (parquet row-group predicate pushdown on
        first_doc/last_doc statistics) and to the matching rows of the
        sizes table — the per-shard locality of the reference's per-shard
        mmap (``src/sharding.cpp:146-268``).  The lexicon stays global
        (O(vocab), shared by every shard)."""
        self.out_dir = out_dir
        self.doc_range = doc_range
        with open(os.path.join(out_dir, "stats.json")) as f:
            s = json.load(f)
        self.stats = CollectionStats(**s)
        with open(os.path.join(out_dir, "config.json")) as f:
            self.config = json.load(f)
        self.block_size = int(self.config.get("block_size", 128))
        self.codec = self.config.get("codec", "bitpack")

        lex_files = sorted(glob.glob(os.path.join(out_dir, "lexicon", "*.parquet")))
        lex = pa.concat_tables([pq.read_table(f) for f in lex_files]).sort_by("term_id")
        self.terms: pa.Array = lex["term"].combine_chunks()
        self.df_arr = lex["df"].to_numpy()
        self.occ_arr = lex["occ"].to_numpy()
        self.num_terms = len(self.terms)

        size_files = sorted(glob.glob(os.path.join(out_dir, "sizes", "*.parquet")))
        if doc_range is not None:
            lo, hi = int(doc_range[0]), int(doc_range[1])
            sflt = [("doc_id", ">=", lo), ("doc_id", "<", hi)]
            st = pa.concat_tables(
                [pq.read_table(f, filters=sflt) for f in size_files])
            arr = np.zeros(max(0, hi - lo), dtype=np.uint32)
            ids = st["doc_id"].to_numpy().astype(np.int64) - lo
            arr[ids] = st["doc_len"].to_numpy().astype(np.uint32)
            self.doc_lens = DocLens(arr, lo, self.stats.num_docs)
        else:
            st = pa.concat_tables([pq.read_table(f) for f in size_files])
            self.doc_lens = np.zeros(self.stats.num_docs, dtype=np.uint32)
            ids = st["doc_id"].to_numpy().astype(np.int64)
            self.doc_lens[ids] = st["doc_len"].to_numpy().astype(np.uint32)

        idx_files = sorted(glob.glob(
            os.path.join(out_dir, "index", "**", "*.parquet"), recursive=True))
        if doc_range is not None:
            iflt = [("last_doc", ">=", int(doc_range[0])),
                    ("first_doc", "<", int(doc_range[1]))]
            tables = [pq.read_table(f, filters=iflt) for f in idx_files]
        else:
            tables = [pq.read_table(f) for f in idx_files]
        idx = pa.concat_tables(tables, promote_options="permissive") if tables else None
        self._segments: Dict[int, List[SegmentView]] = {}
        if idx is not None and idx.num_rows:
            idx = idx.sort_by([("term_id", "ascending"), ("first_doc", "ascending")])
            cols = {name: idx[name].to_pylist()
                    for name in ("doc_payload", "freq_payload")}
            tid = idx["term_id"].to_numpy()
            df = idx["df"].to_numpy()
            first = idx["first_doc"].to_numpy()
            last = idx["last_doc"].to_numpy()
            de = idx["doc_endpoints"].to_pylist()
            fe = idx["freq_endpoints"].to_pylist()
            bld = idx["block_last_docs"].to_pylist()
            bms = idx["block_max_scores"].to_pylist()
            has_wand = "wand_last_docs" in idx.column_names
            wld = idx["wand_last_docs"].to_pylist() if has_wand else None
            wms = idx["wand_max_scores"].to_pylist() if has_wand else None
            mx = idx["max_score"].to_numpy()
            for i in range(len(tid)):
                row = {
                    "df": df[i],
                    "first_doc": first[i], "last_doc": last[i],
                    "doc_payload": cols["doc_payload"][i],
                    "freq_payload": cols["freq_payload"][i],
                    "doc_endpoints": de[i], "freq_endpoints": fe[i],
                    "block_last_docs": bld[i], "block_max_scores": bms[i],
                    "wand_last_docs": wld[i] if wld is not None else None,
                    "wand_max_scores": wms[i] if wms is not None else None,
                    "max_score": mx[i],
                }
                self._segments.setdefault(int(tid[i]), []).append(
                    SegmentView(row, block_size=self.block_size, codec=self.codec))

    # -- lookups ------------------------------------------------------------
    def term_id(self, term: str) -> Optional[int]:
        """Binary-search the sorted lexicon (id = rank), mirroring the
        reference's TermProcessor (term_processor.hpp:34-37)."""
        idx = pc.index_in(pa.array([term]), value_set=self.terms)[0].as_py()
        return idx

    def term_ids(self, terms: Sequence[str]) -> List[Optional[int]]:
        return [x.as_py() for x in
                pc.index_in(pa.array(list(terms), type=pa.string()),
                            value_set=self.terms)]

    def posting_list(self, term_id: int) -> Optional[PostingList]:
        segs = self._segments.get(int(term_id))
        if not segs:
            return None
        pl = PostingList(int(term_id), segs)
        pl.occ = int(self.occ_arr[term_id])
        return pl

    def term_df(self, term_id: int) -> int:
        return int(self.df_arr[term_id])

    def term_occ(self, term_id: int) -> int:
        return int(self.occ_arr[term_id])

    def doc_len(self, doc_id) -> np.ndarray:
        return self.doc_lens[doc_id]
