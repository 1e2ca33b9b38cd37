"""Deduplication operators over a document Dataset.

Large-scale training-data pipeline primitives, all expressed Ray-Data-first:

* exact dedup            — content-hash column → groupby(hash) keep-first
* n-gram Jaccard pairs   — shingle explode → groupby(shingle) pair emit →
                           groupby(pair) count → Jaccard filter (exact)
* MinHash + LSH          — per-doc signatures → band rows →
                           groupby(band, bucket) candidate pairs (approx)
* SimHash                — 64-bit fingerprints → banded buckets →
                           Hamming-verified near-dup pairs

All hashing is vectorized (polars' xxhash64 over whole columns — no
per-string Python loops) and seed-stable, never Python ``hash()``
(PYTHONHASHSEED would break determinism across workers).  No pipeline here
materializes a whole-dataset structure on the driver: candidate-pair
verification joins pairs against the signature/document dataset instead of
broadcasting a signature matrix (the broadcast dies at ~10^9 docs).  The
reference engine has no near-dup machinery (SURVEY §2.8) — these extend it
with the dedup stack a 100 TB web-text pipeline needs.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from pisa_ray.utils import round_half_away

import os

# rows-per-partition target for the pair-verification hash joins — the
# same data-proportional convention as the inversion exchange's
# ROWS_PER_PARTITION (index/exchange.py): partition COUNT tracks data
# volume, so one partition's rows fit a worker heap at any corpus size
JOIN_ROWS_PER_PARTITION = int(os.environ.get(
    "PISA_RAY_JOIN_ROWS_PER_PART", 2_000_000))


def join_partitions(*row_counts) -> int:
    """Hash-join fan-out ∝ known data volume: enough partitions that the
    largest KNOWN join input lands ~JOIN_ROWS_PER_PARTITION rows per
    partition, floored at 8 (small clusters still parallelize) and capped
    at 4096 (shuffle-metadata overhead beyond that outweighs smaller
    partitions).  Callers pass the row counts they already hold — the
    candidate-pair count from ``materialize_nonempty``, a materialized
    corpus's free ``count()`` — and omit sides whose count would cost an
    extra execution pass; a slightly coarse fan-out beats re-running a
    pipeline stage to measure it."""
    n = max((int(r) for r in row_counts if r), default=0)
    return max(8, min(4096, -(-n // JOIN_ROWS_PER_PARTITION)))


def materialize_nonempty(ds, empty: "pa.Table"):
    """Rebuild ``ds`` from its non-empty blocks only → (dataset, n_rows).

    Ray Data passes EMPTY blocks through ``map_batches`` untransformed, so
    a pipeline whose ``map_groups`` emitted empty frames for some groups
    carries schema-less empty pandas blocks all the way to a hash join,
    where Arrow dies with "No match or multiple matches for key field …".
    Candidate-pair sets are tiny relative to the corpus (ids only), so the
    materialize is cheap and the rebuild ships object refs, never rows.
    ``empty`` supplies the canonical typed table when every block is empty
    — but Ray's hash join rejects even a correctly-typed ALL-EMPTY input,
    so join-chain callers must short-circuit on ``n_rows == 0`` instead of
    joining the fallback (the reason this variant returns the count)."""
    import ray
    import ray.data

    m = ds.materialize()
    refs, rows = [], 0
    for bundle in m.iter_internal_ref_bundles():
        for bref, meta in bundle.blocks:
            if meta.num_rows:
                refs.append(bref)
                rows += meta.num_rows
    if not refs:
        return ray.data.from_arrow(empty), 0
    return ray.data.from_arrow_refs(refs), rows


def drop_empty_blocks(ds, empty: "pa.Table"):
    """:func:`materialize_nonempty` without the count — for call sites
    where downstream handles an all-empty dataset (no hash join next)."""
    return materialize_nonempty(ds, empty)[0]


# ---------------------------------------------------------------------------
# stable vectorized hashing

_HASH_CANARY_DONE = False


def _check_hash_canary() -> None:
    """polars does NOT guarantee Series.hash stability across versions; the
    golden fixtures and cross-run determinism depend on the current
    xxhash64 behavior.  This canary turns a silent semantic change (an
    upgraded/mixed-version cluster producing different group keys and
    MinHash/SimHash signatures) into a loud error at first use.  Pin the
    polars version cluster-wide, or re-generate goldens after an upgrade."""
    global _HASH_CANARY_DONE
    if _HASH_CANARY_DONE:
        return
    # first stable-hash use in a worker = the dedup/similarity/textstats
    # hot path is about to allocate; tune the arena here (idempotent)
    from pisa_ray.utils import ensure_malloc_tuned

    ensure_malloc_tuned()
    import polars as pl

    got = pl.Series(["pisa-ray-canary"]).hash(seed=11).to_numpy()
    if int(got[0]) != 11237523598774343049:
        raise RuntimeError(
            "polars Series.hash changed behavior (got %d); dedup hashes are "
            "version-dependent — pin polars cluster-wide and regenerate "
            "tests/golden/*.parquet" % int(got[0]))
    _HASH_CANARY_DONE = True


def _stable_u64_column(values, seed: int = 11) -> np.ndarray:
    """Vectorized 64-bit hashes of a string column (polars xxhash64).

    Deterministic for a FIXED polars version (guarded by
    ``_check_hash_canary``); polars does not guarantee cross-version
    stability.  ``values`` may be a list, numpy array, or pyarrow array.
    One Rust call per column — replaces the per-string hashlib loop that
    dominated the round-1 minhash bench."""
    import polars as pl

    _check_hash_canary()
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        s = pl.from_arrow(values)
    else:
        s = pl.Series(values)
    return s.hash(seed=seed).to_numpy().astype(np.uint64)


def _md5_u64_column(values) -> np.ndarray:
    """64-bit hashes via md5 (bytes 8..16 of the digest, little-endian) —
    exactly DuckDB's ``md5_number_lower``, so ops running in this mode are
    replicable by a pure-SQL oracle.  Slower than the xxhash column call;
    used by the oracle-compat catalog entries, not the default hot path."""
    import hashlib

    out = np.empty(len(values), dtype=np.uint64)
    md5 = hashlib.md5
    for i, s in enumerate(values):
        out[i] = int.from_bytes(md5(s.encode()).digest()[8:], "little")
    return out


def _hash_u64_column(values, hash_fn: str) -> np.ndarray:
    if hash_fn == "md5":
        return _md5_u64_column(values)
    return _stable_u64_column(values)


_MERSENNE = (1 << 61) - 1


def _minhash_params(num_perm: int, seed: int) -> tuple:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def _word_shingles(text: str, n: int = 3) -> List[str]:
    toks = text.split()
    if len(toks) < n:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i: i + n]) for i in range(len(toks) - n + 1)]


def _mix_rows_u64(mat: np.ndarray, seed: int = 0x9E3779B97F4A7C15) -> np.ndarray:
    """Combine each row of a (N, r) uint64 matrix into one uint64 —
    vectorized splitmix-style mixing (bucket key for LSH bands)."""
    h = np.full(mat.shape[0], np.uint64(seed), dtype=np.uint64)
    for j in range(mat.shape[1]):
        x = mat[:, j] ^ h
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        h = x ^ (x >> np.uint64(31))
    return h


def _composite_hash(values):
    """THE 128-bit content key used across the dedup family: two
    independent-seed xxhash64 columns (a single 64-bit hash collides at
    ~2^32 docs, too weak for 10^12).  → (h1, h2) uint64 arrays."""
    return _stable_u64_column(values, seed=11), \
        _stable_u64_column(values, seed=23)


def _sorted_runs(run_keys, tiebreaks=()):
    """Sort rows by ``run_keys`` (major key first; ``tiebreaks`` order
    rows within a run) and find equal-key runs — the shared idiom of the
    coarse-group pair emitters (one vectorized lexsort instead of one
    Python map_groups call per near-singleton exact key).

    → (order, starts, sizes): apply ``order`` to the payload columns,
    then each run is ``[starts[i], starts[i] + sizes[i])``."""
    order = np.lexsort(tuple(tiebreaks)[::-1] + tuple(run_keys)[::-1])
    n = len(order)
    if n == 0:
        z = np.empty(0, dtype=np.int64)
        return order, z, z
    new = np.zeros(n, dtype=bool)
    new[0] = True
    for k in run_keys:
        ks = k[order]
        new[1:] |= ks[1:] != ks[:-1]
    starts = np.flatnonzero(new)
    sizes = np.diff(np.append(starts, n))
    return order, starts, sizes


# ---------------------------------------------------------------------------
# exact dedup

def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id",
                normalize: bool = True):
    """→ Dataset(doc_id = min id per duplicate group, n_dups).

    The content key is a 128-bit composite (two seeded xxhash64 passes —
    a single 64-bit hash collides at ~2^32 docs, too weak for 10^12);
    the groupby shuffles only (hash, id) pairs, never the text."""
    def add_hash(batch: pa.Table) -> pa.Table:
        col = batch[text_col]
        if normalize:
            col = pc.utf8_lower(pc.coalesce(col, pa.scalar("")))
        h1, h2 = _composite_hash(col)
        return pa.table({
            "h1": pa.array(h1, type=pa.uint64()),
            "h2": pa.array(h2, type=pa.uint64()),
            id_col: batch[id_col],
        })

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")
    from ray.data.aggregate import Count, Min

    agg = hashed.groupby(["h1", "h2"]).aggregate(
        Min(id_col, alias_name="keep_id"), Count(alias_name="n_dups"))
    return agg.map_batches(
        lambda t: pa.table({
            "doc_id": pc.cast(t["keep_id"], pa.int64()),
            "n_dups": pc.cast(t["n_dups"], pa.int64()),
        }),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# exact n-gram Jaccard pairs

def ngram_jaccard_pairs(ds, *, n: int = 3, threshold: float = 0.1,
                        text_col: str = "text", id_col: str = "doc_id",
                        lowercase: bool = True,
                        max_group_docs: int = 2000):
    """Exact word-n-gram Jaccard similar pairs (doc_a < doc_b, jacc ≥ τ).

    shingle rows → groupby(shingle) pair emit → groupby(pair) count →
    join per-doc shingle-set sizes (hash join, NOT a broadcast dict) →
    filter.  ``max_group_docs`` caps the quadratic pair emission for a
    boilerplate shingle shared by huge numbers of docs: groups above the
    cap are skipped (such a shingle carries ~no similarity signal, and an
    uncapped group OOMs one reducer at web scale).  Exactness holds while
    no group exceeds the cap.

    Shingle strings never leave the producing batch: the shuffle carries a
    128-bit composite hash (two independent-seed xxhash64 columns) instead
    of raw n-gram text — several-fold fewer exchange bytes at corpus scale.
    Exact-match semantics hold w.h.p. (a cross-doc 128-bit collision would
    be needed to miscount one intersection element).
    """
    import pandas as pd

    def shingle_rows(batch: pa.Table) -> pa.Table:
        ids, shs = [], []
        for d, t in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            t = (t or "")
            if lowercase:
                t = t.lower()
            uniq = sorted(set(_word_shingles(t, n)))
            ids.extend([d] * len(uniq))
            shs.extend(uniq)
        if shs:
            lo, hi = _composite_hash(shs)
        else:
            lo = hi = np.empty(0, dtype=np.uint64)
        grp = (lo & np.uint64((1 << 10) - 1)).astype(np.int32)
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "sh_lo": pa.array(lo, type=pa.uint64()),
            "sh_hi": pa.array(hi, type=pa.uint64()),
            "grp": pa.array(grp, type=pa.int32()),
        })

    shingles = ds.map_batches(shingle_rows, batch_format="pyarrow")

    # per-doc shingle-set sizes: one row per doc, kept distributed and
    # joined against pairs below (a broadcast dict dies at 10^12 docs)
    from ray.data.aggregate import Count

    sizes_ds = shingles.groupby("doc_id").aggregate(Count(alias_name="n_sh"))

    def emit_pairs(group: pd.DataFrame) -> pd.DataFrame:
        # one coarse hash group; exact shingle-hash runs found by lexsort
        # on the 128-bit composite (per-SHINGLE map_groups would be one
        # Python call per near-singleton group)
        lo = group["sh_lo"].to_numpy()
        hi = group["sh_hi"].to_numpy()
        d = group["doc_id"].to_numpy()
        o, starts, sizes = _sorted_runs((lo, hi))
        d = d[o]
        out_a, out_b = [], []
        for s, z in zip(starts[sizes >= 2], sizes[sizes >= 2]):
            if z > max_group_docs:
                continue
            docs = np.sort(d[s: s + z])
            ii, jj = np.triu_indices(len(docs), k=1)
            out_a.append(docs[ii])
            out_b.append(docs[jj])
        if not out_a:
            return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                                 "b": pd.Series([], dtype=np.int64)})
        return pd.DataFrame({"a": np.concatenate(out_a),
                             "b": np.concatenate(out_b)})

    pairs = shingles.groupby("grp").map_groups(
        emit_pairs, batch_format="pandas")
    inter = pairs.groupby(["a", "b"]).aggregate(Count(alias_name="inter"))
    inter, n_cand = materialize_nonempty(inter, pa.table({
        "a": pa.array([], type=pa.int64()),
        "b": pa.array([], type=pa.int64()),
        "inter": pa.array([], type=pa.int64())}))
    if n_cand == 0:
        # Ray's hash join rejects an all-empty input even with a typed
        # schema — zero candidates means zero output, return it directly
        import ray.data

        return ray.data.from_arrow(pa.table({
            "doc_a": pa.array([], type=pa.int64()),
            "doc_b": pa.array([], type=pa.int64()),
            "jaccard": pa.array([], type=pa.float64())}))

    inter = inter.join(sizes_ds, join_type="inner",
                       num_partitions=join_partitions(n_cand),
                       on=("a",), right_on=("doc_id",), right_suffix="_a")
    inter = inter.rename_columns({"n_sh": "n_a"})
    # empty join partitions emit degenerate key+right-only blocks that
    # kill the next join's key resolution when the candidate set is small
    inter = drop_empty_blocks(inter, pa.table({
        "a": pa.array([], type=pa.int64()),
        "b": pa.array([], type=pa.int64()),
        "inter": pa.array([], type=pa.int64()),
        "n_a": pa.array([], type=pa.int64())}))
    inter = inter.join(sizes_ds, join_type="inner",
                       num_partitions=join_partitions(n_cand),
                       on=("b",), right_on=("doc_id",), right_suffix="_b")
    inter = inter.rename_columns({"n_sh": "n_b"})

    def jaccard_filter(batch: pa.Table) -> pa.Table:
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        inter_n = batch["inter"].to_numpy(zero_copy_only=False).astype(np.float64)
        na = batch["n_a"].to_numpy(zero_copy_only=False).astype(np.float64)
        nb = batch["n_b"].to_numpy(zero_copy_only=False).astype(np.float64)
        jacc = inter_n / (na + nb - inter_n)
        keep = jacc >= threshold
        return pa.table({
            "doc_a": pa.array(a[keep], type=pa.int64()),
            "doc_b": pa.array(b[keep], type=pa.int64()),
            "jaccard": pa.array(round_half_away(jacc[keep], 6), type=pa.float64()),
        })

    return inter.map_batches(jaccard_filter, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# MinHash + LSH

def minhash_signatures(ds, *, num_perm: int = 64, n: int = 3, seed: int = 7,
                       text_col: str = "text", id_col: str = "doc_id",
                       lowercase: bool = True, hash_fn: str = "xx"):
    """→ Dataset(doc_id, sig: list<uint64>[num_perm]).

    Vectorized per batch: all docs' unique shingles are hashed in ONE
    xxhash64 column call, permutation values are computed as (P, S) blocks,
    and per-doc minima come from ``np.minimum.reduceat`` over doc
    boundaries — no per-doc Python hashing.

    ``hash_fn="md5"``: component i = min over shingles of
    ``md5_number_lower(f"{i}:{shingle}")`` — no modular permutation
    arithmetic, so a DuckDB oracle can recompute the signatures exactly
    (uint64 (a·h+b) mod M wraps mod 2^64 in numpy, which SQL integer
    types can't replicate without overflow).  Oracle-compat mode; the
    default xxhash mode is the hot path."""
    a, b = _minhash_params(num_perm, seed)
    MAXU = np.iinfo(np.uint64).max

    def sig_batch(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        texts = batch[text_col].to_pylist()
        all_sh: List[str] = []
        counts = np.zeros(len(ids), dtype=np.int64)
        for i, t in enumerate(texts):
            t = (t or "")
            if lowercase:
                t = t.lower()
            sh = set(_word_shingles(t, n))
            counts[i] = len(sh)
            all_sh.extend(sh)
        sig_mat = np.full((len(ids), num_perm), MAXU, dtype=np.uint64)
        if all_sh:
            starts_all = np.concatenate(([0], np.cumsum(counts)[:-1]))
            nonempty = counts > 0
            starts = starts_all[nonempty]
            if hash_fn == "md5":
                for i in range(num_perm):
                    hv_i = _md5_u64_column([f"{i}:{s}" for s in all_sh])
                    sig_mat[nonempty, i] = np.minimum.reduceat(hv_i, starts)
            else:
                hv = _stable_u64_column(all_sh) % _MERSENNE       # (S,)
                # chunk the permutations so the (chunk, S) intermediate
                # stays small; reduceat folds each doc's range to its min
                for lo in range(0, num_perm, 16):
                    hi = min(lo + 16, num_perm)
                    perm = (a[lo:hi, None] * hv[None, :] + b[lo:hi, None]) \
                        % _MERSENNE                               # (c, S)
                    mins = np.minimum.reduceat(perm, starts, axis=1)
                    sig_mat[nonempty, lo:hi] = mins.T
        # MinHash is undefined on an empty shingle set: token-less docs
        # carry NO signature (an all-MAXU sentinel would pair every empty
        # doc as an est=1.0 dup and diverge from the SQL oracle, which
        # generates no shingle rows for them)
        keep = np.flatnonzero(counts > 0)
        return pa.table({
            "doc_id": pa.array([ids[i] for i in keep], type=pa.int64()),
            "sig": pa.array(list(sig_mat[keep]), type=pa.list_(pa.uint64())),
        })

    return ds.map_batches(sig_batch, batch_format="pyarrow")


# Group-count control for bucket-pair emission: grouping by exact
# (band, bucket) makes one Python map_groups call per ~singleton group
# (hundreds of thousands of them).  Instead rows group by a COARSE key
# (band + low bucket bits) — few thousand groups — and the exact-bucket
# pairing runs vectorized inside each group.
_COARSE_BITS = 8


def _band_rows_fn(bands: int, rows_per_band: int):
    def band_rows(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        sig_flat = np.asarray(
            batch["sig"].combine_chunks().flatten().to_numpy(
                zero_copy_only=False), dtype=np.uint64)
        D = len(ids)
        mat = sig_flat.reshape(D, bands, rows_per_band)
        # one vectorized mix per band instead of a per-(doc, band) blake2b
        buckets = np.stack([
            _mix_rows_u64(mat[:, bnd, :]) for bnd in range(bands)], axis=1)
        band_col = np.tile(np.arange(bands, dtype=np.int64), D)
        bucket_col = (buckets.reshape(-1) >> np.uint64(1)).astype(np.int64)
        coarse = (band_col << _COARSE_BITS) \
            | (bucket_col & ((1 << _COARSE_BITS) - 1))
        return pa.table({
            "doc_id": pa.array(np.repeat(ids, bands), type=pa.int64()),
            "band": pa.array(band_col.astype(np.int32), type=pa.int32()),
            "bucket": pa.array(bucket_col, type=pa.int64()),
            "grp": pa.array(coarse.astype(np.int32), type=pa.int32()),
        })
    return band_rows


def _emit_bucket_pairs(group) -> "pa.Table":
    """Vectorized pair emission for ONE coarse group: find exact
    (band, bucket) runs with a lexsort, emit triangular pairs only for the
    (rare) runs holding ≥2 docs."""
    import pandas as pd

    b = group["band"].to_numpy()
    k = group["bucket"].to_numpy()
    d = group["doc_id"].to_numpy()
    o, starts, sizes = _sorted_runs((b, k), (d,))
    d = d[o]
    out_a, out_b = [], []
    for s, z in zip(starts[sizes >= 2], sizes[sizes >= 2]):
        docs = np.unique(d[s: s + z])
        if len(docs) < 2:
            continue
        ii, jj = np.triu_indices(len(docs), k=1)
        out_a.append(docs[ii])
        out_b.append(docs[jj])
    if not out_a:
        return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                             "b": pd.Series([], dtype=np.int64)})
    return pd.DataFrame({"a": np.concatenate(out_a),
                         "b": np.concatenate(out_b)})


def _empty_doc_pairs(ds, *, n: int, text_col: str, id_col: str,
                     lowercase: bool = True, score_col: str = "est_jaccard"):
    """Exact-duplicate pairs among SHINGLE-LESS docs (empty or
    whitespace-only text): MinHash is undefined on an empty shingle set, so the
    minhash ops cannot see them — but two IDENTICAL token-less documents
    are trivially exact duplicates, and a training-data dedup that
    silently misses them is wrong.  Routes them through exact-dedup
    semantics: group by the 128-bit hash of the normalized text (distinct
    short texts never pair) and emit (representative=min doc_id, other)
    rows — LINEAR per group, never the quadratic all-pairs.  Returns
    (doc_a, doc_b, <score_col>=1.0); None shape matches the minhash ops'
    pair schema for a lazy union."""
    import pandas as pd

    def empties(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        texts = batch[text_col].to_pylist()
        keep_ids, keep_txt = [], []
        for d, t in zip(ids, texts):
            t = (t or "")
            # shingle-less <=> token-less: _word_shingles returns [] iff
            # text.split() is empty, so no shingle strings are built in
            # this whole-corpus scan; normalize only the few kept texts
            if not t.split():
                keep_ids.append(d)
                keep_txt.append(t.lower() if lowercase else t)
        if keep_txt:
            h1, h2 = _composite_hash(keep_txt)
        else:
            h1 = h2 = np.empty(0, dtype=np.uint64)
        grp = (h1 & np.uint64((1 << 10) - 1)).astype(np.int32)
        return pa.table({
            "doc_id": pa.array(keep_ids, type=pa.int64()),
            "h1": pa.array(h1, type=pa.uint64()),
            "h2": pa.array(h2, type=pa.uint64()),
            "grp": pa.array(grp, type=pa.int32()),
        })

    def emit(group: pd.DataFrame) -> pd.DataFrame:
        h1 = group["h1"].to_numpy()
        h2 = group["h2"].to_numpy()
        d = group["doc_id"].to_numpy()
        o, starts, sizes = _sorted_runs((h1, h2), (d,))
        d = d[o]
        oa, ob = [], []
        for s, z in zip(starts[sizes >= 2], sizes[sizes >= 2]):
            oa.append(np.full(z - 1, d[s], dtype=np.int64))
            ob.append(d[s + 1: s + z])
        if not oa:
            return pd.DataFrame({
                "doc_a": pd.Series([], dtype=np.int64),
                "doc_b": pd.Series([], dtype=np.int64),
                score_col: pd.Series([], dtype=np.float64)})
        a = np.concatenate(oa)
        return pd.DataFrame({"doc_a": a, "doc_b": np.concatenate(ob),
                             score_col: np.ones(len(a), dtype=np.float64)})

    return (ds.map_batches(empties, batch_format="pyarrow")
            .groupby("grp").map_groups(emit, batch_format="pandas"))


def minhash_lsh_pairs(ds, *, num_perm: int = 64, bands: int = 16, n: int = 3,
                      seed: int = 7, text_col: str = "text",
                      id_col: str = "doc_id", verify_threshold: float = 0.5,
                      verify_mode: str = "carry", hash_fn: str = "xx",
                      empty_docs: str = "drop"):
    """MinHash-LSH near-dup pairs, verified by signature similarity
    (fraction of equal components ≥ τ).

    ``empty_docs``: MinHash is undefined on an empty shingle set, so
    SHINGLE-LESS docs (empty or whitespace-only text; short non-empty
    texts still get one whole-text shingle) are EXCLUDED from candidate
    generation — ``"drop"`` (default, and
    what the SQL oracle computes) omits them from the output entirely;
    ``"exact"`` additionally emits (representative, other, 1.0) pairs for
    groups of IDENTICAL normalized token-less texts (exact-dedup
    semantics, see :func:`_empty_doc_pairs`) so the dedup capability
    doesn't silently miss them.

    ``verify_mode="carry"`` (default): the packed signature rides through
    the banding shuffle, so candidate emission AND verification happen
    inside the bucket groups, and each pair is emitted only in its FIRST
    colliding band (earlier bands' buckets recompute from the carried
    signatures for the few verified pairs) — TWO distributed ops total
    (signatures → groupby(bucket-group)), no distinct-aggregate shuffle.
    The extra shuffle volume is bands × sig bytes per doc (linear in
    docs, distributed).

    ``verify_mode="join"``: banding ships only (band, bucket, doc_id);
    candidate pairs JOIN back to the signature dataset for verification —
    minimal shuffle bytes, the extreme-scale mode.  Both modes avoid any
    whole-dataset driver/broadcast materialization (round 1's broadcast of
    the full signature matrix — 512 GB at 10^9 docs — is gone).
    """
    import pandas as pd

    assert num_perm % bands == 0
    if empty_docs not in ("drop", "exact"):
        raise ValueError(f"empty_docs must be 'drop' or 'exact', "
                         f"got {empty_docs!r}")
    rows_per_band = num_perm // bands
    sigs = minhash_signatures(ds, num_perm=num_perm, n=n, seed=seed,
                              text_col=text_col, id_col=id_col,
                              hash_fn=hash_fn)

    def _with_empties(pairs_ds):
        if empty_docs != "exact":
            return pairs_ds
        return pairs_ds.union(_empty_doc_pairs(
            ds, n=n, text_col=text_col, id_col=id_col,
            score_col="est_jaccard"))

    if verify_mode == "carry":
        def band_sig_rows(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].to_numpy(zero_copy_only=False)
            sig_flat = np.asarray(
                batch["sig"].combine_chunks().flatten().to_numpy(
                    zero_copy_only=False), dtype=np.uint64)
            D = len(ids)
            mat = sig_flat.reshape(D, bands, rows_per_band)
            buckets = np.stack([
                _mix_rows_u64(mat[:, bnd, :]) for bnd in range(bands)],
                axis=1)
            band_col = np.tile(np.arange(bands, dtype=np.int64), D)
            bucket_col = (buckets.reshape(-1) >> np.uint64(1)) \
                .astype(np.int64)
            coarse = ((band_col << _COARSE_BITS)
                      | (bucket_col & ((1 << _COARSE_BITS) - 1))) \
                .astype(np.int32)
            sig_bytes = sig_flat.reshape(D, num_perm)
            sigb = np.asarray([sig_bytes[i].tobytes() for i in range(D)],
                              dtype=object)
            return pa.table({
                "doc_id": pa.array(np.repeat(ids, bands), type=pa.int64()),
                "band": pa.array(band_col.astype(np.int32), type=pa.int32()),
                "bucket": pa.array(bucket_col, type=pa.int64()),
                "grp": pa.array(coarse, type=pa.int32()),
                "sigb": pa.array(np.repeat(sigb, bands), type=pa.binary()),
            })

        banded = sigs.map_batches(band_sig_rows, batch_format="pyarrow")

        def emit_verified(group: pd.DataFrame) -> pd.DataFrame:
            b = group["band"].to_numpy()
            k = group["bucket"].to_numpy()
            d = group["doc_id"].to_numpy()
            sraw = group["sigb"].to_numpy()
            o, starts, sizes = _sorted_runs((b, k), (d,))
            b, d, sraw = b[o], d[o], sraw[o]
            oa, ob, oe = [], [], []
            for s, z in zip(starts[sizes >= 2], sizes[sizes >= 2]):
                dd, idx = np.unique(d[s: s + z], return_index=True)
                if len(dd) < 2:
                    continue
                smat = np.frombuffer(
                    b"".join(sraw[s: s + z][idx]),
                    dtype=np.uint64).reshape(len(dd), num_perm)
                ii, jj = np.triu_indices(len(dd), k=1)
                est = (smat[ii] == smat[jj]).mean(axis=1)
                keep = est >= verify_threshold
                bnd = int(b[s])
                if bnd > 0 and keep.any():
                    # first-collision dedup: emit a pair only in the
                    # FIRST band whose buckets collide — earlier-band
                    # buckets recompute from the carried signatures
                    # (pairs only, cheap), so the global pair set needs
                    # no distinct-aggregate shuffle afterwards
                    ki, kj = ii[keep], jj[keep]
                    docs_in_pairs = np.unique(np.concatenate([ki, kj]))
                    sub = smat[docs_in_pairs].reshape(
                        len(docs_in_pairs), bands, rows_per_band)
                    mixes = np.stack(
                        [_mix_rows_u64(sub[:, e, :]) >> np.uint64(1)
                         for e in range(bnd)], axis=1)
                    pos = np.searchsorted(docs_in_pairs, ki)
                    qos = np.searchsorted(docs_in_pairs, kj)
                    first = ~(mixes[pos] == mixes[qos]).any(axis=1)
                    sel = np.flatnonzero(keep)[first]
                    keep = np.zeros(len(est), dtype=bool)
                    keep[sel] = True
                oa.append(dd[ii][keep])
                ob.append(dd[jj][keep])
                oe.append(est[keep])
            if not oa:
                return pd.DataFrame({
                    "doc_a": pd.Series([], dtype=np.int64),
                    "doc_b": pd.Series([], dtype=np.int64),
                    "est_jaccard": pd.Series([], dtype=np.float64)})
            return pd.DataFrame({
                "doc_a": np.concatenate(oa),
                "doc_b": np.concatenate(ob),
                "est_jaccard": round_half_away(np.concatenate(oe), 6)})

        # first-collision emission above makes pairs globally unique —
        # two distributed ops total (banding map → bucket groupby), no
        # distinct-aggregate shuffle of the candidate pairs
        return _with_empties(banded.groupby("grp").map_groups(
            emit_verified, batch_format="pandas"))

    banded = sigs.map_batches(_band_rows_fn(bands, rows_per_band),
                              batch_format="pyarrow")

    pairs = banded.groupby("grp").map_groups(
        _emit_bucket_pairs, batch_format="pandas")
    # distinct pairs via the vectorized hash aggregate (a map_groups
    # head(1) would again be one Python call per pair)
    from ray.data.aggregate import Count

    uniq = pairs.groupby(["a", "b"]).aggregate(
        Count(alias_name="_n")).drop_columns(["_n"])
    uniq, n_cand = materialize_nonempty(uniq, pa.table({
        "a": pa.array([], type=pa.int64()),
        "b": pa.array([], type=pa.int64())}))
    _empty_pairs = pa.table({
        "doc_a": pa.array([], type=pa.int64()),
        "doc_b": pa.array([], type=pa.int64()),
        "est_jaccard": pa.array([], type=pa.float64())})
    if n_cand == 0:
        # zero candidates: the verify joins cannot run on an all-empty
        # input — short-circuit (empty_docs='exact' pairs still union in)
        import ray.data

        return _with_empties(ray.data.from_arrow(_empty_pairs))

    # join payloads must be binary, not list<u64> (Arrow's hash join
    # rejects list non-key fields) — pack each signature to bytes
    def to_binary(t: pa.Table) -> pa.Table:
        flat = np.asarray(t["sig"].combine_chunks().flatten().to_numpy(
            zero_copy_only=False), dtype=np.uint64).reshape(t.num_rows, -1)
        return pa.table({
            "doc_id": t["doc_id"],
            "sigb": pa.array([r.tobytes() for r in flat], type=pa.binary()),
        })

    sigb = sigs.map_batches(to_binary, batch_format="pyarrow")
    withsig = uniq.join(sigb, join_type="inner",
                        num_partitions=join_partitions(n_cand),
                        on=("a",), right_on=("doc_id",))
    withsig = withsig.rename_columns({"sigb": "sig_a"})
    # same degenerate-empty-partition hazard as minhash_jaccard_dups:
    # chained joins die on the key+right-only blocks an empty partition
    # emits when the candidate set is small
    withsig = drop_empty_blocks(withsig, pa.table({
        "a": pa.array([], type=pa.int64()),
        "b": pa.array([], type=pa.int64()),
        "sig_a": pa.array([], type=pa.binary())}))
    withsig = withsig.join(sigb, join_type="inner",
                           num_partitions=join_partitions(n_cand),
                           on=("b",), right_on=("doc_id",))
    withsig = withsig.rename_columns({"sigb": "sig_b"})

    def verify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"doc_a": pa.array([], type=pa.int64()),
                             "doc_b": pa.array([], type=pa.int64()),
                             "est_jaccard": pa.array([], type=pa.float64())})
        a = batch["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        sa = np.frombuffer(b"".join(batch["sig_a"].to_pylist()),
                           dtype=np.uint64).reshape(len(a), -1)
        sb = np.frombuffer(b"".join(batch["sig_b"].to_pylist()),
                           dtype=np.uint64).reshape(len(b), -1)
        est = (sa == sb).mean(axis=1)
        keep = est >= verify_threshold
        order = np.lexsort((b[keep], a[keep]))
        return pa.table({
            "doc_a": pa.array(a[keep][order], type=pa.int64()),
            "doc_b": pa.array(b[keep][order], type=pa.int64()),
            "est_jaccard": pa.array(round_half_away(est[keep][order], 6),
                                    type=pa.float64()),
        })

    return _with_empties(withsig.map_batches(verify, batch_format="pyarrow"))


def minhash_jaccard_dups(ds, *, num_perm: int = 64, bands: int = 16,
                         n: int = 3, seed: int = 7, text_col: str = "text",
                         id_col: str = "doc_id", threshold: float = 0.9,
                         empty_docs: str = "drop"):
    """Near-duplicate pairs with EXACT word-n-gram Jaccard ≥ τ, found via
    MinHash-LSH candidates and verified exactly against the document text.

    With τ ≥ 0.9 and (bands=16, rows=4) the probability a qualifying pair
    misses every band is ≤ ~1e-7, so the output equals the exhaustive
    exact-Jaccard pair set w.h.p. — which is what the SQL oracle computes.
    The verify joins candidate pairs back to the document text (text ships
    only for candidates, never broadcast).

    ``empty_docs``: shingle-less docs (empty or whitespace-only text)
    have undefined Jaccard and are EXCLUDED under ``"drop"`` (default,
    oracle-matching); ``"exact"`` emits (representative, other, 1.0)
    pairs for identical normalized token-less texts (exact-dedup
    semantics) so they aren't silently missed."""
    if empty_docs not in ("drop", "exact"):
        raise ValueError(f"empty_docs must be 'drop' or 'exact', "
                         f"got {empty_docs!r}")
    pairs = minhash_lsh_pairs(ds, num_perm=num_perm, bands=bands, n=n,
                              seed=seed, text_col=text_col, id_col=id_col,
                              verify_threshold=0.0)
    # the carry-mode map_groups emits empty frames for pair-less groups;
    # those schema-less blocks kill the Arrow hash join below when the
    # candidate set is tiny — and the join rejects an ALL-empty input
    # outright, so zero candidates short-circuits the text-verify chain
    pairs, n_cand = materialize_nonempty(pairs, pa.table({
        "doc_a": pa.array([], type=pa.int64()),
        "doc_b": pa.array([], type=pa.int64()),
        "est_jaccard": pa.array([], type=pa.float64())}))
    if n_cand == 0:
        import ray.data

        verified = ray.data.from_arrow(pa.table({
            "doc_a": pa.array([], type=pa.int64()),
            "doc_b": pa.array([], type=pa.int64()),
            "jaccard": pa.array([], type=pa.float64())}))
        if empty_docs == "exact":
            verified = verified.union(_empty_doc_pairs(
                ds, n=n, text_col=text_col, id_col=id_col,
                score_col="jaccard"))
        return verified
    docs = ds.map_batches(
        lambda t: pa.table({"doc_id": pc.cast(t[id_col], pa.int64()),
                            "_text": t[text_col]}),
        batch_format="pyarrow")
    wp = pairs.join(docs, join_type="inner", num_partitions=join_partitions(n_cand),
                    on=("doc_a",), right_on=("doc_id",))
    wp = wp.rename_columns({"_text": "text_a"})
    # empty join partitions emit blocks with a degenerate key+right-side
    # schema; the NEXT join dies on them ("no match … for doc_b on left
    # side") when the candidate set is small — rebuild from non-empty
    # blocks (candidate pairs only, cheap)
    wp = drop_empty_blocks(wp, pa.table({
        "doc_a": pa.array([], type=pa.int64()),
        "doc_b": pa.array([], type=pa.int64()),
        "est_jaccard": pa.array([], type=pa.float64()),
        "text_a": pa.array([], type=pa.string())}))
    wp = wp.join(docs, join_type="inner", num_partitions=join_partitions(n_cand),
                 on=("doc_b",), right_on=("doc_id",))
    wp = wp.rename_columns({"_text": "text_b"})
    wp = drop_empty_blocks(wp, pa.table({
        "doc_a": pa.array([], type=pa.int64()),
        "doc_b": pa.array([], type=pa.int64()),
        "est_jaccard": pa.array([], type=pa.float64()),
        "text_a": pa.array([], type=pa.string()),
        "text_b": pa.array([], type=pa.string())}))

    def exact_verify(batch: pa.Table) -> pa.Table:
        out_a, out_b, out_j = [], [], []
        for a_id, b_id, ta, tb in zip(batch["doc_a"].to_pylist(),
                                      batch["doc_b"].to_pylist(),
                                      batch["text_a"].to_pylist(),
                                      batch["text_b"].to_pylist()):
            sa = set(_word_shingles((ta or "").lower(), n))
            sb = set(_word_shingles((tb or "").lower(), n))
            if not sa or not sb:
                continue
            j = len(sa & sb) / len(sa | sb)
            if j >= threshold:
                out_a.append(a_id)
                out_b.append(b_id)
                out_j.append(j)
        return pa.table({
            "doc_a": pa.array(out_a, type=pa.int64()),
            "doc_b": pa.array(out_b, type=pa.int64()),
            "jaccard": pa.array(round_half_away(np.asarray(out_j), 6),
                                type=pa.float64()),
        })

    verified = wp.map_batches(exact_verify, batch_format="pyarrow")
    if empty_docs == "exact":
        verified = verified.union(_empty_doc_pairs(
            ds, n=n, text_col=text_col, id_col=id_col,
            score_col="jaccard"))
    return verified


# ---------------------------------------------------------------------------
# SimHash

def simhash_fingerprints(ds, *, text_col: str = "text", id_col: str = "doc_id",
                         lowercase: bool = True, hash_fn: str = "xx"):
    """→ Dataset(doc_id, simhash:uint64) — 64-bit token-weighted simhash.

    Vectorized per batch: one xxhash64 call over every doc's unique tokens,
    bit votes folded per doc with ``np.add.reduceat``."""
    def fp_batch(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        texts = batch[text_col].to_pylist()
        all_toks: List[str] = []
        all_counts: List[np.ndarray] = []
        nuniq = np.zeros(len(ids), dtype=np.int64)
        for i, t in enumerate(texts):
            t = (t or "")
            if lowercase:
                t = t.lower()
            toks = t.split()
            if toks:
                uniq, cnt = np.unique(np.asarray(toks, dtype=object),
                                      return_counts=True)
                nuniq[i] = len(uniq)
                all_toks.extend(uniq.tolist())
                all_counts.append(cnt)
        fps = np.zeros(len(ids), dtype=np.uint64)
        if all_toks:
            hv = _hash_u64_column(all_toks, hash_fn)           # (N,)
            cnts = np.concatenate(all_counts)                  # (N,)
            bits = ((hv[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                    & np.uint64(1)).astype(np.int64)           # (N, 64)
            weighted = (bits * 2 - 1) * cnts[:, None]
            starts_all = np.concatenate(([0], np.cumsum(nuniq)[:-1]))
            nonempty = nuniq > 0
            votes = np.add.reduceat(weighted, starts_all[nonempty], axis=0)
            pos = (votes > 0).astype(np.uint64)                # (D', 64)
            vals = (pos << np.arange(64, dtype=np.uint64)[None, :]) \
                .sum(axis=1, dtype=np.uint64)
            fps[nonempty] = vals
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "simhash": pa.array(fps, type=pa.uint64()),
        })

    return ds.map_batches(fp_batch, batch_format="pyarrow")


def simhash_pairs(ds, *, max_hamming: int = 3, text_col: str = "text",
                  id_col: str = "doc_id", hash_fn: str = "xx"):
    """Near-dup pairs with Hamming(simhash) ≤ k via 4×16-bit banded buckets.

    Recall is EXACT for ``max_hamming ≤ 3`` (pigeonhole: ≤3 differing bits
    over 4 bands leave one band intact); beyond 3 the banding is a recall
    heuristic — use more/narrower bands if exactness at higher radii is
    required."""
    import pandas as pd

    fps = simhash_fingerprints(ds, text_col=text_col, id_col=id_col,
                               hash_fn=hash_fn)

    def band_rows(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        h = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        out_i, out_b, out_k, out_h = [], [], [], []
        for bnd in range(4):
            chunk = (h >> np.uint64(16 * bnd)) & np.uint64(0xFFFF)
            out_i.append(ids)
            out_b.append(np.full(len(ids), bnd, dtype=np.int64))
            out_k.append(chunk.astype(np.int64))
            out_h.append(h)
        band_col = np.concatenate(out_b)
        key_col = np.concatenate(out_k)
        coarse = ((band_col << _COARSE_BITS)
                  | (key_col & ((1 << _COARSE_BITS) - 1))).astype(np.int32)
        return pa.table({
            "doc_id": pa.array(np.concatenate(out_i), type=pa.int64()),
            "band": pa.array(band_col.astype(np.int32), type=pa.int32()),
            "key": pa.array(key_col, type=pa.int64()),
            "grp": pa.array(coarse, type=pa.int32()),
            "simhash": pa.array(np.concatenate(out_h), type=pa.uint64()),
        })

    banded = fps.map_batches(band_rows, batch_format="pyarrow")

    def emit_verified(group: pd.DataFrame) -> pd.DataFrame:
        # vectorized exact-(band, key) runs inside one coarse group
        b = group["band"].to_numpy()
        k = group["key"].to_numpy()
        d = group["doc_id"].to_numpy()
        h = group["simhash"].to_numpy().astype(np.uint64)
        o, starts, sizes = _sorted_runs((b, k), (d,))
        d, h = d[o], h[o]
        das, dbs, hams = [], [], []
        for s, z in zip(starts[sizes >= 2], sizes[sizes >= 2]):
            dd, idx = np.unique(d[s: s + z], return_index=True)
            if len(dd) < 2:
                continue
            hh = h[s: s + z][idx]
            ii, jj = np.triu_indices(len(dd), k=1)
            x = hh[ii] ^ hh[jj]
            ham = np.array([bin(int(v)).count("1") for v in x])
            keep = ham <= max_hamming
            das.append(dd[ii][keep])
            dbs.append(dd[jj][keep])
            hams.append(ham[keep])
        if not das:
            return pd.DataFrame({
                "doc_a": pd.Series([], dtype=np.int64),
                "doc_b": pd.Series([], dtype=np.int64),
                "hamming": pd.Series([], dtype=np.int64)})
        return pd.DataFrame({"doc_a": np.concatenate(das),
                             "doc_b": np.concatenate(dbs),
                             "hamming": np.concatenate(hams)})

    pairs = banded.groupby("grp").map_groups(
        emit_verified, batch_format="pandas")
    from ray.data.aggregate import Min

    dedup = pairs.groupby(["doc_a", "doc_b"]).aggregate(
        Min("hamming", alias_name="hamming_min"))
    return dedup.map_batches(
        lambda t: pa.table({
            "doc_a": pc.cast(t["doc_a"], pa.int64()),
            "doc_b": pc.cast(t["doc_b"], pa.int64()),
            "hamming": pc.cast(t["hamming_min"], pa.int64()),
        }),
        batch_format="pyarrow")
