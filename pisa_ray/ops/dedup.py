"""Deduplication operators over a document Dataset.

Large-scale training-data pipeline primitives, all expressed Ray-Data-first:

* exact dedup            — content-hash column → groupby(hash) keep-first
* n-gram Jaccard pairs   — shingle explode → groupby(shingle) pair emit →
                           groupby(pair) count → Jaccard filter (exact)
* MinHash + LSH          — per-doc signatures → band rows →
                           groupby(band, bucket) candidate pairs (approx)
* SimHash                — 64-bit fingerprints → banded buckets →
                           Hamming-verified near-dup pairs

All hashing is seed-stable (blake2b-derived), never Python ``hash()``
(PYTHONHASHSEED would break determinism across workers).  The reference
engine has no near-dup machinery (SURVEY §2.8) — these extend it with the
dedup stack a 100 TB web-text pipeline needs.
"""

from __future__ import annotations

import hashlib
from typing import Dict, List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from pisa_ray.utils import round_half_away


# ---------------------------------------------------------------------------
# stable hashing

def _stable_u64(values: List[str]) -> np.ndarray:
    """blake2b-based stable 64-bit hashes of strings."""
    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        out[i] = int.from_bytes(
            hashlib.blake2b(v.encode("utf-8"), digest_size=8).digest(), "little")
    return out


_MERSENNE = (1 << 61) - 1


def _minhash_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


def _word_shingles(text: str, n: int = 3) -> List[str]:
    toks = text.split()
    if len(toks) < n:
        return [" ".join(toks)] if toks else []
    return [" ".join(toks[i: i + n]) for i in range(len(toks) - n + 1)]


# ---------------------------------------------------------------------------
# exact dedup

def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id",
                normalize: bool = True):
    """→ Dataset(doc_id = min id per duplicate group, n_dups).

    Hash column added vectorized per batch; the groupby shuffles only
    (hash, id) pairs, never the text."""
    def add_hash(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        if normalize:
            texts = [t.lower() if t else "" for t in texts]
        digests = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]
        return pa.table({
            "content_hash": pa.array(digests, type=pa.string()),
            id_col: batch[id_col],
        })

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")
    from ray.data.aggregate import Count, Min

    agg = hashed.groupby("content_hash").aggregate(
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
                        lowercase: bool = True):
    """Exact word-n-gram Jaccard similar pairs (doc_a < doc_b, jacc ≥ τ).

    shingle rows → groupby(shingle).map_groups(emit pairs) →
    groupby(pair).count → join shingle-set sizes (broadcast) → filter.
    Skewed shingles (present in many docs) blow up quadratically — the
    broadcast-size path is exact; cap group emission at scale with MinHash
    (``minhash_lsh_pairs``) instead.
    """
    import ray
    import pandas as pd

    def shingle_rows(batch: pa.Table) -> pa.Table:
        ids, shs = [], []
        sizes_id, sizes_n = [], []
        for d, t in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            t = (t or "")
            if lowercase:
                t = t.lower()
            uniq = sorted(set(_word_shingles(t, n)))
            ids.extend([d] * len(uniq))
            shs.extend(uniq)
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "shingle": pa.array(shs, type=pa.string()),
        })

    shingles = ds.map_batches(shingle_rows, batch_format="pyarrow")

    # per-doc shingle-set sizes (small: one row per doc)
    from ray.data.aggregate import Count

    sizes_ds = shingles.groupby("doc_id").aggregate(Count(alias_name="n_sh"))
    sizes_pd = sizes_ds.to_pandas()  # num_docs rows — broadcastable
    sizes_ref = ray.put(dict(zip(sizes_pd["doc_id"], sizes_pd["n_sh"])))

    def emit_pairs(group: pd.DataFrame) -> pd.DataFrame:
        docs = np.sort(group["doc_id"].to_numpy())
        if len(docs) < 2:
            return pd.DataFrame({"a": [], "b": []})
        ii, jj = np.triu_indices(len(docs), k=1)
        return pd.DataFrame({"a": docs[ii], "b": docs[jj]})

    pairs = shingles.groupby("shingle").map_groups(
        emit_pairs, batch_format="pandas")
    inter = pairs.groupby(["a", "b"]).aggregate(Count(alias_name="inter"))

    def jaccard_filter(batch: pa.Table) -> pa.Table:
        sizes: Dict[int, int] = _cached_get_sizes(sizes_ref)
        a = batch["a"].to_numpy(zero_copy_only=False)
        b = batch["b"].to_numpy(zero_copy_only=False)
        inter_n = batch["inter"].to_numpy(zero_copy_only=False).astype(np.float64)
        na = np.array([sizes[x] for x in a], dtype=np.float64)
        nb = np.array([sizes[x] for x in b], dtype=np.float64)
        jacc = inter_n / (na + nb - inter_n)
        keep = jacc >= threshold
        return pa.table({
            "doc_a": pa.array(a[keep], type=pa.int64()),
            "doc_b": pa.array(b[keep], type=pa.int64()),
            "jaccard": pa.array(round_half_away(jacc[keep], 6), type=pa.float64()),
        })

    return inter.map_batches(jaccard_filter, batch_format="pyarrow")


_SIZES_CACHE: Dict = {}


def _cached_get_sizes(ref):
    import ray

    val = _SIZES_CACHE.get(ref)
    if val is None:
        val = ray.get(ref)
        _SIZES_CACHE[ref] = val
    return val


# ---------------------------------------------------------------------------
# MinHash + LSH

def minhash_signatures(ds, *, num_perm: int = 64, n: int = 3, seed: int = 7,
                       text_col: str = "text", id_col: str = "doc_id",
                       lowercase: bool = True):
    """→ Dataset(doc_id, sig: list<uint64>[num_perm]) — vectorized minhash
    over stable shingle hashes."""
    a, b = _minhash_params(num_perm, seed)

    def sig_batch(batch: pa.Table) -> pa.Table:
        ids, sigs = [], []
        for d, t in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            t = (t or "")
            if lowercase:
                t = t.lower()
            sh = list(set(_word_shingles(t, n)))
            if not sh:
                sigs.append(np.full(num_perm, np.iinfo(np.uint64).max,
                                    dtype=np.uint64).tolist())
                ids.append(d)
                continue
            hv = _stable_u64(sh) % _MERSENNE           # (S,)
            # (P, S) permutation values, min over shingles
            perm = (a[:, None] * hv[None, :] + b[:, None]) % _MERSENNE
            sigs.append(perm.min(axis=1).tolist())
            ids.append(d)
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "sig": pa.array(sigs, type=pa.list_(pa.uint64())),
        })

    return ds.map_batches(sig_batch, batch_format="pyarrow")


def minhash_lsh_pairs(ds, *, num_perm: int = 64, bands: int = 16, n: int = 3,
                      seed: int = 7, text_col: str = "text",
                      id_col: str = "doc_id", verify_threshold: float = 0.5):
    """MinHash-LSH candidate pairs, verified by signature similarity.

    signatures → explode to (band_id, bucket_hash, doc_id) rows →
    groupby(band, bucket) pair emission → distinct pairs → verify estimated
    Jaccard (fraction of equal signature components) ≥ τ using a broadcast
    signature matrix.  Pure shuffle-based banding: scales linearly in docs.
    """
    import ray
    import pandas as pd

    assert num_perm % bands == 0
    rows_per_band = num_perm // bands
    sigs = minhash_signatures(ds, num_perm=num_perm, n=n, seed=seed,
                              text_col=text_col, id_col=id_col)

    sig_pd = sigs.to_pandas()  # one row per doc; broadcastable at test scale
    sig_matrix = np.array(sig_pd["sig"].tolist(), dtype=np.uint64)
    doc_ids = sig_pd["doc_id"].to_numpy()
    id_to_row = {int(d): i for i, d in enumerate(doc_ids)}
    sig_ref = ray.put((sig_matrix, id_to_row))

    def band_rows(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        sig_lists = batch["sig"].to_pylist()
        out_id, out_band, out_bucket = [], [], []
        for d, s in zip(ids, sig_lists):
            arr = np.asarray(s, dtype=np.uint64)
            for bnd in range(bands):
                chunk = arr[bnd * rows_per_band: (bnd + 1) * rows_per_band]
                digest = hashlib.blake2b(chunk.tobytes(), digest_size=8).digest()
                out_id.append(d)
                out_band.append(bnd)
                out_bucket.append(int.from_bytes(digest, "little") >> 1)
        return pa.table({
            "doc_id": pa.array(out_id, type=pa.int64()),
            "band": pa.array(out_band, type=pa.int32()),
            "bucket": pa.array(out_bucket, type=pa.int64()),
        })

    banded = sigs.map_batches(band_rows, batch_format="pyarrow")

    def emit_pairs(group: pd.DataFrame) -> pd.DataFrame:
        docs = np.sort(group["doc_id"].unique())
        if len(docs) < 2:
            return pd.DataFrame({"a": [], "b": []})
        ii, jj = np.triu_indices(len(docs), k=1)
        return pd.DataFrame({"a": docs[ii], "b": docs[jj]})

    pairs = banded.groupby(["band", "bucket"]).map_groups(
        emit_pairs, batch_format="pandas")
    uniq = pairs.groupby(["a", "b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas")

    def verify(batch: pa.Table) -> pa.Table:
        mat, idmap = _cached_get_sizes(sig_ref)
        a = batch["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        ra = np.array([idmap[int(x)] for x in a])
        rb = np.array([idmap[int(x)] for x in b])
        est = (mat[ra] == mat[rb]).mean(axis=1)
        keep = est >= verify_threshold
        return pa.table({
            "doc_a": pa.array(a[keep], type=pa.int64()),
            "doc_b": pa.array(b[keep], type=pa.int64()),
            "est_jaccard": pa.array(round_half_away(est[keep], 6), type=pa.float64()),
        })

    return uniq.map_batches(verify, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SimHash

def simhash_fingerprints(ds, *, text_col: str = "text", id_col: str = "doc_id",
                         lowercase: bool = True):
    """→ Dataset(doc_id, simhash:uint64) — 64-bit token-weighted simhash."""
    def fp_batch(batch: pa.Table) -> pa.Table:
        ids, fps = [], []
        for d, t in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            t = (t or "")
            if lowercase:
                t = t.lower()
            toks = t.split()
            if not toks:
                ids.append(d)
                fps.append(0)
                continue
            uniq, counts = np.unique(np.asarray(toks, dtype=object),
                                     return_counts=True)
            hv = _stable_u64(list(uniq))
            bits = ((hv[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                    & np.uint64(1)).astype(np.int64)
            votes = ((bits * 2 - 1) * counts[:, None]).sum(axis=0)
            fp = np.uint64(0)
            for k in np.flatnonzero(votes > 0):
                fp |= np.uint64(1) << np.uint64(k)
            ids.append(d)
            fps.append(int(fp))
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "simhash": pa.array(fps, type=pa.uint64()),
        })

    return ds.map_batches(fp_batch, batch_format="pyarrow")


def simhash_pairs(ds, *, max_hamming: int = 3, text_col: str = "text",
                  id_col: str = "doc_id"):
    """Near-dup pairs with Hamming(simhash) ≤ k via 4×16-bit banded buckets
    (any pair within Hamming ≤ 3 shares at least one of 4 bands)."""
    import pandas as pd

    fps = simhash_fingerprints(ds, text_col=text_col, id_col=id_col)

    def band_rows(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        h = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        out_i, out_b, out_k, out_h = [], [], [], []
        for bnd in range(4):
            chunk = (h >> np.uint64(16 * bnd)) & np.uint64(0xFFFF)
            out_i.append(ids)
            out_b.append(np.full(len(ids), bnd, dtype=np.int32))
            out_k.append(chunk.astype(np.int64))
            out_h.append(h)
        return pa.table({
            "doc_id": pa.array(np.concatenate(out_i), type=pa.int64()),
            "band": pa.array(np.concatenate(out_b), type=pa.int32()),
            "key": pa.array(np.concatenate(out_k), type=pa.int64()),
            "simhash": pa.array(np.concatenate(out_h), type=pa.uint64()),
        })

    banded = fps.map_batches(band_rows, batch_format="pyarrow")

    def emit_verified(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates("doc_id").sort_values("doc_id")
        docs = g["doc_id"].to_numpy()
        hs = g["simhash"].to_numpy().astype(np.uint64)
        if len(docs) < 2:
            return pd.DataFrame({"doc_a": [], "doc_b": [], "hamming": []})
        ii, jj = np.triu_indices(len(docs), k=1)
        x = hs[ii] ^ hs[jj]
        ham = np.array([bin(int(v)).count("1") for v in x])
        keep = ham <= max_hamming
        return pd.DataFrame({"doc_a": docs[ii][keep], "doc_b": docs[jj][keep],
                             "hamming": ham[keep]})

    pairs = banded.groupby(["band", "key"]).map_groups(
        emit_verified, batch_format="pandas")
    return pairs.groupby(["doc_a", "doc_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas")
