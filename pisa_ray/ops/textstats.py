"""Text analysis operators: language-ID, quality scoring, token counting,
fingerprinting.  All vectorized per-batch transforms over a document
Dataset — the text-quality stack of a training-data pipeline.

Heuristics are deliberately simple, deterministic functions (so the
DuckDB oracle can replicate them exactly); the actor-pool plumbing is the
same one a fasttext-style model would use (load once in ``__init__``).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

from pisa_ray.utils import round_half_away

# function-word list used by the stopword-ratio language heuristic
EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "on", "for")

_WS_RE = re.compile(r"\S+")
_EN_TOKEN_RE = re.compile(r"(?:[a-z]+\.){2,}|[a-z0-9]+'[a-z]+|[a-z0-9]+")
_ALNUM_RE = re.compile(r"[a-z0-9]")


def lang_id(ds, *, text_col: str = "text", id_col: str = "doc_id",
            threshold: float = 0.05):
    """n-gram-free language heuristic: share of tokens that are English
    function words.  → (doc_id, stop_ratio, pred_lang)."""
    stop = set(EN_STOPWORDS)

    def batch_fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        ratios = []
        for t in batch[text_col].to_pylist():
            toks = (t or "").lower().split()
            ratios.append(
                sum(1 for w in toks if w in stop) / len(toks) if toks else 0.0)
        ratios = round_half_away(np.array(ratios, dtype=np.float64), 6)
        pred = np.where(ratios >= threshold, "en", "unk")
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "stop_ratio": pa.array(ratios, type=pa.float64()),
            "pred_lang": pa.array(pred.tolist(), type=pa.string()),
        })

    return ds.map_batches(batch_fn, batch_format="pyarrow")


def quality_scores(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """Quality features: token count, mean token length, stopword ratio,
    alphanumeric character ratio.  → one row per doc, floats rounded to 6."""
    stop = set(EN_STOPWORDS)

    def batch_fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        n_toks, mean_len, stop_r, alnum_r = [], [], [], []
        for t in batch[text_col].to_pylist():
            t = (t or "")
            low = t.lower()
            toks = low.split()
            n_toks.append(len(toks))
            mean_len.append(
                float(np.mean([len(w) for w in toks])) if toks else 0.0)
            stop_r.append(
                sum(1 for w in toks if w in stop) / len(toks) if toks else 0.0)
            alnum_r.append(
                len(_ALNUM_RE.findall(low)) / len(t) if t else 0.0)
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "n_tokens": pa.array(n_toks, type=pa.int64()),
            "mean_token_len": pa.array(round_half_away(mean_len, 6), type=pa.float64()),
            "stopword_ratio": pa.array(round_half_away(stop_r, 6), type=pa.float64()),
            "alnum_ratio": pa.array(round_half_away(alnum_r, 6), type=pa.float64()),
        })

    return ds.map_batches(batch_fn, batch_format="pyarrow")


def token_counts(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """Whitespace vs analyzer-regex token counts (BPE-ish proxy).
    → (doc_id, ws_tokens, en_tokens)."""
    def batch_fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        ws, en = [], []
        for t in batch[text_col].to_pylist():
            low = (t or "").lower()
            ws.append(len(_WS_RE.findall(low)))
            en.append(len(_EN_TOKEN_RE.findall(low)))
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "ws_tokens": pa.array(ws, type=pa.int64()),
            "en_tokens": pa.array(en, type=pa.int64()),
        })

    return ds.map_batches(batch_fn, batch_format="pyarrow")


def fingerprints(ds, *, text_col: str = "text", id_col: str = "doc_id"):
    """Content fingerprint: md5 of lowercased text (+ a 64-bit rolling-hash
    variant for windowed fingerprinting).  → (doc_id, fp_md5, fp_roll)."""
    def batch_fn(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        md5s, rolls = [], []
        for t in batch[text_col].to_pylist():
            low = (t or "").lower()
            md5s.append(hashlib.md5(low.encode("utf-8")).hexdigest())
            # polynomial rolling hash mod 2^61-1 over bytes
            h = 0
            mod = (1 << 61) - 1
            for ch in low.encode("utf-8"):
                h = (h * 131 + ch) % mod
            rolls.append(h)
        return pa.table({
            "doc_id": pa.array(ids, type=pa.int64()),
            "fp_md5": pa.array(md5s, type=pa.string()),
            "fp_roll": pa.array(rolls, type=pa.int64()),
        })

    return ds.map_batches(batch_fn, batch_format="pyarrow")
