"""TextAnalyzer: tokenizer + token-filter chain, batch-vectorized.

Mirrors the reference's ``TextAnalyzer = [TextFilter*] → Tokenizer →
[TokenFilter*]`` composition (``/root/reference/src/text_analyzer.cpp:47-58``)
and its CLI surface (tokenizers ``{whitespace, english}``, token filters
``{lowercase, porter2, krovetz}``, optional stopword set —
``/root/reference/tools/app.cpp:24-70``).  ``krovetz`` is the pure-Python
dictionary-free rule subset (see ``pisa_ray.analysis.kstem``).

Filters are applied in the declared order, as flat-maps over the token
stream: lowercase (1→1), stemmer (1→1), stopword removal (1→0/1).  The
stopword remover drops tokens *after* whatever filters precede it, matching
the reference where it is appended last (``tools/app.cpp:60-65``).

The analyzer is used as a *callable-class actor* in ``map_batches`` so the
compiled regex, stemmer memo cache, and stopword set are built once per
actor (see ``pisa_ray.index.build``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import FrozenSet, List, Optional, Tuple

import numpy as np

from pisa_ray.analysis.tokenizers import TOKENIZERS
from pisa_ray.analysis.html import html_to_text
from pisa_ray.analysis.stem import porter2_stem


@dataclass(frozen=True)
class AnalyzerConfig:
    tokenizer: str = "english"
    # token filters, applied in order; valid: "lowercase", "porter2", "krovetz"
    token_filters: Tuple[str, ...] = ("lowercase",)
    stopwords: FrozenSet[str] = field(default_factory=frozenset)
    strip_html: bool = False  # apply html_to_text as a text filter first
    # headword / direct-conflation files for the krovetz filter (loaded
    # once per actor; None -> dictionary-free rule subset; "builtin" ->
    # the shipped curated headword list in analysis/data/)
    kstem_lexicon: Optional[str] = None
    kstem_exceptions: Optional[str] = None

    def __post_init__(self):
        if self.tokenizer not in TOKENIZERS:
            raise ValueError(f"unknown tokenizer {self.tokenizer!r}")
        for f in self.token_filters:
            if f not in ("lowercase", "porter2", "krovetz"):
                raise ValueError(f"unknown token filter {f!r}")


# ASCII-only lowercase table: A-Z → a-z, every other codepoint untouched.
_ASCII_LOWER = str.maketrans(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz")

# english lexer pattern in Rust-regex flavor (leftmost-first alternation,
# same as Python re) for the polars fast path
_ENGLISH_PAT = r"(?:[a-zA-Z]+\.){2,}|[a-zA-Z0-9]+'[a-zA-Z]+|[a-zA-Z0-9]+"


class TextAnalyzer:
    """Stateful analyzer; build once per actor, call per document/batch."""

    def __init__(self, config: Optional[AnalyzerConfig] = None):
        self.config = config or AnalyzerConfig()
        self._tokenize = TOKENIZERS[self.config.tokenizer]
        self._lower = "lowercase" in self.config.token_filters
        if "krovetz" in self.config.token_filters:
            if self.config.kstem_lexicon or self.config.kstem_exceptions:
                from pisa_ray.analysis.kstem import KrovetzStemmer
                self._stem_fn = KrovetzStemmer.from_files(
                    self.config.kstem_lexicon,
                    self.config.kstem_exceptions).stem
            else:
                from pisa_ray.analysis.kstem import krovetz_stem
                self._stem_fn = krovetz_stem
        elif "porter2" in self.config.token_filters:
            self._stem_fn = porter2_stem
        else:
            self._stem_fn = None
        self._stem = self._stem_fn is not None
        self._stem_cache: dict = {}
        self._stop = self.config.stopwords
        # polars fast path: the whole tokenize→normalize→lowercase→count
        # chain is expressible as vectorized Rust string kernels exactly
        # when no stemmer/stopwords are configured.  This matters beyond
        # raw speed: the Python path allocates millions of small token
        # objects per batch, and page-fault handling on the target boxes
        # degrades under many-core contention — Rust columnar allocation
        # sidesteps it.  Byte-parity with the Python chain is
        # property-tested (tests/test_analyzer.py).
        self._polars_ok = (self.config.tokenizer == "english"
                           and self._lower and not self._stem
                           and not self._stop)

    # -- single document ----------------------------------------------------
    def analyze(self, text: str) -> List[str]:
        """Full chain over one document → token list."""
        if self.config.strip_html:
            text = html_to_text(text)
        if self._lower:
            # Lowercase only ASCII A-Z before tokenizing.  str.lower() on the
            # whole text is NOT equivalent to the reference's
            # tokenize-then-lowercase order for Unicode input ('İ' U+0130 →
            # 'i'+combining dot, Kelvin U+212A → 'k' would mint tokens the
            # ASCII tokenizer never emits); an ASCII-only translate commutes
            # with the [a-zA-Z0-9]-class tokenizer and stays fast.
            text = text.translate(_ASCII_LOWER)
        toks = self._tokenize(text)
        if self._stem:
            cache = self._stem_cache
            out = []
            for t in toks:
                s = cache.get(t)
                if s is None:
                    s = self._stem_fn(t)
                    cache[t] = s
                out.append(s)
            toks = out
        if self._stop:
            stop = self._stop
            toks = [t for t in toks if t not in stop]
        return toks

    # -- batch → per-(doc, term) counts, polars fast path -------------------
    def count_batch_fast(self, texts):
        """Vectorized tokenize+count for the english/lowercase chain.

        Returns ``(doc_idx: int64[], terms: pyarrow.Array, tfs: uint32[],
        doc_lens: uint32[])`` — same contents as ``count_batch`` (rows
        sorted by (doc, term)), with terms as an Arrow string array that
        never materializes Python token objects.  Only valid when
        ``self.fast_path`` is True."""
        import os as _os

        _os.environ.setdefault("POLARS_MAX_THREADS", "1")
        import polars as pl

        if self.config.strip_html:
            texts = [html_to_text(t if t is not None else "")
                     for t in texts]
        else:
            texts = [t if t is not None else "" for t in texts]
        df = pl.DataFrame({
            "doc": np.arange(len(texts), dtype=np.int64),
            "text": texts,
        })
        g = (df.lazy()
             .with_columns(pl.col("text").str.extract_all(_ENGLISH_PAT)
                           .alias("tok"))
             .drop("text")
             .explode("tok")
             .drop_nulls()
             .with_columns(pl.col("tok")
                           .str.replace_all(".", "", literal=True)
                           .str.replace(r"'.*$", "")
                           .str.to_lowercase())
             .group_by(["doc", "tok"]).agg(pl.len().alias("tf"))
             .sort(["doc", "tok"])
             .collect())
        doc_idx = g["doc"].to_numpy().astype(np.int64, copy=False)
        tfs = g["tf"].to_numpy().astype(np.uint32, copy=False)
        terms = g["tok"].to_arrow()
        doc_lens = np.bincount(doc_idx, weights=tfs,
                               minlength=len(texts)).astype(np.uint32)
        return doc_idx, terms, tfs, doc_lens

    @property
    def fast_path(self) -> bool:
        return self._polars_ok

    # -- batch → per-(doc, term) counts -------------------------------------
    def count_batch(self, texts) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """Tokenize a batch of documents and count term frequencies.

        Returns ``(doc_idx, terms, tfs, doc_lens)`` where ``doc_idx`` maps
        each (doc, term) row back to its position in ``texts`` and
        ``doc_lens[i]`` is the token count of document i.  Counting is done
        with one numpy lexsort-free pass over (doc_idx, token) pairs rather
        than per-row Python Counters.
        """
        n = len(texts)
        doc_lens = np.zeros(n, dtype=np.uint32)
        all_tokens: List[str] = []
        all_docidx: List[np.ndarray] = []
        for i, text in enumerate(texts):
            toks = self.analyze(text if text is not None else "")
            doc_lens[i] = len(toks)
            if toks:
                all_tokens.extend(toks)
                all_docidx.append(np.full(len(toks), i, dtype=np.int64))
        if not all_tokens:
            return (
                np.empty(0, dtype=np.int64),
                np.empty(0, dtype=object),
                np.empty(0, dtype=np.uint32),
                doc_lens,
            )
        tok_arr = np.asarray(all_tokens, dtype=object)
        idx_arr = np.concatenate(all_docidx)
        # unique over (doc_idx, token) pairs → tf counts, vectorized
        order = np.lexsort((tok_arr, idx_arr))
        tok_s, idx_s = tok_arr[order], idx_arr[order]
        new_group = np.empty(len(tok_s), dtype=bool)
        new_group[0] = True
        np.not_equal(tok_s[1:], tok_s[:-1], out=new_group[1:])
        np.logical_or(new_group[1:], idx_s[1:] != idx_s[:-1], out=new_group[1:])
        starts = np.flatnonzero(new_group)
        tfs = np.diff(np.append(starts, len(tok_s))).astype(np.uint32)
        return idx_s[starts], tok_s[starts], tfs, doc_lens
