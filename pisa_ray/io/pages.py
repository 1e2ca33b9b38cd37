"""Deterministic synthetic Common-Crawl-style pages (the input_hint table).

Schema: ``url:string, warc_ts:timestamp[us], html:binary, text:string,
lang:string`` — ``text`` is the *expected* extraction for ``html`` (the
byte-identical-text oracle column).  Synthesised from a seed; no external
data.  The HTML wraps a Zipf token stream in title/paragraph markup with
script/style blocks, comments, entities, nested tags, whitespace-only
nodes, occasional HTTP response headers and mildly malformed cases — every
construct the gumbo-semantics extractor must handle.

Vocabulary: ~5k Zipf terms plus a stopword-grade hot term in ~90% of docs
(exercises posting-list skew), abbreviation/possessive/alphanumeric tokens
for the English-tokenizer classes.
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pyarrow as pa

_BASE_TS = _dt.datetime(2024, 1, 1, 0, 0, 0)


def _vocab(n_terms: int = 5000):
    return np.array([f"w{i:04d}" for i in range(n_terms)], dtype=object)


def generate_pages(n_pages: int, seed: int = 42, n_terms: int = 5000,
                   mean_len: int = 120, index_offset: int = 0) -> pa.Table:
    """``index_offset`` shifts url/ts numbering so multi-part corpora keep globally unique urls."""
    rng = np.random.default_rng(seed)
    vocab = _vocab(n_terms)
    probs = 1.0 / np.arange(1, n_terms + 1) ** 1.1
    probs /= probs.sum()
    langs = np.array(["en", "en", "en", "en", "de", "fr", "es", "zh"])

    urls, htmls, texts, tss, langcol = [], [], [], [], []
    for i in range(n_pages):
        length = max(5, int(rng.poisson(mean_len)))
        words = rng.choice(vocab, size=length, p=probs)
        if rng.random() < 0.9:
            pos = rng.integers(0, length + 1)
            words = np.insert(words, pos, "thecommon")  # hot term
        r = rng.random()
        if r < 0.1:
            words = np.append(words, "U.S.A.")
        elif r < 0.2:
            words = np.append(words, "site's")

        # split into title + paragraphs
        title = " ".join(words[:4])
        body_words = words[4:]
        paras = []
        j = 0
        while j < len(body_words):
            step = int(rng.integers(10, 40))
            paras.append(" ".join(body_words[j: j + step]))
            j += step

        variant = int(rng.integers(0, 5))
        parts = [f"<html><head><title>{title}</title>",
                 "<style>p { color: #000; }</style></head><body>"]
        for p_i, p in enumerate(paras):
            if variant == 1 and p_i == 0:
                parts.append(f"<div><p>{p}</p>\n  </div>")  # nested + ws node
            elif variant == 2 and p_i == 0:
                parts.append(f"<p>{p}<!-- hidden -->tail{p_i}</p>")
            else:
                parts.append(f"<p>{p}</p>")
        parts.append("<script>var x = 'never';</script>")
        if variant == 3:
            parts.append("<p>amp &amp; end</p>")
        parts.append("</body></html>")
        if variant == 4 and paras:
            # mildly malformed: drop one closing tag
            parts[2] = parts[2].replace("</p>", "", 1)
        html = "".join(parts)
        if variant == 2:
            # the comment splits paragraph 0 into two text nodes
            text_nodes = [title] + [paras[0], "tail0"] + paras[1:]
        else:
            text_nodes = [title] + paras
        if variant == 3:
            text_nodes.append("amp & end")
        text = " ".join(t for t in text_nodes if t)

        if rng.random() < 0.05:
            html = ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                    + html)

        g = i + index_offset
        urls.append(f"https://site{g % 97}.example/p/{g:08d}")
        htmls.append(html.encode("utf-8"))
        texts.append(text)
        tss.append(_BASE_TS + _dt.timedelta(seconds=int(i + index_offset) * 17))
        langcol.append(str(langs[int(rng.integers(0, len(langs)))]))

    return pa.table({
        "url": pa.array(urls, type=pa.string()),
        "warc_ts": pa.array(tss, type=pa.timestamp("us")),
        "html": pa.array(htmls, type=pa.binary()),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array(langcol, type=pa.string()),
    })


def write_pages(path: str, n_pages: int, seed: int = 42,
                rows_per_file: int = 50_000, **kw) -> str:
    """Write the pages table as multi-file Parquet (multiple Ray blocks)."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    written = 0
    part = 0
    while written < n_pages:
        n = min(rows_per_file, n_pages - written)
        tbl = generate_pages(n, seed=seed + part, index_offset=written, **kw)
        pq.write_table(tbl, os.path.join(path, f"part-{part:05d}.parquet"))
        written += n
        part += 1
    return path
