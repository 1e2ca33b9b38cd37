"""Collection parsers: plaintext, trectext, trecweb, WashingtonPost JSON.

Capability parity with the reference's ``record_parser``
(``/root/reference/src/parser.cpp:42-150``), which streams
``Document_Record(trecid, content, url)`` out of each format:

* ``plaintext`` — one record per line, first whitespace-delimited token is
  the docno, the rest is the content.
* ``trectext``  — ``<DOC>…</DOC>`` records, ``<DOCNO>`` id, content = the
  concatenation of ``<TEXT>…</TEXT>`` sections.
* ``trecweb``   — ``<DOC>…</DOC>`` records with a ``<DOCHDR>`` block whose
  first line carries the URL; content = everything after ``</DOCHDR>``.
* ``wapo``      — one JSON object per line; content = the space-joined
  kicker/title/byline/text/author/image-caption pieces in document order
  (mirroring ``parser.cpp:120-146``).

Parsers are pure functions over file blobs → record tables; the Ray
wiring is ``read_collection`` (``read_binary_files`` → ``flat_map`` per
file) so a directory of TREC files streams straight into ``build_index``
(pass ``url_col="docno"``: docids become the global sorted-docno rank).
"""

from __future__ import annotations

import json
import re
from typing import Iterator, List, Optional, Tuple

Record = Tuple[str, str, Optional[str]]  # (docno, content, url)

_DOC_RE = re.compile(rb"<DOC>(.*?)</DOC>", re.S)
_DOCNO_RE = re.compile(rb"<DOCNO>\s*(.*?)\s*</DOCNO>", re.S)
_TEXT_RE = re.compile(rb"<TEXT>(.*?)</TEXT>", re.S)
_DOCHDR_RE = re.compile(rb"<DOCHDR>(.*?)</DOCHDR>", re.S)


def _dec(b: bytes) -> str:
    return b.decode("utf-8", errors="replace")


def parse_plaintext(blob: bytes) -> Iterator[Record]:
    for line in blob.splitlines():
        line = line.strip()
        if not line:
            continue
        parts = line.split(None, 1)
        docno = _dec(parts[0])
        content = _dec(parts[1]) if len(parts) > 1 else ""
        yield docno, content, None


def parse_trectext(blob: bytes) -> Iterator[Record]:
    for m in _DOC_RE.finditer(blob):
        body = m.group(1)
        docno_m = _DOCNO_RE.search(body)
        if docno_m is None:
            continue  # invalid record skipped, like the reference
        texts = _TEXT_RE.findall(body)
        content = " ".join(_dec(t).strip() for t in texts)
        yield _dec(docno_m.group(1)), content, None


def parse_trecweb(blob: bytes) -> Iterator[Record]:
    for m in _DOC_RE.finditer(blob):
        body = m.group(1)
        docno_m = _DOCNO_RE.search(body)
        if docno_m is None:
            continue
        hdr_m = _DOCHDR_RE.search(body)
        url = None
        if hdr_m is not None:
            hdr_lines = hdr_m.group(1).strip().splitlines()
            if hdr_lines:
                url = _dec(hdr_lines[0].split()[0]) if hdr_lines[0].split() \
                    else None
            content = body[hdr_m.end():]
        else:
            content = body
        yield _dec(docno_m.group(1)), _dec(content).strip(), url


def parse_wapo(blob: bytes) -> Iterator[Record]:
    for line in blob.splitlines():
        line = line.strip()
        if not line:
            continue
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            continue  # skipped invalid record
        pieces: List[str] = []
        for c in rec.get("contents") or []:
            if not isinstance(c, dict):
                continue
            t = c.get("type")
            if t in ("kicker", "title", "byline"):
                pieces.append(str(c.get("content") or ""))
            elif t == "sanitized_html" or t == "text":
                pieces.append(str(c.get("content") or ""))
            elif t == "author_info":
                pieces.append(str(c.get("name") or ""))
                pieces.append(str(c.get("bio") or ""))
            elif t == "image":
                pieces.append(str(c.get("fullcaption")
                                  or c.get("caption") or ""))
                pieces.append(str(c.get("blurb") or ""))
        yield (str(rec.get("id") or ""), " ".join(pieces),
               rec.get("article_url"))


_TOP_RE = re.compile(r"<top>(.*?)</top>", re.S | re.I)


def _topic_field(body: str, tag: str, att: Optional[str]) -> str:
    """Text after ``<tag>`` (and an optional ``Att:`` label) up to the next
    ``<`` — the reference's read-until-'<' scan
    (``include/pisa/query/trec_topic_reader.hpp:60-117``), with newlines
    collapsed to spaces and ends trimmed."""
    m = re.search(rf"<{tag}>", body, re.I)
    if m is None:
        return ""
    rest = body[m.end():]
    if att:
        rest = re.sub(rf"^\s*{att}", "", rest, count=1, flags=re.I)
    cut = rest.find("<")
    if cut >= 0:
        rest = rest[:cut]
    return " ".join(rest.split())


def parse_trec_topics(text: str) -> List[dict]:
    """TREC topics SGML → [{num, title, desc, narr}] (the
    ``trec_topic_reader`` semantics: ``<num> Number:`` label stripped,
    fields end at the next tag, whitespace normalized)."""
    out = []
    for m in _TOP_RE.finditer(text):
        body = m.group(1)
        out.append({
            "num": _topic_field(body, "num", "Number:"),
            "title": _topic_field(body, "title", None),
            "desc": _topic_field(body, "desc", "Description:"),
            "narr": _topic_field(body, "narr", "Narrative:"),
        })
    return out


def parse_aol_queries(text: str) -> List[str]:
    """AOL query-log TSV → query strings (field 2 of >3-field lines,
    skipping empties and ``-`` placeholders).  The reference's
    ``aol_reader.hpp:29`` tests ``fields[1].empty() and fields[1] != "-"``
    — literally satisfiable only by the empty string it then emits, an
    evident upstream inversion; this implements the intended filter."""
    out = []
    for line in text.splitlines():
        fields = line.split("\t")
        if len(fields) > 3 and fields[1] and fields[1] != "-":
            out.append(fields[1])
    return out


def extract_topics(input_path: str, output_basename: str,
                   fmt: str = "trec", unique: bool = False) -> int:
    """The reference's ``extract_topics`` tool
    (``/root/reference/tools/extract_topics.cpp:12-72``): ``trec`` writes
    ``<base>.title/.desc/.narr`` as ``num:text`` lines; ``aol`` writes
    ``<base>.query`` (``id:query``) and, with ``unique``,
    ``<base>.query.unique`` (sorted distinct).  Returns #records."""
    with open(input_path, encoding="utf-8", errors="replace") as f:
        text = f.read()
    if fmt == "trec":
        topics = parse_trec_topics(text)
        for field in ("title", "desc", "narr"):
            with open(f"{output_basename}.{field}", "w",
                      encoding="utf-8") as f:
                for t in topics:
                    f.write(f"{t['num']}:{t[field]}\n")
        return len(topics)
    if fmt == "aol":
        queries = parse_aol_queries(text)
        with open(f"{output_basename}.query", "w", encoding="utf-8") as f:
            for i, q in enumerate(queries):
                f.write(f"{i}:{q}\n")
        if unique:
            with open(f"{output_basename}.query.unique", "w",
                      encoding="utf-8") as f:
                for i, q in enumerate(sorted(set(queries))):
                    f.write(f"{i}:{q}\n")
        return len(queries)
    raise ValueError(f"unsupported topics format {fmt!r}")


PARSERS = {
    "plaintext": parse_plaintext,
    "trectext": parse_trectext,
    "trecweb": parse_trecweb,
    "wapo": parse_wapo,
}


def read_collection(paths, fmt: str = "trectext"):
    """→ Dataset(docno, url, text): stream a directory/file list of a TREC
    collection.  One ``flat_map`` task per file — files are the natural
    parallel unit (records never span files)."""
    import pyarrow as pa
    import ray.data

    try:
        parse = PARSERS[fmt]
    except KeyError:
        raise ValueError(f"unknown collection format {fmt!r}; "
                         f"have {sorted(PARSERS)}") from None

    def per_file(batch) -> "pa.Table":
        docnos, urls, texts = [], [], []
        for blob in batch["bytes"]:
            for docno, content, url in parse(bytes(blob)):
                docnos.append(docno)
                urls.append(url or "")
                texts.append(content)
        return pa.table({
            "docno": pa.array(docnos, type=pa.string()),
            "url": pa.array(urls, type=pa.string()),
            "text": pa.array(texts, type=pa.string()),
        })

    return ray.data.read_binary_files(paths).map_batches(
        per_file, batch_format="numpy", batch_size=None)
