"""HTML → text extraction with the reference engine's "cleantext" semantics.

The reference (PISA) parses HTML with gumbo (an HTML5 parser) and extracts
text recursively: text nodes are kept verbatim (entities decoded),
whitespace-only text nodes contribute nothing, ``<script>`` / ``<style>``
subtrees are skipped entirely, and sibling texts are joined with a single
space (a separator is inserted only between two non-empty pieces).  See
``/root/reference/src/parsing/html.cpp:7-40``.

Because the separator is only ever inserted between non-empty sibling texts
and recursion never adds leading/trailing separators, the result is exactly::

    " ".join(t for t in text_nodes_in_document_order
             if t not inside script/style and not whitespace-only)

with each text node's content kept verbatim — independent of the tree shape.
We therefore implement it as a streaming SAX-style pass (``html.parser``),
which reproduces gumbo's output on well-formed-ish HTML without a full HTML5
tree builder.  Character/entity references are decoded like gumbo does.

HTTP response headers glued in front of the payload (as in raw WARC records)
are stripped first, mirroring ``/root/reference/src/parser.cpp:160-187``.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import List, Union


class _CleanTextParser(HTMLParser):
    """Collects gumbo-style text nodes: contiguous character data runs,
    split at any tag/comment/declaration boundary, skipping script/style."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.texts: List[str] = []
        self._buf: List[str] = []
        self._skip_depth = 0  # inside <script>/<style>

    # -- text-node buffering ------------------------------------------------
    def _flush(self) -> None:
        if self._buf:
            text = "".join(self._buf)
            self._buf.clear()
            # gumbo marks all-whitespace text nodes GUMBO_NODE_WHITESPACE;
            # cleantext() only collects GUMBO_NODE_TEXT, so drop them.
            if text and not text.isspace():
                self.texts.append(text)

    def handle_data(self, data: str) -> None:
        if self._skip_depth == 0 and data:
            self._buf.append(data)

    # -- boundaries ---------------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        self._flush()
        if tag in ("script", "style"):
            self._skip_depth += 1

    def handle_endtag(self, tag: str) -> None:
        self._flush()
        if tag in ("script", "style") and self._skip_depth > 0:
            self._skip_depth -= 1

    def handle_startendtag(self, tag: str, attrs) -> None:
        self._flush()

    def handle_comment(self, data: str) -> None:
        self._flush()

    def handle_decl(self, decl: str) -> None:
        self._flush()

    def handle_pi(self, data: str) -> None:
        self._flush()

    def unknown_decl(self, data: str) -> None:
        # <![CDATA[...]]> outside foreign content is a bogus comment in
        # HTML5 (gumbo drops it); like any markup it SPLITS text nodes —
        # without this flush "a<![CDATA[x]]>b" would merge into one "ab"
        # node while gumbo (and the fast path) yield "a b"
        self._flush()

    def close(self) -> None:
        super().close()
        self._flush()


def strip_http_headers(content: str) -> str:
    """Drop a leading HTTP response header block, if present.

    Mirrors the reference's ``is_http`` + header skip
    (``/root/reference/src/parser.cpp:160-187``): content starting with
    ``HTTP/`` has everything up to and including the first blank line removed.
    """
    if not content.startswith("HTTP/"):
        return content
    for sep in ("\r\n\r\n", "\n\n"):
        idx = content.find(sep)
        if idx != -1:
            return content[idx + len(sep):]
    return content


# -- fast path --------------------------------------------------------------
# html.parser's per-character python loop dominates the analyze stage
# (~55% of tokenize+extract time).  For documents whose markup is
# unambiguous, one compiled-regex split produces the exact same text-node
# stream; anything risky (stray '<', quoted attribute values that may hide
# '>', unterminated tags) falls back to the event parser.  Both paths
# implement the same " ".join(non-ws text nodes outside script/style)
# semantics; equality is property-tested on the generated corpus.

import html as _html_mod

_FAST_SPLIT_RE = re.compile(
    r"(?is)<script[^>]*>.*?(?:</script[^>]*>|\Z)"
    r"|<style[^>]*>.*?(?:</style[^>]*>|\Z)"
    r"|<!--.*?(?:-->|\Z)"
    r"|</?[a-zA-Z][^>]*>"
    r"|<[!?][^>]*>"
)
# conditions that make the single-pass split unsafe
_RISKY_LT_RE = re.compile(r"<(?![a-zA-Z/!?])")
_RISKY_QUOTED_ATTR_RE = re.compile(r"<[a-zA-Z/!?][^>]*[\"']")


def _fast_cleantext(html: str) -> str:
    parts = _FAST_SPLIT_RE.split(html)
    out = []
    for t in parts:
        if not t:
            continue
        u = _html_mod.unescape(t) if "&" in t else t
        if u and not u.isspace():
            out.append(u)
    return " ".join(out)


def html_to_text(html: Union[str, bytes]) -> str:
    """Extract clean text from an HTML document (gumbo cleantext semantics).

    Accepts ``str`` or utf-8 ``bytes`` (the ``html:binary`` input column).
    """
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    html = strip_http_headers(html)

    # EOF inside an unterminated tag / comment / bogus comment: the HTML5
    # tokenizer DROPS the construct (eof-in-tag, comment-to-EOF) — it
    # never becomes text.  Truncated real-web pages end this way
    # constantly; html.parser would instead replay the tail as character
    # data.  A trailing "<" followed by anything else (space, digit, EOF)
    # IS text per spec and is kept.  (Known corner: a page truncated
    # inside <title>/<textarea> RCDATA containing a stray "<x" loses that
    # tail; gumbo would keep it as RCDATA text.)
    while True:
        last_lt = html.rfind("<")
        if last_lt == -1 or html.find(">", last_lt) != -1:
            break
        nxt = html[last_lt + 1: last_lt + 2]
        if nxt and (nxt.isalpha() or nxt in "/!?"):
            html = html[:last_lt]
        else:
            break

    last_lt = html.rfind("<")
    safe = (
        _RISKY_LT_RE.search(html) is None
        and _RISKY_QUOTED_ATTR_RE.search(html) is None
        and (last_lt == -1 or html.find(">", last_lt) != -1)
    )
    if safe:
        return _fast_cleantext(html)

    parser = _CleanTextParser()
    try:
        parser.feed(html)
        parser.close()
    except Exception:
        # gumbo never throws; it error-recovers. html.parser is similarly
        # tolerant, but guard anyway: salvage whatever was collected.
        parser._flush()
    return " ".join(parser.texts)
