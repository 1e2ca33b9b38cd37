"""Fuzzed-HTML differential test (round-4 verdict task #4).

``html_to_text`` promises gumbo cleantext semantics
(``/root/reference/src/parsing/html.cpp:7-40``): " ".join of
entity-decoded non-whitespace text nodes in document order, skipping
script/style subtrees, with every markup construct splitting text nodes.
The 300-page corpus test pins well-formed pages; this file pins the
MALFORMED edge of the spec with a generative oracle: documents are
composed from a construct grammar (misnested/unclosed tags, truncated
constructs at EOF, entity-heavy text incl. legacy no-semicolon forms,
comments/CDATA/PI/doctype containing '<' or '>', script/style bodies
with markup inside, attributes whose quoted values hide '<'/'>'), and
the EXPECTED text is computed BY CONSTRUCTION from the HTML5 tokenizer
rules — independent of both implementation paths (the fast regex split
and the html.parser event stream), which must each match it.

Grammar constraints (where HTML5 recovery is implementation-defined or
pathological, the generator does not go): comment bodies avoid "--",
CDATA/PI bodies avoid ">", script/style bodies avoid "</", stray "<" is
always followed by a non-tag-start character, and truncated constructs
appear only at EOF.
"""

import html as html_mod

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pisa_ray.analysis.html import html_to_text

# ---------------------------------------------------------------------------
# construct strategies: each yields (markup, kind)
#   kind "text"  — raw character data (entities NOT yet decoded)
#   kind "tag"   — any markup construct that splits text nodes
#   kind "skip"  — a whole script/style subtree (contributes nothing)

_WORDS = st.text(alphabet="abyz09 .,!?-_\t\n>", min_size=1, max_size=10)

_ENTITY_BITS = st.sampled_from([
    "&amp;", "&lt;", "&gt;", "&quot;", "&#65;", "&#x41;", "&nbsp;",
    "&notarealentity;", "&amp", "&", "& x", "&#0;", "&#x2603;",
])

_STRAY_LT = st.sampled_from(["< ", "<5", "<=", "< b", "<\t"])

_text_piece = st.one_of(_WORDS, _ENTITY_BITS, _STRAY_LT)

_texts = st.lists(_text_piece, min_size=1, max_size=4).map(
    lambda ps: ("".join(ps), "text"))

_TAG_NAMES = ["div", "p", "span", "b", "i", "a", "td", "h1", "em"]

_ATTRS = [
    "", " class=\"a b\"", " title=\"x>y\"", " data-x='a<b'", " a=b",
    " hidden", " href='u?q=1&amp;r=2'",
]

_start_tags = st.tuples(st.sampled_from(_TAG_NAMES),
                        st.sampled_from(_ATTRS)).map(
    lambda t: (f"<{t[0]}{t[1]}>", "tag"))

_end_tags = st.sampled_from(_TAG_NAMES).map(lambda n: (f"</{n}>", "tag"))

_self_closing = st.sampled_from(["<br/>", "<img src=x/>", "<hr />"]).map(
    lambda m: (m, "tag"))

_comment_body = st.text(alphabet="ab <>xz.!&", min_size=0, max_size=12) \
    .filter(lambda s: "--" not in s)
_comments = _comment_body.map(lambda b: (f"<!--{b}-->", "tag"))

_cdata_body = st.text(alphabet="ab <xz.", min_size=0, max_size=10) \
    .filter(lambda s: "]" not in s)
_cdatas = _cdata_body.map(lambda b: (f"<![CDATA[{b}]]>", "tag"))

_pi_body = st.text(alphabet="ab <xz=.", min_size=0, max_size=10)
_pis = _pi_body.map(lambda b: (f"<?{b}?>", "tag"))

_doctype = st.just(("<!DOCTYPE html>", "tag"))

_skip_body = st.text(alphabet="ab<>{}();=& .", min_size=0, max_size=14) \
    .filter(lambda s: "</" not in s)
_skips = st.tuples(st.sampled_from(["script", "style"]), _skip_body).map(
    lambda t: (f"<{t[0]}>{t[1]}</{t[0]}>", "skip"))

_construct = st.one_of(_texts, _start_tags, _end_tags, _self_closing,
                       _comments, _cdatas, _pis, _doctype, _skips)

# truncated-at-EOF constructs: the HTML5 tokenizer drops them (eof-in-tag
# / comment-to-EOF); a trailing "<" alone is text
_TRUNCATED = ["<div", "<div attr", "</p", "<!-- never closed",
              "<![CDATA[never", "<?php never", "<a href='x", ""]

_documents = st.tuples(
    st.lists(_construct, min_size=0, max_size=12),
    st.sampled_from(_TRUNCATED))


def _expected(constructs, tail):
    """Spec-derived oracle: markup splits text nodes; text decodes via
    html.unescape (the HTML5 character-reference algorithm); a node
    survives iff its decoded form is non-empty and not whitespace-only;
    script/style subtrees and the truncated tail contribute nothing."""
    nodes, buf = [], []

    def flush():
        if buf:
            t = html_mod.unescape("".join(buf))
            buf.clear()
            if t and not t.isspace():
                nodes.append(t)

    for markup, kind in constructs:
        if kind == "text":
            buf.append(markup)
        else:
            flush()
    flush()
    return " ".join(nodes)


@settings(max_examples=300, deadline=None)
@given(_documents)
def test_fuzzed_malformed_html_matches_spec_oracle(doc):
    constructs, tail = doc
    html = "".join(m for m, _k in constructs) + tail
    assert html_to_text(html) == _expected(constructs, tail)


@settings(max_examples=150, deadline=None)
@given(_documents)
def test_fuzz_event_and_fast_paths_agree(doc):
    """Both implementation paths yield the oracle independently: force
    the event parser even on inputs the fast path would take."""
    from pisa_ray.analysis.html import _CleanTextParser

    constructs, tail = doc
    html = "".join(m for m, _k in constructs) + tail
    want = _expected(constructs, tail)
    # strip the truncated tail the way html_to_text's preprocessor does,
    # then drive the EVENT parser directly
    pre = html
    while True:
        lt = pre.rfind("<")
        if lt == -1 or pre.find(">", lt) != -1:
            break
        nxt = pre[lt + 1: lt + 2]
        if nxt and (nxt.isalpha() or nxt in "/!?"):
            pre = pre[:lt]
        else:
            break
    parser = _CleanTextParser()
    parser.feed(pre)
    parser.close()
    assert " ".join(parser.texts) == want


# -- deterministic pins for the constructs that motivated the fuzz grammar --

@pytest.mark.parametrize("html,want", [
    # truncated constructs at EOF are dropped, not replayed as text
    ("x<!-- unterminated", "x"),
    ("abc<div", "abc"),
    ("abc<div attr='y", "abc"),
    ("abc</div", "abc"),
    ("a<b c<div", "a"),          # cascade: cutting one exposes another
    ("tag<", "tag<"),            # trailing "<" alone IS text per spec
    ("n < 5", "n < 5"),          # stray "<" before non-tag-start is text
    # CDATA is a bogus comment: dropped AND splits text nodes
    ("a<![CDATA[x]]>b", "a b"),
    ("<![CDATA[x]]>", ""),
    # PI/doctype split nodes
    ("a<?php x ?>b", "a b"),
    ("a<!DOCTYPE html>b", "a b"),
    # quoted attribute values may hide '>' and '<'
    ("<div t='a>b'>c</div>", "c"),
    ("<a title=\"x>y\">t</a>", "t"),
    # script/style bodies with markup inside are skipped whole
    ("x<script>if(a<b){d='<div>'}</script>y", "x y"),
    ("x<style>p{}</style>y", "x y"),
    ("x<style>p{}<div>never closed", "x"),
    # legacy/edge entities
    ("a&ampb", "a&b"),
    ("a&zzznope;b", "a&zzznope;b"),
    # legacy longest-prefix match: "&not" decodes without a semicolon
    ("a&notarealentity;b", "a\u00acarealentity;b"),
    ("&nbsp;", ""),              # decodes to NBSP => whitespace-only
    ("p&#x41;q", "pAq"),
])
def test_malformed_pins(html, want):
    assert html_to_text(html) == want
