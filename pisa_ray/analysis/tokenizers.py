"""Tokenizers replicating the reference engine's semantics.

Two tokenizers (the reference's ``VALID_TOKENIZERS = {whitespace, english}``,
``/root/reference/tools/app.cpp:68``):

* ``whitespace`` — split on runs of whitespace
  (``/root/reference/src/tokenizer.cpp:36-47``).
* ``english`` — a three-class lexer applied first-match-left-to-right
  (``/root/reference/src/tokenizer.cpp:72-79``):

    1. abbreviation ``([a-zA-Z]+\\.){2,}``  → dots stripped (``U.S.A.`` → ``USA``)
    2. possessive   ``[a-zA-Z0-9]+('[a-zA-Z]+)`` → prefix before ``'`` kept
    3. term         ``[a-zA-Z0-9]+``
    anything else is discarded.

Python ``re`` alternation is leftmost-first, matching the lexer's priority
order, so one compiled pattern reproduces the token stream.  Token
normalization (dot-strip / possessive-prefix) mirrors ``transform_token``
(``/root/reference/src/tokenizer.cpp:56-70``).
"""

from __future__ import annotations

import re
from typing import List

# Order matters: abbreviation | possessive | term (leftmost-first).
_ENGLISH_RE = re.compile(r"(?:[a-zA-Z]+\.){2,}|[a-zA-Z0-9]+'[a-zA-Z]+|[a-zA-Z0-9]+")

# DuckDB (RE2) flavor of the same pattern, for SQL oracles.  RE2 alternation
# is also leftmost-first; '' escapes the quote inside SQL string literals.
ENGLISH_TOKEN_SQL_RE = r"(?:[a-zA-Z]+\.){2,}|[a-zA-Z0-9]+''[a-zA-Z]+|[a-zA-Z0-9]+"

_WS_RE = re.compile(r"\S+")


def _normalize_token(tok: str) -> str:
    if "." in tok:  # abbreviation class: strip dots
        return tok.replace(".", "")
    apos = tok.find("'")
    if apos != -1:  # possessive class: keep prefix before the quote
        return tok[:apos]
    return tok


def english_tokenize(text: str) -> List[str]:
    """EnglishTokenizer: lexer classes + per-class normalization."""
    return [_normalize_token(t) for t in _ENGLISH_RE.findall(text)]


def whitespace_tokenize(text: str) -> List[str]:
    """WhitespaceTokenizer: maximal runs of non-whitespace."""
    return _WS_RE.findall(text)


TOKENIZERS = {
    "english": english_tokenize,
    "whitespace": whitespace_tokenize,
}
