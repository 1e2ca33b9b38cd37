from collections import Counter

import numpy as np
import pytest

from pisa_ray.analysis.analyzer import AnalyzerConfig, TextAnalyzer


def test_default_chain():
    az = TextAnalyzer()
    assert az.analyze("The U.S.A. Dog's day!") == ["the", "usa", "dog", "day"]


def test_stopwords_after_lowercase():
    az = TextAnalyzer(AnalyzerConfig(stopwords=frozenset({"the", "a"})))
    assert az.analyze("The quick a fox") == ["quick", "fox"]


def test_porter2_chain():
    az = TextAnalyzer(AnalyzerConfig(token_filters=("lowercase", "porter2")))
    assert az.analyze("Running nationally") == ["run", "nation"]


def test_no_filters_keeps_case():
    az = TextAnalyzer(AnalyzerConfig(token_filters=()))
    assert az.analyze("Aa Bb") == ["Aa", "Bb"]


def test_strip_html():
    az = TextAnalyzer(AnalyzerConfig(strip_html=True))
    assert az.analyze("<p>Hello <b>World</b></p>") == ["hello", "world"]


def test_krovetz_selectable():
    az = TextAnalyzer(AnalyzerConfig(token_filters=("lowercase", "krovetz")))
    assert az.analyze("Dogs running") == ["dog", "run"]


def test_count_batch_matches_counter():
    az = TextAnalyzer()
    texts = [
        "the cat sat on the mat",
        "",
        "dog dog dog",
        "U.S.A. usa USA",
        None,
    ]
    doc_idx, terms, tfs, doc_lens = az.count_batch(texts)
    got = {}
    for d, t, f in zip(doc_idx, terms, tfs):
        got[(int(d), t)] = int(f)
    want = {}
    for i, tx in enumerate(texts):
        for t, f in Counter(az.analyze(tx or "")).items():
            want[(i, t)] = f
    assert got == want
    assert list(doc_lens) == [6, 0, 3, 3, 0]
    assert doc_lens.dtype == np.uint32


def test_count_batch_empty():
    az = TextAnalyzer()
    doc_idx, terms, tfs, doc_lens = az.count_batch(["", "?!"])
    assert len(doc_idx) == 0 and len(terms) == 0 and len(tfs) == 0
    assert list(doc_lens) == [0, 0]


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=400))
def test_analyzer_never_crashes_on_unicode(s):
    """Robustness: arbitrary unicode (incl. surrogate-adjacent, control
    chars, emoji) through the full chain never raises and yields tokens
    from the expected character classes."""
    az = TextAnalyzer(AnalyzerConfig(token_filters=("lowercase", "porter2")))
    toks = az.analyze(s)
    assert all(t == "" or all(c.isascii() for c in t) for t in toks)


@settings(max_examples=40, deadline=None)
@given(st.text(max_size=300))
def test_html_to_text_never_crashes(s):
    from pisa_ray.analysis.html import html_to_text

    out = html_to_text(s)
    assert isinstance(out, str)
    out2 = html_to_text(("<p>" + s + "</p>").encode("utf-8", "ignore"))
    assert isinstance(out2, str)


def test_count_batch_fast_parity_fuzz():
    """The polars fast path reproduces count_batch exactly — tokens,
    counts, order — including on unicode fuzz input."""
    import random

    an = TextAnalyzer(AnalyzerConfig())
    assert an.fast_path
    random.seed(7)
    chars = "aA zZ09.'İKé世<>&; \t\n"
    texts = ["U.S.A. dog's it's a1b2 Foo.Bar.",
             "", "   ", "don't STOP k2",
             *("".join(random.choice(chars) for _ in range(150))
               for _ in range(100))]
    d1, t1, f1, l1 = an.count_batch(texts)
    d2, t2, f2, l2 = an.count_batch_fast(texts)
    assert list(d1) == list(d2)
    assert [str(x) for x in t1] == t2.to_pylist()
    assert list(f1) == list(f2)
    assert list(l1) == list(l2)


def test_count_batch_fast_disabled_with_stemmer():
    an = TextAnalyzer(AnalyzerConfig(token_filters=("lowercase", "porter2")))
    assert not an.fast_path
