from pisa_ray.analysis.tokenizers import english_tokenize, whitespace_tokenize


def test_english_terms():
    assert english_tokenize("hello world 42abc") == ["hello", "world", "42abc"]


def test_english_abbreviation():
    # ([a-zA-Z]+\.){2,} → dots stripped   (reference src/tokenizer.cpp:60-65)
    assert english_tokenize("U.S.A. rocks") == ["USA", "rocks"]
    assert english_tokenize("a.b.c.") == ["abc"]
    # single letter+dot is NOT an abbreviation (needs 2+ groups)
    assert english_tokenize("e. g") == ["e", "g"]


def test_english_possessive():
    assert english_tokenize("dog's bone") == ["dog", "bone"]
    assert english_tokenize("it's a2's") == ["it", "a2"]


def test_english_drops_punct():
    assert english_tokenize("x, y; z!") == ["x", "y", "z"]
    assert english_tokenize("--- ...") == []


def test_english_mixed():
    assert english_tokenize("U.S. dog's tail-end") == ["US", "dog", "tail", "end"]


def test_abbrev_partial():
    # "U.S.A" (no trailing dot): abbreviation matches "U.S." then term "A"
    assert english_tokenize("U.S.A") == ["US", "A"]


def test_whitespace():
    assert whitespace_tokenize("  a\tb\nc  ") == ["a", "b", "c"]
    assert whitespace_tokenize("x,y z!") == ["x,y", "z!"]
    assert whitespace_tokenize("   ") == []
