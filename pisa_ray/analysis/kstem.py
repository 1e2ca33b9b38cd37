"""Krovetz stemmer — inflectional-morphology subset, pure Python.

Implements the rule core of Krovetz's stemmer (R. Krovetz, "Viewing
Morphology as an Inference Process", SIGIR 1993): the three inflectional
steps — plural, past tense, aspect (-ing) — with the spelling-restoration
rules (undoubling a doubled final consonant, restoring a dropped final
'e', y/ie alternation).  The reference vendors the full KStem
(``/root/reference/src/token_filter.cpp:31-44`` wiring a bundled
KrovetzStemmer), whose behavior additionally depends on ~30k-entry
headword/exception dictionaries; this port is the DICTIONARY-FREE rule
subset, a documented divergence: words whose stemming depends on a
dictionary lookup (e.g. irregular forms, proper nouns) pass through the
rules unchanged.  Deterministic, memoized per analyzer actor like porter2.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiou")


def _is_vowel(word: str, i: int) -> bool:
    c = word[i]
    if c in _VOWELS:
        return True
    # 'y' is a vowel when preceded by a consonant
    return c == "y" and i > 0 and word[i - 1] not in _VOWELS


def _ends_cvc(word: str) -> bool:
    """consonant-vowel-consonant ending (last cons. not w/x/y) — the
    classic condition for restoring a dropped 'e'."""
    if len(word) < 3:
        return False
    return (not _is_vowel(word, len(word) - 1)
            and word[-1] not in "wxy"
            and _is_vowel(word, len(word) - 2)
            and not _is_vowel(word, len(word) - 3))


def _plural(word: str) -> str:
    if not word.endswith("s") or len(word) < 4:
        return word
    if word.endswith("ies"):
        # "flies" -> "fly"; keep very short words ("ties" -> "tie" needs a
        # dictionary; the rule subset maps to 'y' uniformly)
        return word[:-3] + "y"
    if word.endswith("es"):
        # "churches" -> "church", "classes" -> "class"; but "-es" after
        # most stems is just plural 's' on an 'e'-final stem: "makes" ->
        # "make".  sibilant endings drop "es" entirely.
        stem = word[:-2]
        if stem.endswith(("ss", "sh", "ch", "x", "z")):
            return stem
        return word[:-1]
    if word.endswith("ss") or word.endswith("us"):
        return word
    return word[:-1]


def _past(word: str) -> str:
    if len(word) < 5 or not word.endswith("ed"):
        return word
    if word.endswith("ied"):
        return word[:-3] + "y"          # "tried" -> "try"
    stem = word[:-2]
    if len(stem) >= 2 and stem[-1] == stem[-2] and stem[-1] not in _VOWELS:
        return stem[:-1]                # "stopped" -> "stop"
    if _ends_cvc(stem):
        return stem + "e"               # "hoped" -> "hope"
    if stem.endswith(("at", "iz", "is", "bl")):
        return stem + "e"               # "created" -> "create"
    return stem


def _aspect(word: str) -> str:
    if len(word) < 6 or not word.endswith("ing"):
        return word
    stem = word[:-3]
    if len(stem) >= 2 and stem[-1] == stem[-2] and stem[-1] not in _VOWELS:
        return stem[:-1]                # "running" -> "run"
    if _ends_cvc(stem):
        return stem + "e"               # "making" -> "make"
    if not any(_is_vowel(stem, i) for i in range(len(stem))):
        return word                     # no vowel left — not a real stem
    return stem


def krovetz_stem(word: str) -> str:
    """Stem one lowercase token."""
    if len(word) < 3 or not word.isalpha():
        return word
    w = _plural(word)
    w = _past(w)
    w = _aspect(w)
    return w
