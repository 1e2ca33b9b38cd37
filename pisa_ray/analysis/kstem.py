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
    """Stem one lowercase token (dictionary-free rule subset)."""
    if len(word) < 3 or not word.isalpha():
        return word
    w = _plural(word)
    w = _past(w)
    w = _aspect(w)
    return w


# ---------------------------------------------------------------------------
# full control flow (lexicon-gated derivational steps)
#
# KStem proper runs, after the three inflectional steps, a fixed sequence
# of derivational-suffix steps (-ity, -ness, -ion, -er/-or, -ly, -al,
# -ive, -ize, -ment, -ble, -ism, -ic, -ncy, -nce — Krovetz SIGIR'93 §4),
# each of which COMMITS a rewrite only if the candidate stem is a
# dictionary headword; otherwise the word passes through unchanged.  The
# reference vendors the Lemur KrovetzStemmer with its ~30k-entry headword
# table (`/root/reference/src/token_filter.cpp:31-44`); that data file is
# not vendored in this sandbox (the external/ submodule is empty), so the
# engine below implements the STEP STRUCTURE and takes the lexicon as
# input — pass your headword list (one word per line) and you get the
# dictionary-gated behavior; pass none and only the inflectional rules
# (which KStem applies dictionary-free spelling restoration to) run,
# i.e. exactly ``krovetz_stem``.

# suffix → ordered candidate rewrites, as (strip, append) pairs; the
# first candidate found in the lexicon wins.
_DERIVATIONAL = (
    # (strip, append): candidate = w[:-strip] + append, first lexicon hit
    # wins; families ordered longest-suffix-first so e.g. "-ization"
    # shadows "-ation" shadows "-ion".
    ("ability", ((5, "le"), (7, ""))),     # readability->readable,
                                           # accountability->account
    ("ibility", ((5, "le"),)),             # possibility->possible
    ("ality", ((3, ""), (5, ""), (3, "e"))),  # formality->formal
    ("ivity", ((3, "e"), (5, ""))),        # activity->active
    ("ization", ((5, "e"), (7, ""))),      # organization->organize
    ("ation", ((3, "e"), (5, ""), (5, "e"), (3, ""))),  # creation->create,
                                           # information->inform
    ("ility", ((3, "e"), (5, "le"), (3, ""))),  # mobility->mobile
    ("ity", ((3, ""), (3, "e"), (3, "y"))),  # sanity->sane
    ("ness", ((4, ""), (4, "e"))),         # kindness->kind
    ("ions", ((4, ""), (4, "e"))),
    ("ion", ((3, ""), (3, "e"))),          # action->act
    ("iers", ((4, "y"),)),
    ("ier", ((3, "y"),)),                  # easier->easy
    ("ers", ((3, ""), (3, "e"))),
    ("ors", ((3, ""), (3, "e"))),
    ("er", ((2, ""), (2, "e"), (1, ""))),  # writer->write
    ("or", ((2, ""), (2, "e"))),           # creator->create
    ("ically", ((2, ""), (4, ""))),        # radically->radical,
                                           # automatically->automatic
    ("ally", ((2, ""), (4, ""))),
    ("ly", ((2, ""),)),                    # quickly->quick
    ("ical", ((2, ""), (4, ""), (4, "y"))),  # musical->music
    ("ial", ((3, ""), (3, "e"), (3, "y"))),  # facial->face
    ("ual", ((3, ""), (3, "e"))),          # factual->fact
    ("al", ((2, ""), (2, "e"))),           # refusal->refuse
    ("ative", ((5, ""), (3, ""), (5, "e"))),  # informative->inform
    ("ive", ((3, ""), (3, "e"))),          # creative->create
    ("ize", ((3, ""), (3, "e"), (3, "y"))),  # summarize->summary
    ("ment", ((4, ""), (4, "e"))),         # placement->place
    ("able", ((4, ""), (4, "e"))),         # readable->read
    ("ible", ((4, ""), (4, "e"))),
    ("ble", ((3, ""), (3, "e"))),
    ("ism", ((3, ""), (3, "e"))),
    ("ic", ((2, ""), (2, "e"), (2, "y"))),
    ("ncy", ((2, "t"), (1, "e"))),         # consistency->consistent
    ("nce", ((2, "t"), (1, ""))),          # compliance->compliant
)


_BUILTIN_LEXICON = "builtin"
_builtin_cache = None


def builtin_headwords() -> frozenset:
    """The shipped ~400-word curated headword list
    (``analysis/data/kstem_headwords.txt``) — a small public stand-in for
    Lemur's ~30k table, covering every derivational family plus the
    first-lookup protection path.  Delta vs Lemur is coverage only:
    out-of-list words pass through the derivational gate unchanged, which
    is KStem's behavior for any out-of-dictionary word.  Loaded once per
    process."""
    global _builtin_cache
    if _builtin_cache is None:
        import os

        path = os.path.join(os.path.dirname(__file__), "data",
                            "kstem_headwords.txt")
        with open(path, encoding="utf-8") as f:
            _builtin_cache = frozenset(
                s for s in (w.strip() for w in f)
                if s and not s.startswith("#"))
    return _builtin_cache


class KrovetzStemmer:
    """Lexicon-gated KStem: inflectional rules + derivational steps that
    commit only on a headword hit.  Memoizes per instance (one instance
    per analyzer actor)."""

    def __init__(self, lexicon=None, exceptions=None):
        self.lexicon = frozenset(lexicon) if lexicon else frozenset()
        # direct-conflation table: word -> stem, checked first (the
        # KStem exception/headword tables' role)
        self.exceptions = dict(exceptions) if exceptions else {}
        self._cache: dict = {}

    @classmethod
    def from_files(cls, lexicon_path=None, exceptions_path=None):
        """Load ``word`` per line / ``word<TAB>stem`` per line files.
        ``lexicon_path="builtin"`` uses the shipped curated headword list
        (:func:`builtin_headwords`)."""
        lex = None
        if lexicon_path == _BUILTIN_LEXICON:
            lex = builtin_headwords()
        elif lexicon_path:
            with open(lexicon_path, encoding="utf-8") as f:
                lex = {s for s in (w.strip() for w in f)
                       if s and not s.startswith("#")}
        exc = None
        if exceptions_path:
            exc = {}
            with open(exceptions_path, encoding="utf-8") as f:
                for line in f:
                    parts = line.split()
                    if len(parts) == 2:
                        exc[parts[0]] = parts[1]
        return cls(lex, exc)

    def _in_lex(self, w: str) -> bool:
        return w in self.lexicon

    def stem(self, word: str) -> str:
        hit = self._cache.get(word)
        if hit is not None:
            return hit
        out = self._stem_uncached(word)
        if len(self._cache) < 200_000:
            self._cache[word] = out
        return out

    def _stem_uncached(self, word: str) -> str:
        if len(word) < 3 or not word.isalpha():
            return word
        exc = self.exceptions.get(word)
        if exc is not None:
            return exc
        # a word that is itself a headword is never rewritten (KStem's
        # first lookup)
        if self._in_lex(word):
            return word
        w = _plural(word)
        w = _past(w)
        w = _aspect(w)
        if not self.lexicon:
            return w
        if self._in_lex(w):
            return w
        for suffix, candidates in _DERIVATIONAL:
            if w.endswith(suffix) and len(w) - len(suffix) >= 3:
                for strip, append in candidates:
                    cand = w[:-strip] + append if strip else w + append
                    if self._in_lex(cand):
                        return cand
                break  # longest matching family only, like the step chain
        return w

    __call__ = stem
