from pisa_ray.analysis.stem import porter2_stem


VECTORS = {
    # exceptions
    "skis": "ski", "skies": "sky", "dying": "die", "news": "news",
    "early": "earli", "only": "onli",
    # plurals / 1a
    "caresses": "caress", "ties": "tie", "cries": "cri", "gaps": "gap",
    "gas": "gas", "this": "this", "corpus": "corpus",
    # 1b
    "agreed": "agre", "running": "run", "jumped": "jump", "hopping": "hop",
    "hoped": "hope", "sized": "size", "falling": "fall",
    # exceptions after 1a
    "inning": "inning", "proceed": "proceed",
    # 1c
    "cry": "cri", "say": "say", "by": "by",
    # step 2
    "national": "nation", "rational": "ration", "fairly": "fair",
    "generously": "generous", "consistency": "consist",
    "vietnamization": "vietnam",
    # step 3/4
    "duplicate": "duplic", "activate": "activ", "effective": "effect",
    "goodness": "good",
    # step 5
    "rate": "rate", "cease": "ceas",
    # short words unchanged
    "a": "a", "be": "be", "on": "on",
}


def test_vectors():
    bad = {w: (porter2_stem(w), want) for w, want in VECTORS.items()
           if porter2_stem(w) != want}
    assert not bad, f"mismatches (got, want): {bad}"


def test_idempotent_on_stems():
    for w in VECTORS.values():
        s = porter2_stem(w)
        assert porter2_stem(s) == s
