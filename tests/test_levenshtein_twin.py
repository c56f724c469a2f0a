"""Property test pinning the vectorized Levenshtein kernel to its
pure-Python spec (VERDICT r17 task 5).

``_levenshtein_fast`` is the clever-index numpy (min,+) prefix-scan twin
of ``_levenshtein_words``; r17 verified 3020-case fuzz equality but never
committed it, so a future edit could silently break the unrolled
recurrence.  This commits the fuzz: random token lists from small
alphabets (forcing matches), sized to cross the ``len(a)*len(b) < 256``
tiny-input fallback boundary in both directions, plus the degenerate
shapes (empty, identical, single-token, fully distinct).
"""

from __future__ import annotations

import random

from bigdataanalytics_textsummarization_spark.rouge import (
    _levenshtein_fast,
    _levenshtein_words,
)


def test_levenshtein_twin_degenerate_shapes():
    cases = [
        ([], []),
        ([], ["a"]),
        (["a"], []),
        (["a"], ["a"]),
        (["a"], ["b"]),
        (["a", "b", "c"], ["a", "b", "c"]),
        (["a"] * 40, ["a"] * 40),  # identical, above the fallback
        (["a"] * 40, ["b"] * 40),  # fully distinct, above the fallback
        (["x"], ["y"] * 300),  # extreme aspect ratio
    ]
    for a, b in cases:
        assert _levenshtein_fast(a, b) == _levenshtein_words(a, b), (a, b)


def test_levenshtein_twin_fuzz_across_fallback_boundary():
    rng = random.Random(20260818)
    alphabets = [
        ["a", "b"],  # dense matches
        [f"w{i}" for i in range(5)],
        [f"w{i}" for i in range(50)],  # sparse matches
    ]
    checked_fast = checked_fallback = 0
    for trial in range(1500):
        alpha = alphabets[trial % len(alphabets)]
        # lengths drawn so len(a)*len(b) straddles the 256 fallback gate
        la = rng.randint(0, 40)
        lb = rng.randint(0, 40)
        a = [rng.choice(alpha) for _ in range(la)]
        b = [rng.choice(alpha) for _ in range(lb)]
        if min(la, lb) > 0 and la * lb >= 256:
            checked_fast += 1
        else:
            checked_fallback += 1
        assert _levenshtein_fast(a, b) == _levenshtein_words(a, b), (a, b)
    # both code paths must actually have been exercised
    assert checked_fast > 200 and checked_fallback > 200
