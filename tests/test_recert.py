"""CI gate for the mechanized re-certification rule (r4 VERDICT task #4):
any registered query whose implementation closure changed since its last
green driver row must be staged in ``_PRIORITY``.  No Spark needed."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_no_uncertified_drift():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "check_recert.py")],
        capture_output=True,
        text=True,
        cwd=REPO,
    )
    assert proc.returncode == 0, (
        "changed-since-green queries missing from _PRIORITY:\n"
        + proc.stdout
        + proc.stderr
    )


def test_priority_names_are_registered():
    """A stale name in _PRIORITY burns a budget slot silently (queries()
    filters it) — the r4 'multimodal_decode' lesson."""
    sys.path.insert(0, REPO)
    import __spark_entry__ as e

    registered = set()
    for mod in e._MODULES:
        registered.update(mod.QUERIES)
    missing = [n for n in e._PRIORITY if n not in registered]
    assert not missing, f"_PRIORITY names not registered: {missing}"


def test_fingerprint_ignores_docstrings_but_sees_code():
    from scripts.check_recert import closure_like_probe  # type: ignore

    # probe helper defined for this test; see check_recert.py
    a = closure_like_probe("def f(x):\n    'doc'\n    return x + 1\n", "f")
    b = closure_like_probe("def f(x):\n    'other doc'\n    return x + 1\n", "f")
    c = closure_like_probe("def f(x):\n    'doc'\n    return x + 2\n", "f")
    assert a == b
    assert a != c


def test_fingerprint_tracks_same_module_helpers():
    from scripts.check_recert import closure_like_probe  # type: ignore

    base = "K = 3\ndef helper(x):\n    return x * K\ndef f(x):\n    return helper(x)\n"
    const_changed = base.replace("K = 3", "K = 4")
    unrelated = base + "def g():\n    return 9\n"
    assert closure_like_probe(base, "f") != closure_like_probe(
        const_changed, "f"
    )
    # adding an unrelated top-level def must NOT flag f
    assert closure_like_probe(base, "f") == closure_like_probe(unrelated, "f")
