"""REGISTRY.md freshness + shape pins (VERDICT r15 task 7): the index is
generated, never hand-edited — a drifted file fails here, and the fix is
one `python scripts/make_registry.py` run.

STANDING ROUND-START RULE (VERDICT r16 task 1): the driver writes
CORRECTNESS_r{N}.json AFTER the builder's final r{N} commit, so the
committed REGISTRY.md's last-green column is always exactly one round
stale when round N+1 opens — this test is then red BY DESIGN.  The
first commit of every round runs `python scripts/make_registry.py` to
fold the driver's fresh greens into the index."""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))


def test_registry_md_is_fresh():
    import make_registry

    with open(os.path.join(REPO, "REGISTRY.md")) as f:
        assert f.read() == make_registry.render()


def test_registry_covers_every_query():
    import __spark_entry__ as entry_mod
    import make_registry

    content = make_registry.render()
    for name in entry_mod.queries():
        assert f"| {name} |" in content, name
