"""bench.py plumbing guarantees (no TPU / no oracle needed).

The driver's end-of-round bench is the judged deliverable; these pin
the properties its budget design relies on."""

import hashlib
import importlib.util
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("bench", mod)
    spec.loader.exec_module(mod)
    return mod


def test_corpus_prefix_stable():
    """The device child regenerates a SMALLER corpus than the parent;
    its measurements only describe the same data if every prefix of
    make_corpus(n) equals make_corpus(m)[:n] for n < m."""
    b = _bench()
    small = b.make_corpus(3)
    big = b.make_corpus(6)
    assert big[:len(small)] == small
    # deterministic across calls
    assert hashlib.sha256(b.make_corpus(3)).hexdigest() == \
        hashlib.sha256(small).hexdigest()


def test_budget_and_oracle_helpers():
    b = _bench()
    assert b._left() <= b.BUDGET_S
    # oracle already built on this machine -> no build process spawned
    if os.path.exists(b.ORACLE):
        assert b.start_oracle_build() is None
        assert b.oracle_ready(None, 0.0)
