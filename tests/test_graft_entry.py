"""Validate the driver entry points on the virtual CPU mesh."""

import sys
import os

# full-fidelity end-to-end tier: run quick tier with `pytest -m 'not slow'`
pytestmark = __import__('pytest').mark.slow

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_dryrun_multichip():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)
