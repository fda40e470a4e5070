"""Test fixtures.

The reference (/root/reference, read-only) is vendored as the ORACLE only —
imported at test time to compute expected outputs, never used by the engine.
"""

from __future__ import annotations

import sys

import pytest

REFERENCE_SRC = "/root/reference/src"
if REFERENCE_SRC not in sys.path:
    sys.path.insert(0, REFERENCE_SRC)


@pytest.fixture(scope="session")
def ref():
    import dhtmlparser3  # the vendored reference oracle

    return dhtmlparser3


@pytest.fixture(scope="session")
def spark():
    from dhtmlparser3_spark.plans.session import get_spark

    s = get_spark(app_name="tests", cpus=4, shuffle_partitions=8)
    yield s
    s.stop()
