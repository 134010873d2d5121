"""Registry lint: every DRIVER-SLOT query must be non-empty at the
driver's correctness scale factor.

Round-7 verdict finding #1: two driver slots (``graph_kcore``,
``survival_km_users``) were "green" on hash-matching EMPTY frames at
sf0.01 — the external oracle check verified nothing. A driver slot is
the scarce external verification resource; a rotation must never again
promote a query whose output is vacuous at the SF the driver actually
checks. Extras are exempt (they are parity-checked at sf0.001 where
some parameterizations legitimately produce empty frames).
"""

from __future__ import annotations

import os

import pytest

from scala_data_pipeline_spark.queries import all_queries

# The driver's correctness SF, NOT the local test SF: vacuousness at
# sf0.01 is exactly the failure mode this lint exists to catch.
DRIVER_SF_DIR = os.environ.get(
    "SPARK_GRAFT_DRIVER_SF_DIR", "/root/testdata/sf0.01"
)

_needs_data = pytest.mark.skipif(
    not os.path.isdir(DRIVER_SF_DIR),
    reason=f"driver-SF testdata missing at {DRIVER_SF_DIR}",
)


@pytest.mark.heavy
@_needs_data
@pytest.mark.parametrize("name", sorted(all_queries()))
def test_driver_slot_nonempty_at_driver_sf(spark, name):
    df = all_queries()[name](spark, DRIVER_SF_DIR)
    assert df.limit(1).count() > 0, (
        f"driver-slot query {name!r} returns an EMPTY frame at the "
        f"driver's correctness SF ({DRIVER_SF_DIR}) — its driver row "
        "would be a vacuous hash-match of nothing; recalibrate its "
        "parameters or demote it to EXTRA_QUERIES"
    )
