"""SCD2 merge: every branch on a hand-built dimension."""

from __future__ import annotations

from scala_data_pipeline_spark.operators.scd import OPEN_END, scd2_apply


def test_scd2_branches(spark):
    dim = spark.createDataFrame(
        [
            # unchanged current
            (1, "alice", 10.0, "2024-01-01", OPEN_END, True),
            # will change
            (2, "bob", 20.0, "2024-01-01", OPEN_END, True),
            # history row of key 2 — must pass through untouched
            (2, "bob", 15.0, "2023-01-01", "2024-01-01", False),
            # current row not in updates
            (3, "carol", 30.0, "2024-01-01", OPEN_END, True),
        ],
        ["cust_key", "name", "acctbal", "effective_from", "effective_to", "is_current"],
    )
    updates = spark.createDataFrame(
        [
            (1, "alice", 10.0),  # no-op
            (2, "bob", 99.0),  # change
            (4, "dave", 5.0),  # new key
        ],
        ["cust_key", "name", "acctbal"],
    )
    out = scd2_apply(dim, updates, "cust_key", ["name", "acctbal"], "2024-06-01")
    rows = sorted(
        map(tuple, out.collect()), key=lambda r: (r[0], r[3], r[4])
    )
    assert rows == [
        (1, "alice", 10.0, "2024-01-01", OPEN_END, True),
        (2, "bob", 15.0, "2023-01-01", "2024-01-01", False),
        (2, "bob", 20.0, "2024-01-01", "2024-06-01", False),
        (2, "bob", 99.0, "2024-06-01", OPEN_END, True),
        (3, "carol", 30.0, "2024-01-01", OPEN_END, True),
        (4, "dave", 5.0, "2024-06-01", OPEN_END, True),
    ]
