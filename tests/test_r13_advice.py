"""Regression tests for the four round-13 advisor findings (ADVICE.md):

1. NULL-text documents must score quality 0.0, not a perfect 1.0
   (textstats.py — the n_tokens==0 guard missed NULL n_tokens under
   ANSI, and the DuckDB twin had the identical hole).
2. The Python DataSource's rate-limited stream must not regress its
   offset after a checkpoint restore (pydatasource.py — the observed
   Spark 4.1 sequence replays partitions() with the offset-log end
   BEFORE the first latestOffset(); see the round-15 amendment in the
   tests below).
3. semantic_dedup_k1 must survive a zero-norm embedding on BOTH
   engines (semdedup.py — the SQL twin divided by nv with no NULLIF;
   the pandas greedy's round6 raised OverflowError on inf).
4. unimax_allocation must not throw DIVIDE_BY_ZERO under ANSI for a
   language whose documents are all empty (curation.py — epochs used
   plain division where the DuckDB twin yields NULL).
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T


# ------------------------------------------------------------------
# 1. NULL-text quality score
# ------------------------------------------------------------------


def test_quality_score_null_text_is_zero(spark):
    from scala_data_pipeline_spark.ext.textstats import (
        quality_features,
        quality_score_sql,
    )

    docs = spark.createDataFrame(
        [(1, "the quick brown fox and the lazy dog"), (2, None), (3, "")],
        schema=T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("text", T.StringType()),
            ]
        ),
    )
    got = {
        r.doc_id: r.quality_score
        for r in quality_features(docs).collect()
    }
    assert got[2] == 0.0  # NULL text — was 1.0 before the guard
    assert got[3] == 0.0  # empty text
    assert got[1] > 0.0

    con = duckdb.connect()
    try:
        con.execute(
            "CREATE TABLE d(doc_id BIGINT, text VARCHAR);"
            "INSERT INTO d VALUES (1, 'the quick brown fox and the lazy dog'), (2, NULL), (3, '')"
        )
        want = dict(
            con.execute(
                f"SELECT doc_id, {quality_score_sql('text')} FROM d"
            ).fetchall()
        )
    finally:
        con.close()
    assert want == got  # engines agree, including the NULL-text row


# ------------------------------------------------------------------
# 2. DataSource stream offset after checkpoint restore
# ------------------------------------------------------------------


def test_stream_reader_offset_survives_restore():
    """Model the REAL Spark 4.1 restore sequence (captured from an
    instrumented run — offset log ends at 400, batch (300,400]
    uncommitted at the kill):

        partitions({'next':400}, {'next':400})   # offset-log seed
        partitions({'next':300}, {'next':400})   # replay the batch
        latestOffset -> {'next':500}

    The seed call must pin the high-water so admission resumes from
    400 (not min(mrt, total)); the replay must re-emit rows 300-400
    IN FULL — they were never committed (the round-14-suggested
    high-water clamp in partitions() dropped exactly this replay;
    probed 400/500 rows delivered)."""
    from scala_data_pipeline_spark.sources.pydatasource import _StreamReader

    opts = {
        "rowsperbatch": "100",
        "totalrows": "1000",
        "maxrowspertrigger": "100",
    }
    r2 = _StreamReader(opts)
    seed = r2.partitions({"next": 400}, {"next": 400})
    assert sum(hi - lo for lo, hi in (p.value for p in seed)) == 0
    replay = r2.partitions({"next": 300}, {"next": 400})
    covered = sorted(p.value for p in replay)
    assert covered[0][0] == 300 and covered[-1][1] == 400
    assert sum(hi - lo for lo, hi in covered) == 100  # full re-emit
    first = r2.latestOffset()
    assert first["next"] == 500  # resumes right after the seed


def test_stream_reader_never_reemits_committed_rows():
    """Defensive path (round-14 advisor, amended): a batch planned
    below THIS instance's committed floor emits only the uncommitted
    suffix — committed rows are never handed to the sink twice, even
    under a hypothetical engine that persisted a regressed offset."""
    from scala_data_pipeline_spark.sources.pydatasource import _StreamReader

    opts = {
        "rowsperbatch": "100",
        "totalrows": "1000",
        "maxrowspertrigger": "100",
    }
    r = _StreamReader(opts)
    r.initialOffset()
    for _ in range(3):
        end = r.latestOffset()
        r.partitions({"next": end["next"] - 100}, end)
        r.commit(end)
    assert end == {"next": 300}

    # Regressed batch fully below the committed floor → empty.
    below = r.partitions({"next": 100}, {"next": 200})
    assert sum(hi - lo for lo, hi in (p.value for p in below)) == 0
    # Straddling batch → only the uncommitted suffix.
    straddle = r.partitions({"next": 200}, {"next": 350})
    covered = sorted(p.value for p in straddle)
    assert covered[0][0] == 300 and covered[-1][1] == 350
    # Admission continues from the high-water, not from the regression.
    assert r.latestOffset() == {"next": 400}


# ------------------------------------------------------------------
# 3. Zero-norm embedding in semantic_dedup_k1 (both engines)
# ------------------------------------------------------------------


def _k1_fixture_rows():
    return [
        (1, [1.0, 0.0, 0.0]),
        (2, [1.0, 1e-7, 0.0]),  # near-dup of 1
        (3, [0.0, 0.0, 0.0]),  # zero-norm: sim undefined everywhere
        (4, [0.0, 1.0, 0.0]),
    ]


def test_semdedup_k1_zero_norm_both_engines(spark):
    from scala_data_pipeline_spark.ext.semdedup import (
        semantic_dedup_k1_exact,
        semantic_dedup_k1_sql,
    )

    corpus = spark.createDataFrame(
        _k1_fixture_rows(),
        schema=T.StructType(
            [
                T.StructField("vec_id", T.LongType()),
                T.StructField(
                    "embedding", T.ArrayType(T.FloatType())
                ),
            ]
        ),
    )
    got = (
        semantic_dedup_k1_exact(corpus, eps=0.05)
        .orderBy("vec_id")
        .toPandas()
    )
    # The zero-norm vector must be classified (kept: no defined pair
    # similarity can exceed the threshold) and nothing may crash.
    z = got[got.vec_id == 3].iloc[0]
    assert bool(z.keep)
    assert math.isnan(z.centroid_sim) or pd.isna(z.centroid_sim)
    # The near-dup pair must still collapse.
    assert int(got.keep.sum()) == 3

    con = duckdb.connect()
    try:
        con.execute(
            "CREATE TABLE embeddings(vec_id BIGINT, embedding FLOAT[])"
        )
        con.executemany(
            "INSERT INTO embeddings VALUES (?, ?)", _k1_fixture_rows()
        )
        want = (
            con.execute(semantic_dedup_k1_sql(eps=0.05))
            .df()
            .sort_values("vec_id", ignore_index=True)
        )
    finally:
        con.close()
    assert list(want.keep) == list(got.keep)
    assert list(want.dup_of.fillna(-1)) == list(
        got.dup_of.fillna(-1).astype("float64")
    )


# ------------------------------------------------------------------
# 4. UniMax with an all-empty language (ANSI divide-by-zero)
# ------------------------------------------------------------------


def test_unimax_empty_language_no_ansi_crash(spark):
    from scala_data_pipeline_spark.ext.curation import unimax_allocation

    docs = spark.createDataFrame(
        [
            ("en", "a b c d e f g h"),
            ("en", "i j k l"),
            ("xx", ""),  # all-empty language: n_tokens = 0
            ("de", "ein zwei drei"),
        ],
        ["lang", "text"],
    )
    rows = {r.lang: r for r in unimax_allocation(docs).collect()}
    assert rows["xx"].n_tokens == 0
    assert rows["xx"].capacity == 0.0
    assert rows["xx"].capped
    assert rows["xx"].epochs is None  # NULL, matching the DuckDB twin
    assert rows["en"].epochs is not None and rows["en"].epochs > 0
