"""Document chunking: native operator vs Python UDTF twin, plus window
edge cases (the oracle-parity sweep covers the native path on the real
tables)."""

from __future__ import annotations

from scala_data_pipeline_spark.ext.chunking import (
    ChunkDocumentsUDTF,
    chunk_documents,
)


def test_chunk_edges(spark):
    docs = spark.createDataFrame(
        [
            (0, " ".join(f"t{i}" for i in range(80))),  # 80 toks -> 3 chunks
            (1, "a b c"),  # shorter than window -> one whole-doc chunk
            (2, " ".join(f"t{i}" for i in range(32))),  # exactly one window
        ],
        ["doc_id", "text"],
    )
    rows = sorted(
        (r["doc_id"], r["chunk_idx"], r["n_tokens"])
        for r in chunk_documents(docs).collect()
    )
    # doc 0: starts 0, 24, 48 (last full window start = 80-32 = 48)
    assert rows == [
        (0, 0, 32),
        (0, 1, 32),
        (0, 2, 32),
        (1, 0, 3),
        (2, 0, 32),
    ]


def test_pack_sequences_bins(spark):
    from scala_data_pipeline_spark.ext.chunking import pack_sequences

    docs = spark.createDataFrame(
        [
            (0, "s0", " ".join(["w"] * 300)),
            (1, "s0", " ".join(["w"] * 300)),  # 300+300 > 512 -> overflows bin 0
            (2, "s0", " ".join(["w"] * 10)),   # cum 600 -> bin 1
            (3, "s1", " ".join(["w"] * 5)),    # separate shard restarts at bin 0
        ],
        ["doc_id", "source", "text"],
    )
    got = {
        r["doc_id"]: (r["bin_id"], r["n_tokens"])
        for r in pack_sequences(docs).collect()
    }
    assert got == {0: (0, 300), 1: (0, 300), 2: (1, 10), 3: (0, 5)}


def test_udtf_matches_native(spark, sf_dir):
    from scala_data_pipeline_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    spark.udtf.register("chunk_documents_udtf", ChunkDocumentsUDTF)
    docs.createOrReplaceTempView("chunk_src")
    via_udtf = spark.sql("SELECT * FROM chunk_documents_udtf(TABLE(chunk_src))")
    native = chunk_documents(docs)
    a = sorted(map(tuple, native.collect()))
    b = sorted(map(tuple, via_udtf.collect()))
    assert a == b and len(a) > 0
