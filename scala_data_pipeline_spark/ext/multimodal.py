"""Multimodal columns: image/audio/video as opaque ``binary`` with typed
metadata, processed by Arrow-batched ``mapInPandas``.

The Spark-side plumbing is real and tested: schema contract, binary
payload column, per-partition batch iteration, typed output schema. The
actual media decode is STUBBED (`NotImplementedError`) because no
image/audio libraries exist in this container — ``decode_stub`` marks
exactly where PIL/librosa/av would plug in, and the ``fake`` path
computes deterministic features from the raw bytes so the pipeline is
end-to-end testable (and oracle-checkable, since the fakes are pure
byte arithmetic).

Scale notes: ``mapInPandas`` streams Arrow batches — memory is bounded
by ``spark.sql.execution.arrow.maxRecordsPerBatch`` regardless of
partition size, which is what makes a 100 TB binary-column scan safe.
Partitioning: media blobs are large; repartition by size (bin-packing on
``n_bytes``) before heavy decode so task skew stays bounded.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("n_bytes", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("head_hex", StringType()),
        StructField("first_byte", LongType()),
    ]
)


def to_media_frame(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """documents → media frame: utf-8 bytes of text stand in for an
    image/audio payload; real pipelines read the blob column directly."""
    payload = F.encode(F.col(text_col), "utf-8")
    return docs.select(
        "doc_id",
        F.lit("fake/utf8").alias("media_type"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
    )


def decode_stub(payload: bytes, media_type: str):
    """Where a real decoder plugs in (PIL.Image.open / librosa.load /
    av.open). Not implementable in this container."""
    raise NotImplementedError(
        f"no media decoder available for {media_type!r}; "
        "install pillow/librosa/av and dispatch on media_type here"
    )


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over the payload column.

    ``fake=True`` computes deterministic byte-level features (length,
    head bytes hex, first byte) standing in for width/height/duration;
    ``fake=False`` routes through :func:`decode_stub` and raises until a
    decoder is installed.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                pdf["payload"].map(
                    lambda b: decode_stub(bytes(b), "fake/utf8")
                )
            payloads = pdf["payload"].map(bytes)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "head_hex": payloads.map(lambda b: b[:8].hex()),
                    "first_byte": payloads.map(
                        lambda b: b[0] if b else -1
                    ).astype("int64"),
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def read_media_dir(spark, path: str, glob: str | None = None):
    """Ingest raw media files as a media frame via Spark's binaryFile
    source — the canonical 100 TB pattern for image/audio/video: each
    file becomes (path, modificationTime, length, content) with the
    blob read ONCE, lazily, split across tasks by file. ``glob`` maps
    to pathGlobFilter (e.g. ``*.jpg``); recursive lookup is on so a
    sharded layout (dir per shard) scans in one pass."""
    from pyspark.sql import functions as F

    reader = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
    )
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    raw = reader.load(path)
    return raw.select(
        F.regexp_extract(F.col("path"), r"([^/]+)$", 1).alias("file_name"),
        F.lit("binary/file").alias("media_type"),
        F.col("content").alias("payload"),
        F.col("length").cast("long").alias("n_bytes"),
    )
