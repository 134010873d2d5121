"""Multimodal column plumbing: schema contract, Arrow batch iteration,
decode-stub gating."""

from __future__ import annotations

import pytest
from pyspark.sql.types import BinaryType

from scala_data_pipeline_spark.ext.multimodal import (
    FEATURE_SCHEMA,
    decode_stub,
    extract_features,
    to_media_frame,
)
from scala_data_pipeline_spark.sources import load_table


def test_media_frame_schema(spark, sf_dir):
    media = to_media_frame(load_table(spark, sf_dir, "documents"))
    assert isinstance(media.schema["payload"].dataType, BinaryType)
    row = media.limit(1).collect()[0]
    assert row.n_bytes == len(row.payload)
    assert row.media_type == "fake/utf8"


def test_extract_features_fake(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    media = to_media_frame(docs)
    feats = extract_features(media, fake=True)
    assert feats.schema == FEATURE_SCHEMA
    joined = feats.join(docs, on="doc_id").limit(5).collect()
    for r in joined:
        assert r.n_bytes == len(r.text.encode())
        assert r.head_hex == r.text.encode()[:8].hex()
        assert r.first_byte == r.text.encode()[0]


def test_decode_stub_raises(spark, sf_dir):
    from scala_data_pipeline_spark.ext.multimodal import HAS_PIL

    if not HAS_PIL:
        with pytest.raises(NotImplementedError, match="media decoder"):
            decode_stub(b"bytes", "image/png")
    # Non-image media types have no decoder regardless of Pillow.
    with pytest.raises(NotImplementedError, match="media decoder"):
        decode_stub(b"bytes", "audio/wav")
    media = to_media_frame(load_table(spark, sf_dir, "documents")).limit(2)
    real_path = extract_features(media, fake=False)
    with pytest.raises(Exception, match="media decoder|NotImplementedError"):
        real_path.collect()


def test_image_features_real_decode(spark):
    """Real Pillow decode through the Arrow path — runs wherever Pillow
    is importable (absent in this container: ENV_PROBES.md)."""
    from scala_data_pipeline_spark.ext.multimodal import (
        HAS_PIL,
        image_features,
    )

    if not HAS_PIL:
        pytest.skip("Pillow not importable in this container (ENV_PROBES.md)")
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (7, 5)).save(buf, format="PNG")
    media = spark.createDataFrame(
        [(1, "image/png", bytearray(buf.getvalue()), len(buf.getvalue()))],
        schema="doc_id long, media_type string, payload binary, n_bytes long",
    )
    row = image_features(media).collect()[0]
    assert (row.width, row.height, row.mode) == (7, 5, "RGB")


def test_binaryfile_ingest_to_features(spark, tmp_path):
    """binaryFile source → media frame → Arrow feature extraction: the
    real multimodal ingest path (payloads here are synthetic bytes; a
    decoder would slot into extract_features' non-fake branch)."""
    import os

    from scala_data_pipeline_spark.ext.multimodal import (
        extract_features,
        read_media_dir,
    )

    root = tmp_path / "media" / "shard=0"
    os.makedirs(root)
    blobs = {"a.img": b"\x89PNGfakebytes", "b.img": b"RIFFfakewav", "c.txt": b"x"}
    for name, data in blobs.items():
        (root / name).write_bytes(data)
    media = read_media_dir(spark, str(tmp_path / "media"), glob="*.img")
    rows = {r["file_name"]: r for r in media.collect()}
    assert set(rows) == {"a.img", "b.img"}  # pathGlobFilter applied
    assert rows["a.img"]["n_bytes"] == len(blobs["a.img"])
    assert bytes(rows["a.img"]["payload"]) == blobs["a.img"]
    # extract_features' Arrow schema types doc_id as long — derive a
    # stable numeric id from the file name, as a real ingest would
    from pyspark.sql import functions as F

    with_ids = media.withColumn("doc_id", F.xxhash64("file_name"))
    id_of = {r["file_name"]: r["doc_id"] for r in with_ids.collect()}
    feats = extract_features(with_ids, fake=True)
    got = {r["doc_id"]: r for r in feats.collect()}
    assert got[id_of["a.img"]]["n_bytes"] == len(blobs["a.img"])
    assert got[id_of["a.img"]]["first_byte"] == 0x89


def test_sample_frames_fanout_and_contract(spark):
    from scala_data_pipeline_spark.ext.multimodal import (
        sample_frames,
        to_media_frame,
    )

    docs = spark.createDataFrame(
        [(0, "x" * 100), (1, "y" * 31), (2, "")], ["doc_id", "text"]
    )
    frames = sample_frames(
        to_media_frame(docs), frame_bytes=32, every_k=2
    ).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # 100 bytes → 4 frames (32,32,32,4), every 2nd → idx 0 and 2
    assert sorted(r["frame_idx"] for r in by_doc[0]) == [0, 2]
    assert all(r["frame_n_bytes"] <= 32 for r in by_doc[0])
    # 31 bytes → 1 frame, kept
    assert [r["frame_n_bytes"] for r in by_doc[1]] == [31]
    # empty payload → no frames, doc absent (one-to-many can be
    # one-to-zero)
    assert 2 not in by_doc


def test_resize_thumbnail_size_contract(spark):
    from scala_data_pipeline_spark.ext.multimodal import (
        resize_thumbnail,
        to_media_frame,
    )

    docs = spark.createDataFrame(
        [(0, "abcdefghijklmnopqrstuvwxyz"), (1, "ab"), (2, "")],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r
        for r in resize_thumbnail(to_media_frame(docs), max_bytes=16).collect()
    }
    assert got[0]["thumb_n_bytes"] == 16  # truncated to the contract
    assert got[0]["n_bytes"] == 26
    assert got[1]["thumb_n_bytes"] == 2  # already under the cap
    assert got[2]["thumb_n_bytes"] == 0 and got[2]["thumb_hex"] == ""
    assert bytes.fromhex(got[0]["thumb_hex"]) == b"abcdefghijklmnop"


def test_arrow_lane_matches_pandas_lane(spark):
    """extract_features_arrow (mapInArrow, zero-copy) must be
    bit-identical to extract_features (mapInPandas) — same fake
    byte-level features, two exchange lanes."""
    from scala_data_pipeline_spark.ext.multimodal import (
        extract_features,
        extract_features_arrow,
        to_media_frame,
    )
    from scala_data_pipeline_spark.sources import load_table

    media = to_media_frame(
        load_table(spark, "/root/testdata/sf0.001", "documents")
    )
    a = {r["doc_id"]: r.asDict() for r in extract_features(media).collect()}
    b = {
        r["doc_id"]: r.asDict()
        for r in extract_features_arrow(media).collect()
    }
    assert a == b
