"""Multimodal plumbing tests: Arrow mapInPandas round-trip, stub decoder
determinism, frame sampling shape, metadata pushdown."""

import hashlib

from pyspark.sql import functions as F

from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.multimodal import (
    FEATURE_DIM,
    StubDecoder,
    extract_features,
    media_from_documents,
    sample_frames,
)

SF_DIR = "/root/testdata/sf0.001"


def _media(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return media_from_documents(docs)


def test_extract_features_round_trip(spark):
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.multimodal import (
        synth_payload,
    )

    media = _media(spark)
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == media.count()
    r = {x["media_id"]: x for x in rows}
    # verify against a locally computed expectation
    doc = spark.read.parquet(f"{SF_DIR}/documents.parquet").first()
    kind, payload, _ = synth_payload(doc["doc_id"])
    expect = StubDecoder().decode(kind, payload)
    got = r[doc["doc_id"]]
    assert got["n_bytes"] == len(payload)
    assert got["sha256"] == hashlib.sha256(payload).hexdigest()
    assert len(got["feature"]) == FEATURE_DIM
    assert [round(float(v), 6) for v in got["feature"]] == expect


def test_codec_round_trips():
    """encode → parse recovers the structural features exactly, for all
    three real containers, independent of Spark."""
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.multimodal import (
        encode_ppm,
        encode_wav,
        encode_y4m,
        parse_media,
    )

    rgb = bytes((i * 7) % 256 for i in range(3 * 5 * 4))
    p = parse_media(encode_ppm(5, 4, rgb))
    assert (p["format"], p["width"], p["height"]) == ("ppm", 5, 4)
    assert p["content_len"] == 60 and p["content_byte_sum"] == sum(rgb)

    pcm = bytes((i * 3) % 256 for i in range(1000))
    w = parse_media(encode_wav(8000, pcm))
    assert (w["format"], w["sample_rate"], w["n_samples"]) == ("wav", 8000, 1000)
    assert w["duration_ms"] == 125 and w["content_byte_sum"] == sum(pcm)

    frames = [bytes((i + f) % 256 for i in range(3 * 4 * 4)) for f in range(3)]
    v = parse_media(encode_y4m(4, 4, frames, fps=25))
    assert (v["format"], v["width"], v["height"], v["n_frames"]) == (
        "y4m", 4, 4, 3,
    )
    assert v["duration_ms"] == 120
    assert v["content_byte_sum"] == sum(sum(f) for f in frames)


def test_parse_media_rejects_unknown_container():
    import pytest

    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.multimodal import (
        parse_media,
    )

    with pytest.raises(ValueError):
        parse_media(b"GIF89a not a supported container")


def test_decode_media_detects_format_from_magic(spark):
    """decode_media parses real containers — format comes from payload
    magic bytes and matches the kind the synthesizer assigned."""
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.multimodal import (
        decode_media,
    )

    out = decode_media(_media(spark)).collect()
    expected_fmt = {"image": "ppm", "audio": "wav", "video": "y4m"}
    assert len(out) > 0
    for r in out:
        assert r["format"] == expected_fmt[r["kind"]]
        assert r["content_len"] > 0 and r["content_byte_sum"] > 0


def test_features_deterministic_across_runs(spark):
    media = _media(spark)
    a = {r["media_id"]: r["sha256"] for r in extract_features(media).collect()}
    b = {r["media_id"]: r["sha256"] for r in extract_features(media).collect()}
    assert a == b


def test_sample_frames_shape(spark):
    media = _media(spark)
    frames = sample_frames(media, every_ms=1000)
    vids = media.filter(F.col("kind") == "video")
    # one row per sampled frame; every video contributes ≥1 frame
    assert frames.select("media_id").distinct().count() == vids.count()
    f = frames.first()
    assert f["frame_payload"] is not None and len(f["frame_payload"]) > 0
    # non-video kinds never reach the decoder
    joined = frames.join(
        media.select("media_id", "kind"), "media_id"
    ).filter(F.col("kind") != "video")
    assert joined.count() == 0


def test_metadata_filter_prunes_payload_scan(spark, tmp_path):
    """Metadata predicates must reach the parquet scan without reading
    payload bytes: check PushedFilters in the physical plan."""
    media = _media(spark)
    path = str(tmp_path / "media")
    media.write.parquet(path)
    plan = (
        spark.read.parquet(path)
        .filter(F.col("kind") == "video")
        .select("media_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters" in plan and "kind" in plan


def test_resize_images_rewrites_payload_and_meta(spark, sf_dir):
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.multimodal import (
        media_from_documents,
        resize_images,
    )
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.sources.readers import (
        read_table,
    )

    media = media_from_documents(read_table(spark, sf_dir, "documents"))
    n_images = media.filter("kind = 'image'").count()
    out = resize_images(media, target_w=16, target_h=8)
    rows = out.collect()
    assert len(rows) == n_images > 0
    assert all(len(r["payload"]) == 16 * 8 for r in rows)
    assert all(r["meta"]["width"] == 16 and r["meta"]["height"] == 8 for r in rows)
    # deterministic: same input → same bytes
    again = {r["media_id"]: r["payload"] for r in resize_images(media, 16, 8).collect()}
    assert all(again[r["media_id"]] == r["payload"] for r in rows)


def test_parse_y4m_c420_default_colorspace():
    """y4m defaults to C420 (frame = 1.5·w·h); the parser must honor the
    colorspace token instead of assuming C444."""
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.multimodal import (
        parse_media,
    )

    w, h, frames = 4, 4, 2
    frame = bytes(range(w * h * 3 // 2))
    payload = b"YUV4MPEG2 W4 H4 F25:1\n" + (b"FRAME\n" + frame) * frames
    p = parse_media(payload)
    assert (p["format"], p["width"], p["height"], p["n_frames"]) == (
        "y4m", 4, 4, 2,
    )
    assert p["content_len"] == frames * len(frame)


def test_parse_wav_zero_rate_raises_value_error():
    import struct

    import pytest

    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.multimodal import (
        parse_media,
    )

    bad = (
        struct.pack(
            "<4sI4s4sIHHIIHH4sI",
            b"RIFF", 40, b"WAVE", b"fmt ", 16,
            1, 0, 0, 0, 1, 0,  # zero channels/rate/bits
            b"data", 4,
        )
        + b"abcd"
    )
    with pytest.raises(ValueError):
        parse_media(bad)
