"""Multimodal tests: real codec round-trips (incl. full PNG
decode across all five filter types), Arrow mapInPandas round-trip,
real pixel-decoder features, real resize/frame extraction, metadata
pushdown."""

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

    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.multimodal import (
        PixelDecoder,
    )

    media = _media(spark)
    feats = extract_features(media)   # default decoder = real PixelDecoder
    rows = feats.collect()
    assert len(rows) == media.count()
    r = {x["media_id"]: x for x in rows}
    # verify against a locally computed expectation
    doc = spark.read.parquet(f"{SF_DIR}/documents.parquet").first()
    kind, payload, _ = synth_payload(doc["doc_id"])
    expect = PixelDecoder().decode(kind, payload)
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
    expected_fmt = {"image": {"ppm", "png"}, "audio": {"wav"},
                    "video": {"y4m"}}
    assert len(out) > 0
    assert {r["format"] for r in out} == {"ppm", "png", "wav", "y4m"}
    for r in out:
        assert r["format"] in expected_fmt[r["kind"]]
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

    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.multimodal import (
        parse_media,
    )

    media = media_from_documents(read_table(spark, sf_dir, "documents"))
    n_images = media.filter("kind = 'image'").count()
    out = resize_images(media, target_w=16, target_h=8)
    rows = out.collect()
    assert len(rows) == n_images > 0
    # output payloads are REAL re-encoded containers at the new size
    for r in rows:
        feats = parse_media(bytes(r["payload"]))
        assert (feats["width"], feats["height"]) == (16, 8)
        assert feats["format"] in ("ppm", "png")
        assert feats["content_len"] == 3 * 16 * 8
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


def test_png_round_trip_every_filter_type():
    """encode_png with each filter type 0-4 → full decode recovers the
    raster byte-for-byte (inflate + Sub/Up/Average/Paeth unfilter)."""
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.multimodal import (
        _png_decode,
        encode_png,
        parse_media,
    )

    w, h = 7, 5
    raster = bytes((i * 31 + 7) % 256 for i in range(3 * w * h))
    for ft in range(5):
        payload = encode_png(w, h, raster, filters=[ft] * h)
        gw, gh, bpp, got = _png_decode(payload)
        assert (gw, gh, bpp) == (w, h, 3), ft
        assert got == raster, f"filter {ft} did not round-trip"
        feats = parse_media(payload)
        assert (feats["format"], feats["width"], feats["height"]) == (
            "png", w, h,
        )
        assert feats["content_byte_sum"] == sum(raster)
    # mixed filters across rows
    payload = encode_png(w, h, raster, filters=[0, 1, 2, 3, 4])
    assert _png_decode(payload)[3] == raster


def test_png_gray_and_rgba_color_types():
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.multimodal import (
        _png_decode,
        encode_png,
    )

    gray = bytes(range(6 * 4))
    assert _png_decode(encode_png(6, 4, gray, color_type=0))[3] == gray
    rgba = bytes((i * 5) % 256 for i in range(4 * 3 * 2))
    w, h, bpp, got = _png_decode(encode_png(3, 2, rgba, color_type=6))
    assert (w, h, bpp) == (3, 2, 4) and got == rgba


def test_png_corrupted_chunk_fails_crc():
    import pytest

    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.multimodal import (
        encode_png,
        parse_media,
    )

    payload = bytearray(encode_png(4, 4, bytes(48)))
    payload[-20] ^= 0xFF  # flip a byte inside IDAT
    with pytest.raises(ValueError, match="CRC"):
        parse_media(bytes(payload))


def test_pixel_decoder_features_from_decoded_content():
    """PixelDecoder features are statistics of the DECODED raster, not
    the compressed container bytes: a PNG and a PPM of the same raster
    produce identical features despite different payload bytes."""
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.multimodal import (
        PixelDecoder,
        encode_png,
        encode_ppm,
    )

    raster = bytes((i * 13) % 256 for i in range(3 * 6 * 6))
    d = PixelDecoder()
    f_png = d.decode("image", encode_png(6, 6, raster, filters=[4] * 6))
    f_ppm = d.decode("image", encode_ppm(6, 6, raster))
    assert f_png == f_ppm
    # spot-check the statistics against hand computation
    mean = sum(raster) / len(raster)
    assert f_png[0] == round(mean / 255.0, 6)
    assert f_png[2] == round(min(raster) / 255.0, 6)
    assert f_png[3] == round(max(raster) / 255.0, 6)


def test_resize_nearest_neighbor_exact(spark):
    """2x2 checkerboard upsampled to 4x4 through the Spark op must
    replicate each source pixel into a 2x2 block (exact NN semantics,
    checked per decoded byte, PNG in -> PNG out)."""
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        _png_decode,
        encode_png,
        resize_images,
    )

    black, white = (0, 0, 0), (255, 255, 255)
    px = [black, white, white, black]
    raster = bytes(b for p in px for b in p)
    media = spark.createDataFrame(
        [(1, "image", encode_png(2, 2, raster),
          {"mime": "image/png", "width": 2, "height": 2,
           "duration_ms": None})],
        MEDIA_SCHEMA,
    )
    [row] = resize_images(media, target_w=4, target_h=4).collect()
    w, h, bpp, got = _png_decode(bytes(row["payload"]))
    assert (w, h, bpp) == (4, 4, 3)
    expect = bytearray()
    for ty in range(4):
        for tx in range(4):
            expect.extend(px[(ty * 2 // 4) * 2 + (tx * 2 // 4)])
    assert got == bytes(expect)


def test_extract_frames_real_plane_bytes(spark):
    """extract_frames returns the exact decoded frame planes: frame i
    of a synth video equals the deterministic content slice."""
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.multimodal import (
        _content,
        _video_params,
        extract_frames,
        synth_payload,
    )

    media = _media(spark)
    frames = extract_frames(media, every_n=1).collect()
    assert len(frames) > 0
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r)
    for mid, rows in list(by_media.items())[:5]:
        kind, _, _ = synth_payload(mid)
        assert kind == "video"
        w, h, n_frames = _video_params(mid)
        assert len(rows) == n_frames
        flen = 3 * w * h
        raw = _content(mid, n_frames * flen)
        for r in sorted(rows, key=lambda x: x["frame_idx"]):
            i = r["frame_idx"]
            assert (r["width"], r["height"]) == (w, h)
            assert bytes(r["frame"]) == raw[i * flen : (i + 1) * flen]


def test_ahash_codec_invariance_and_gradient(spark):
    """The SAME raster encoded as PPM and as PNG (compressed, filtered)
    must produce the SAME aHash — the perceptual key sees pixels, not
    container bytes.  A left-dark/right-bright gradient pins the
    expected bit pattern."""
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.multimodal import (
        ahash_images,
        encode_png,
        encode_ppm,
    )

    w = h = 16
    raster = bytes(
        (255 if x >= w // 2 else 0)
        for _ in range(h)
        for x in range(w)
        for _ in range(3)
    )
    rows = [
        (1, "image", encode_ppm(w, h, raster)),
        (2, "image", encode_png(w, h, raster, color_type=2,
                                filters=[4] * h)),
        (3, "audio", b"RIFFxxxxWAVE"),  # ignored kind
    ]
    df = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary"
    )
    out = {r["media_id"]: r for r in ahash_images(df).collect()}
    assert set(out) == {1, 2}
    assert (out[1]["ahash_hi"], out[1]["ahash_lo"]) == (
        out[2]["ahash_hi"], out[2]["ahash_lo"],
    )
    # right half bright => bits gx>=4 set in every row => 32 bits set
    assert out[1]["n_bits"] == 32
    expected_row = sum(1 << gx for gx in range(4, 8))  # per 8-bit row
    lo = sum(expected_row << (8 * gy) for gy in range(4))
    hi = sum(expected_row << (8 * gy) for gy in range(4))
    assert out[1]["ahash_lo"] == lo and out[1]["ahash_hi"] == hi


def test_audio_fingerprint_contour_and_invariance(spark):
    """The audio analog of the aHash test: a clip whose second half is
    loud pins the expected bit pattern; the same PCM at a different
    sample rate (re-muxed container) fingerprints identically (the
    contour key sees samples, not header bytes); sub-n_frames clips
    and non-audio kinds are skipped."""
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.multimodal import (
        encode_wav,
        fingerprint_audio,
    )

    # 320 samples: first half silence (128 = center), second half
    # full-scale alternation => energy only in windows 16..31
    pcm = bytes([128] * 160 + [0, 255] * 80)
    rows = [
        (1, "audio", encode_wav(8000, pcm)),
        (2, "audio", encode_wav(16000, pcm)),      # re-muxed rate
        (3, "audio", encode_wav(8000, bytes([128] * 16))),  # too short
        (4, "image", b"P6\n1 1\n255\nabc"),        # ignored kind
    ]
    df = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary"
    )
    out = {r["media_id"]: r for r in fingerprint_audio(df).collect()}
    # the 16-sample clip (< 32 windows) and the image row are absent
    assert set(out) == {1, 2}
    # loud second half: bits 16..31 set, 16 bits total
    expected = sum(1 << f for f in range(16, 32))
    assert out[1]["afp"] == expected and out[1]["n_bits"] == 16
    assert out[1]["sample_rate"] == 8000 and out[1]["n_samples"] == 320
    # same samples, different container rate -> same fingerprint
    assert out[2]["afp"] == out[1]["afp"]
    assert out[2]["sample_rate"] == 16000


def test_video_frame_ahash_luma_only_and_pattern(spark):
    """Per-frame video aHash: a left-dark/right-bright LUMA plane pins
    the expected bit pattern; chroma (U/V) planes must not affect the
    hash; every frame of a clip gets its own row; non-video kinds are
    ignored."""
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.multimodal import (
        ahash_video_frames,
        encode_y4m,
    )

    w = h = 8
    y_grad = bytes(
        (255 if x >= w // 2 else 0) for _ in range(h) for x in range(w)
    )
    uv_a = bytes([7] * (2 * w * h))
    uv_b = bytes([200] * (2 * w * h))
    dark = bytes([0] * (3 * w * h))
    rows = [
        # two frames: gradient then all-dark
        (1, "video", encode_y4m(w, h, [y_grad + uv_a, dark])),
        # same luma, different chroma -> same per-frame hashes
        (2, "video", encode_y4m(w, h, [y_grad + uv_b, dark])),
        (3, "audio", b"RIFFxxxxWAVE"),  # ignored kind
    ]
    df = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary"
    )
    out = {}
    for r in ahash_video_frames(df).collect():
        out[(r["media_id"], r["frame_idx"])] = r
    assert set(out) == {(1, 0), (1, 1), (2, 0), (2, 1)}
    # right half bright => bits gx>=4 in every grid row, 32 bits set
    expected_row = sum(1 << gx for gx in range(4, 8))
    lo = hi = sum(expected_row << (8 * gy) for gy in range(4))
    r0 = out[(1, 0)]
    assert (r0["fhash_lo"], r0["fhash_hi"], r0["n_bits"]) == (lo, hi, 32)
    # all-dark frame: no bit exceeds the mean strictly
    assert out[(1, 1)]["n_bits"] == 0
    # chroma-invariant
    assert (out[(2, 0)]["fhash_lo"], out[(2, 0)]["fhash_hi"]) == (
        r0["fhash_lo"], r0["fhash_hi"],
    )


def test_fingerprint_skips_nonstandard_pcm_and_headeronly_video(spark):
    """Degenerate-input policy for the new fingerprint operators: a
    16-bit WAV (interleaved bytes are not samples) and a header-only
    Y4M (zero frames) are skipped, not crashed on or mis-keyed."""
    import struct

    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.multimodal import (
        ahash_video_frames,
        encode_wav,
        fingerprint_audio,
    )

    # valid 16-bit mono WAV: fmt says bits=16, data = 64 samples
    wav16 = (
        struct.pack(
            "<4sI4s4sIHHIIHH4sI",
            b"RIFF", 36 + 128, b"WAVE", b"fmt ", 16,
            1, 1, 8000, 16000, 2, 16,
            b"data", 128,
        )
        + bytes(range(128))
    )
    header_only_y4m = b"YUV4MPEG2 W4 H4 F25:1 Ip A1:1 C444\n"
    rows = [
        (1, "audio", wav16),
        (2, "audio", encode_wav(8000, bytes([128] * 64))),  # valid 8-bit
        (3, "video", header_only_y4m),
    ]
    df = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary"
    )
    audio = {r["media_id"] for r in fingerprint_audio(df).collect()}
    assert audio == {2}  # 16-bit clip skipped, 8-bit fingerprinted
    assert ahash_video_frames(df).collect() == []  # no crash, no rows


def test_parse_media_error_contract_on_malformed_containers():
    """Every malformed container raises ValueError (the quarantine
    contract) — never struct.error / KeyError / silent wrong stats."""
    import struct as _struct

    import pytest

    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.multimodal import (
        encode_png,
        parse_media,
    )

    # WAV: short fmt body
    short_fmt = (
        _struct.pack("<4sI4s4sI", b"RIFF", 20, b"WAVE", b"fmt ", 8)
        + b"\x01\x00\x01\x00\x40\x1f\x00\x00"
    )
    with pytest.raises(ValueError):
        parse_media(short_fmt)
    # WAV: data chunk declares more bytes than present
    trunc = (
        _struct.pack(
            "<4sI4s4sIHHIIHH4sI",
            b"RIFF", 36 + 1000, b"WAVE", b"fmt ", 16,
            1, 1, 8000, 8000, 1, 8, b"data", 1000,
        )
        + b"0123456789"
    )
    with pytest.raises(ValueError):
        parse_media(trunc)
    # y4m: missing mandatory W
    with pytest.raises(ValueError):
        parse_media(b"YUV4MPEG2 H4 F25:1\nFRAME\n")
    # PPM: zero dimensions
    with pytest.raises(ValueError):
        parse_media(b"P6\n0 4\n255\n")
    # PNG: zero dimensions (valid CRCs, w=0)
    import zlib as _zlib

    def _chunk(ctype, body):
        crc = _zlib.crc32(ctype + body) & 0xFFFFFFFF
        return (
            _struct.pack(">I", len(body)) + ctype + body
            + _struct.pack(">I", crc)
        )

    ihdr = _struct.pack(">IIBBBBB", 0, 4, 8, 2, 0, 0, 0)
    png0 = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", _zlib.compress(b""))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        parse_media(png0)
    # sanity: a well-formed PNG still parses
    ok = encode_png(2, 2, bytes(12))
    assert parse_media(ok)["format"] == "png"


def test_ahash_handles_gray_rgba_and_mismatched_payloads(spark):
    """aHash must decode 1- and 4-channel PNGs correctly (gray crashes
    a 3-byte-per-pixel read; RGBA silently misaligns it), skip rows
    whose payload is not an image container, and skip NULL payloads —
    across all three fingerprint operators."""
    from enterprise_sales_data_pipeline_using_aws_lambda_spark.operators.multimodal import (
        ahash_images,
        ahash_video_frames,
        encode_png,
        encode_wav,
        fingerprint_audio,
    )

    w = h = 8
    gray = bytes((255 if x >= 4 else 0) for _ in range(h) for x in range(w))
    rgb = bytes(v for g in gray for v in (g, g, g))
    rgba = bytes(v for g in gray for v in (g, g, g, 255))
    rows = [
        (1, "image", encode_png(w, h, gray, color_type=0)),
        (2, "image", encode_png(w, h, rgb, color_type=2)),
        (3, "image", encode_png(w, h, rgba, color_type=6)),
        (4, "image", encode_wav(8000, bytes([128] * 64))),  # kind lies
        (5, "image", None),                                  # null payload
        (6, "audio", encode_png(w, h, rgb, color_type=2)),   # kind lies
        (7, "video", encode_wav(8000, bytes([128] * 64))),   # kind lies
    ]
    df = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary"
    )
    out = {r["media_id"]: r for r in ahash_images(df).collect()}
    assert set(out) == {1, 2, 3}
    # same underlying luma -> identical hash across gray/RGB/RGBA
    assert (
        out[1]["ahash_lo"], out[1]["ahash_hi"]
    ) == (out[2]["ahash_lo"], out[2]["ahash_hi"]) == (
        out[3]["ahash_lo"], out[3]["ahash_hi"],
    )
    assert out[1]["n_bits"] == 32  # bright right half
    assert fingerprint_audio(df).collect() == []   # row 6 skipped
    assert ahash_video_frames(df).collect() == []  # row 7 skipped
