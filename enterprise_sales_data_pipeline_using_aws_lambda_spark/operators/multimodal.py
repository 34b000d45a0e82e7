"""Multimodal column handling (north-star extension surface).

Media rides through the engine as an opaque ``binary`` payload column
plus typed metadata — the layout a 100 TB training-data pipeline needs:
payload bytes stay columnar in Parquet, metadata predicates
(kind/width/duration) push down without touching payloads, and decode
happens per-partition in Arrow-batched Python.

The actual image/audio/video codecs are NOT present in this
environment, so the decode step is pluggable: :class:`MediaDecoder`
implementations turn payload bytes into features.  The default
:class:`StubDecoder` is a deterministic fake (byte-statistics
"features") that keeps every piece of Spark plumbing — schema,
``mapInPandas`` signature, Arrow batch shape, partition parallelism —
real and testable; swapping in a Pillow/ffmpeg decoder changes one
function, not the dataflow.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_KINDS = ("image", "audio", "video")

#: Canonical media-table schema: opaque payload + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 8

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


class MediaDecoder:
    """Decode payload bytes → fixed-dim feature vector."""

    def decode(self, kind: str, payload: bytes) -> list[float]:
        raise NotImplementedError(
            "real decoders (Pillow/torchaudio/ffmpeg) are not available in "
            "this environment — plug one in by subclassing MediaDecoder"
        )


class StubDecoder(MediaDecoder):
    """Deterministic fake: 8 byte-histogram moments as 'features'.

    Stands in for the real decode so tests exercise the full Arrow
    round-trip with verifiable output."""

    def decode(self, kind: str, payload: bytes) -> list[float]:
        if not payload:
            return [0.0] * FEATURE_DIM
        n = len(payload)
        buckets = [0] * FEATURE_DIM
        for i, b in enumerate(payload):
            buckets[b % FEATURE_DIM] += 1
        return [round(c / n, 6) for c in buckets]


def extract_features(
    media: DataFrame, decoder: MediaDecoder | None = None
) -> DataFrame:
    """Per-item media features via ``mapInPandas``.

    Arrow moves (media_id, kind, payload) to Python in columnar batches;
    each partition decodes independently — on a cluster this scales with
    executors × cores, and payload bytes never pass through the driver.
    Output: (media_id, kind, n_bytes, sha256, feature[8])."""
    decoder = decoder or StubDecoder()

    def decode_partition(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(
                        lambda p: len(p) if p is not None else 0
                    ),
                    "sha256": payloads.map(
                        lambda p: hashlib.sha256(p or b"").hexdigest()
                    ),
                    "feature": [
                        decoder.decode(k, p or b"")
                        for k, p in zip(pdf["kind"], payloads)
                    ],
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        decode_partition, FEATURE_SCHEMA
    )


def sample_frames(
    media: DataFrame,
    every_ms: int = 1000,
    frame_bytes: int = 64,
) -> DataFrame:
    """Frame sampling for video payloads: one output row per sampled
    frame offset — the explode-shaped op a video pipeline needs.

    Without a real container parser the "frame" is a deterministic
    byte-slice at the sampled offset (stub), but the shape — metadata
    pushdown filter on ``kind``, per-row explode to (media_id, frame_idx,
    frame_payload) — is the production dataflow."""
    video = media.filter(F.col("kind") == "video")
    n_frames = F.greatest(
        (F.col("meta.duration_ms") / every_ms).cast("int"), F.lit(1)
    )
    idx = F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx")
    out = video.select("media_id", "meta.duration_ms", idx, "payload")
    offset = (
        (F.col("frame_idx") * F.length("payload"))
        / F.greatest(F.col("duration_ms") / every_ms, F.lit(1))
    ).cast("int")
    return out.select(
        "media_id",
        "frame_idx",
        F.substring(
            F.col("payload"), offset + 1, frame_bytes
        ).alias("frame_payload"),
    )


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a synthetic media table from the documents fixture (no real
    media in the test data): payload = utf-8 text bytes, kind assigned
    round-robin, plausible metadata. Deterministic — used by tests and
    the rows-only driver check."""
    kind = F.element_at(
        F.array(*[F.lit(k) for k in MEDIA_KINDS]),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.concat(F.lit("x-stub/"), kind).alias("mime"),
            F.lit(64).alias("width"),
            F.lit(64).alias("height"),
            (F.col("n_chars").cast("long") * 10).alias("duration_ms"),
        ).alias("meta"),
    )


RESIZED_SCHEMA = (
    "media_id long, payload binary, "
    "meta struct<mime:string, width:int, height:int, duration_ms:bigint>"
)


def resize_images(
    media: DataFrame, target_w: int = 32, target_h: int = 32
) -> DataFrame:
    """Image resize over the binary payload column (kind == 'image').

    Spark-side shape is production-real: metadata filter prunes at the
    scan, Arrow batches carry (media_id, payload, meta) to Python per
    partition, the transform runs vectorized per batch, and the typed
    ``meta`` struct is rewritten with the new dimensions — nothing
    driver-side.  The pixel work is pluggable: Pillow when importable,
    else a deterministic stub (payload folded to target_w × target_h
    bytes) so the plumbing is testable in this container (brief: image
    libs absent → stub the decode, keep the dataflow real)."""
    try:  # pragma: no cover - exercised only where Pillow exists
        from PIL import Image  # noqa: F401

        have_pil = True
    except Exception:
        have_pil = False

    def transform(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out_payload = []
            for p in pdf["payload"]:
                p = p or b""
                if have_pil:  # pragma: no cover
                    import io

                    from PIL import Image

                    img = Image.open(io.BytesIO(p)).resize((target_w, target_h))
                    buf = io.BytesIO()
                    img.save(buf, format="PNG")
                    out_payload.append(buf.getvalue())
                else:
                    size = target_w * target_h
                    # Fold payload bytes into a fixed-size buffer —
                    # deterministic, size-correct stand-in for pixels.
                    buf = bytearray(size)
                    for i, b in enumerate(p):
                        buf[i % size] ^= b
                    out_payload.append(bytes(buf))
            meta = pd.DataFrame(
                {
                    "mime": ["x-stub/image"] * len(pdf),
                    "width": [target_w] * len(pdf),
                    "height": [target_h] * len(pdf),
                    "duration_ms": [m["duration_ms"] for m in pdf["meta"]],
                }
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": out_payload,
                    "meta": meta.to_dict(orient="records"),
                }
            )

    images = media.filter(F.col("kind") == "image")
    return images.select("media_id", "payload", "meta").mapInPandas(
        transform, RESIZED_SCHEMA
    )
