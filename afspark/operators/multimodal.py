"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a struct of metadata;
decode / feature-extract / resize / frame-sample are Arrow-batched
``mapInPandas`` stages.  The actual codec libraries are NOT in this
container, so the decode step is STUBBED: ``decode_media`` raises
NotImplementedError unless ``fake=True``, which substitutes a
deterministic byte-derived decode so the Spark-side plumbing (schema,
batching, partitioning, UDF signatures) is real and tested end-to-end.
Swapping in PIL/ffmpeg later changes ONLY the numpy body marked below.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)


def media_from_pages(pages: DataFrame) -> DataFrame:
    """Treat page html as an opaque media payload (plumbing demo/source)."""
    return pages.select(
        F.xxhash64("url").alias("media_id"),
        F.lit("image").alias("kind"),
        F.col("html").alias("payload"),
        F.struct(
            F.lit("text/html").alias("mime"),
            F.octet_length("html").cast("int").alias("width"),
            F.lit(1).cast("int").alias("height"),
            F.lit(0).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes, out_hw: tuple[int, int]) -> np.ndarray:
    """Deterministic stand-in for a real image decode (STUB).

    Tiles the payload bytes into an (h, w) uint8 array — stable under
    repartitioning, exercises exactly the batch shapes a real decoder
    would produce.
    """
    h, w = out_hw
    buf = np.frombuffer(payload or b"\x00", dtype=np.uint8)
    reps = -(-(h * w) // len(buf))
    return np.tile(buf, reps)[: h * w].reshape(h, w)


def _pil_available() -> bool:
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def _real_decode(payload: bytes, out_hw: tuple[int, int]) -> np.ndarray:
    """REAL image decode: PIL -> grayscale -> resize.  Import inside the
    function so only tasks that take this path need the library."""
    import io

    from PIL import Image

    h, w = out_hw
    with Image.open(io.BytesIO(payload)) as im:
        return np.asarray(im.convert("L").resize((w, h)), dtype=np.uint8)


def decode_media(
    media: DataFrame, out_h: int = 16, out_w: int = 16, fake: bool = False
) -> DataFrame:
    """payload -> fixed-size grayscale 'pixels' (array<int>), resized.

    Decode body is chosen at plan time behind an optional import: when
    Pillow is installed, fake=False decodes real image bytes
    (grayscale + resize); in codec-less environments (this container) it
    raises NotImplementedError, and fake=True substitutes a deterministic
    byte-derived stub so the Spark-side plumbing (schema, batching,
    partitioning, UDF signatures) stays real and tested.
    """
    if not fake and not _pil_available():
        raise NotImplementedError(
            "media decode requires Pillow (PIL), not present in this "
            "environment; pass fake=True for the deterministic stub"
        )
    body = _fake_decode if fake else _real_decode

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pixels = [
                body(bytes(p) if p is not None else b"", (out_h, out_w))
                .ravel()
                .astype("int32")
                .tolist()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "kind": pdf["kind"].to_numpy(),
                    "h": out_h,
                    "w": out_w,
                    "pixels": pixels,
                }
            )

    return media.mapInPandas(
        run, "media_id long, kind string, h int, w int, pixels array<int>"
    )


def media_features(decoded: DataFrame) -> DataFrame:
    """Per-media features from decoded pixels — a real numpy stage
    (histogram moments) that would be identical with a real decoder."""

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            px = [np.asarray(p, dtype=np.float64) for p in pdf["pixels"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "mean_px": [float(x.mean()) for x in px],
                    "std_px": [float(x.std()) for x in px],
                    "p95_px": [float(np.percentile(x, 95)) for x in px],
                    "entropy_px": [
                        float(
                            -(p := np.bincount(x.astype(np.int64) % 256, minlength=256) / len(x))[
                                p > 0
                            ].dot(np.log2(p[p > 0]))
                        )
                        for x in px
                    ],
                }
            )

    return decoded.mapInPandas(
        run,
        "media_id long, mean_px double, std_px double, p95_px double, entropy_px double",
    )


def frame_sample(
    media: DataFrame, every_ms: int = 1000, max_frames: int = 8, fake: bool = False
) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame.

    Real implementation seeks keyframes via ffmpeg; the stub derives
    deterministic per-frame offsets from the payload.
    """
    if not fake:
        raise NotImplementedError(
            "frame sampling requires ffmpeg; pass fake=True for the stub"
        )
    frames = media.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.least(
                    F.greatest(F.col("meta.duration_ms") / every_ms, F.lit(0)),
                    F.lit(max_frames - 1),
                ).cast("int"),
            )
        ).alias("frame_idx"),
        "payload",
    )
    return frames.select(
        "media_id",
        "frame_idx",
        (F.col("frame_idx") * every_ms).alias("ts_ms"),
        F.xxhash64("payload", "frame_idx").alias("frame_fingerprint"),
    )
