"""Multimodal column handling: image/audio/video as opaque BINARY
columns with typed metadata. The Spark-side plumbing (schemas,
partition sizing, Arrow batch shape, UDF signatures) is real and
tested; the actual media decode is STUBBED behind a deterministic
fake, clearly marked, because no image/audio libraries exist in this
container. Production swap: pass ``kernel="pil"`` to
extract_features/resize_images — the real Pillow kernels
(_pil_decode/_pil_resize) resolve by name inside the UDF on each
executor; scripts/media_smoke.py is the proof run where Pillow
exists, and tests exercise the "pil" code path against a fake PIL.

Scale notes: media blobs are large -> repartition by size budget
before the UDF (`partition_by_bytes`), keep blobs OUT of shuffles
(extract features first, join features later), and never collect
binary columns.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("meta", T.StructType([
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("duration_ms", T.IntegerType()),
            T.StructField("mime", T.StringType()),
        ])),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _decode_image_stub(payload: bytes, dim: int = 16) -> np.ndarray:
    """STUB — deterministic fake 'decode + feature extract'.

    Real implementation would be:
        img = PIL.Image.open(io.BytesIO(payload)); resize; model(img)
    Raising NotImplementedError here would kill the pipeline test, so
    we derive a deterministic pseudo-feature from the bytes instead;
    the Spark plumbing around it (batching, schema, shapes) is exactly
    what the real decoder would use.
    """
    arr = np.frombuffer(payload[: dim * 8], dtype=np.uint8).astype(np.float32)
    if arr.size < dim:
        arr = np.pad(arr, (0, dim - arr.size))
    return (arr[:dim] / 255.0).astype(np.float32)


def _pil_decode(payload: bytes, dim: int) -> np.ndarray:
    """Real decode + feature kernel (requires PIL): decode the image,
    grayscale, resize to a dim-length strip, normalize to [0, 1]."""
    import io

    from PIL import Image  # resolved executor-side; see _resolve_kernels

    img = Image.open(io.BytesIO(payload)).convert("L").resize((dim, 1))
    return (
        np.asarray(img, dtype=np.float32).reshape(dim) / np.float32(255.0)
    )


def _pil_resize(payload: bytes, width: int, height: int) -> bytes:
    """Real resize kernel (requires PIL). Grayscale first so the
    output size stays a pure function of the target shape
    (width*height bytes) — the property the partitioning plumbing
    depends on, same as the stub."""
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(payload)).convert("L")
    return img.resize((width, height)).tobytes()


def _resolve_kernels(kernel: str):
    """Kernels are resolved BY NAME inside the UDF on each executor
    (a driver-side function swap would not survive the worker's module
    re-import; a name does). "stub" = the deterministic fakes;
    "pil" = real decode/resize where Pillow is installed (see
    scripts/media_smoke.py for the real-library proof run)."""
    kernels = {
        "stub": (_decode_image_stub, _resize_image_stub),
        "pil": (_pil_decode, _pil_resize),
    }
    try:
        return kernels[kernel]
    except KeyError:
        raise ValueError(
            f"unknown media kernel {kernel!r}; choose from "
            f"{sorted(kernels)}"
        ) from None


def extract_features(
    media: DataFrame, dim: int = 16, kernel: str = "stub"
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads; Arrow
    batches bounded by bytes, one feature vector per media row.
    ``kernel``: "stub" (deterministic fake — this sandbox) or "pil"
    (real decode; import happens executor-side inside the UDF)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        decode, _ = _resolve_kernels(kernel)
        for pdf in batches:
            feats = [decode(bytes(p), dim).tolist() for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "feature": feats,
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        run, schema=FEATURE_SCHEMA
    )


def _resize_image_stub(payload: bytes, width: int, height: int) -> bytes:
    """STUB — deterministic fake resize.

    Real implementation:
        img = PIL.Image.open(io.BytesIO(payload))
        return img.resize((width, height)).tobytes()
    No media libs exist in this container, so the stub emits a
    deterministic pseudo-bitmap of exactly width*height bytes derived
    from the payload (tiled), preserving the property the plumbing
    depends on: output size is a pure function of the target shape,
    not the input size."""
    if not payload:
        payload = b"\x00"
    n = width * height
    reps = (n // len(payload)) + 1
    return (payload * reps)[:n]


def resize_images(
    media: DataFrame, width: int, height: int, kernel: str = "stub"
) -> DataFrame:
    """mapInPandas image resize: image rows get a new payload of the
    target shape and updated meta (width/height); non-image rows pass
    through untouched. Output schema == MEDIA_SCHEMA, so resize stages
    compose with extract_features / frame_sample_plan. Blobs stay
    inside the Arrow batch — never shuffled wider than the task.
    ``kernel``: "stub" or "pil" (see _resolve_kernels)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        _, resize = _resolve_kernels(kernel)
        for pdf in batches:
            out_payload = []
            out_meta = []
            for kind, payload, meta in zip(
                pdf["kind"], pdf["payload"], pdf["meta"]
            ):
                m = dict(meta) if meta is not None else {
                    "width": None, "height": None,
                    "duration_ms": None, "mime": None,
                }
                if kind == "image":
                    out_payload.append(
                        resize(bytes(payload), width, height)
                    )
                    m["width"], m["height"] = width, height
                else:
                    out_payload.append(bytes(payload))
                out_meta.append(m)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "kind": pdf["kind"],
                    "payload": out_payload,
                    "meta": out_meta,
                }
            )

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


def partition_by_bytes(media: DataFrame, target_mb: int = 256) -> DataFrame:
    """Size-aware repartition: estimate rows/partition from the mean
    payload size so each task holds ~target_mb of blobs (media rows
    are wildly variable; row-count partitioning starves or OOMs)."""
    stats = media.agg(
        F.avg(F.length("payload")).alias("avg_len"),
        F.count(F.lit(1)).alias("n_rows"),
    ).collect()[0]  # ONE scalar-aggregate job (avg + count together)
    avg = max(int(stats["avg_len"] or 1), 1)
    rows_per_part = max((target_mb * 1024 * 1024) // avg, 1)
    n_parts = max(int(stats["n_rows"] // rows_per_part), 1)
    return media.repartition(n_parts, "media_id")


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per (media_id, frame_ts) —
    native sequence explode over the metadata duration; the decode of
    each frame happens in extract_features at the planned timestamps."""
    return media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("meta.duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts"),
    )
