#!/usr/bin/env python
"""Real-media smoke test for the multimodal operators (run where
Pillow IS installed — it is not in this sandbox, mirroring
scripts/onnx_smoke.py for the ONNX backend).

Proves the stub -> real swap is drop-in: generates real PNG bytes
with Pillow, runs extract_features(kernel="pil") and
resize_images(kernel="pil") through the SAME Spark plumbing the stub
path uses, and checks the properties the pipeline depends on:

  * schemas identical to the stub path (FEATURE_SCHEMA / MEDIA_SCHEMA)
  * feature vectors have the requested dim, values in [0, 1]
  * resized payload size == width * height (pure function of target
    shape — what partition_by_bytes sizes against)
  * non-image rows pass through resize untouched

Usage:
    pip install Pillow
    python scripts/media_smoke.py
"""

from __future__ import annotations

import io
import sys


def main() -> int:
    try:
        from PIL import Image
    except ImportError:
        print(
            "SKIP: Pillow not installed — this smoke run needs a real "
            "media library (pip install Pillow)"
        )
        return 0

    from pyspark.sql import SparkSession

    from uie_pytorch_spark.operators.multimodal import (
        FEATURE_SCHEMA,
        MEDIA_SCHEMA,
        extract_features,
        resize_images,
    )

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("media-smoke")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )

    def png(seed: int, w: int, h: int) -> bytes:
        img = Image.new("RGB", (w, h))
        img.putdata(
            [((seed * 7 + i) % 256, (i * 3) % 256, (seed + i) % 256)
             for i in range(w * h)]
        )
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return buf.getvalue()

    rows = [
        (1, "image", png(1, 20, 10),
         {"width": 20, "height": 10, "duration_ms": None, "mime": "image/png"}),
        (2, "image", png(2, 7, 7),
         {"width": 7, "height": 7, "duration_ms": None, "mime": "image/png"}),
        (3, "audio", b"\x01\x02\x03" * 40,
         {"width": None, "height": None, "duration_ms": 120, "mime": "audio/wav"}),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)

    feats = extract_features(media.filter("kind = 'image'"), dim=16,
                             kernel="pil")
    assert feats.schema == FEATURE_SCHEMA, feats.schema
    got = {r["media_id"]: r for r in feats.collect()}
    assert set(got) == {1, 2}
    for r in got.values():
        assert len(r["feature"]) == 16
        assert all(0.0 <= v <= 1.0 for v in r["feature"])
    print("extract_features(kernel='pil'): OK "
          f"({len(got)} images, dim=16, values in [0,1])")

    resized = resize_images(media, width=8, height=4, kernel="pil")
    assert resized.schema == MEDIA_SCHEMA, resized.schema
    out = {r["media_id"]: r for r in resized.collect()}
    for mid in (1, 2):
        assert len(out[mid]["payload"]) == 8 * 4, len(out[mid]["payload"])
        assert out[mid]["meta"]["width"] == 8
        assert out[mid]["meta"]["height"] == 4
    assert bytes(out[3]["payload"]) == rows[2][2]  # non-image untouched
    print("resize_images(kernel='pil'): OK (8x4 payloads, audio row "
          "passed through)")

    # drop-in check: the stub path runs through the same plumbing with
    # the same schemas on the same input
    stub_feats = extract_features(media.filter("kind = 'image'"), dim=16)
    assert stub_feats.schema == feats.schema
    assert stub_feats.count() == feats.count()
    print("stub <-> pil drop-in: OK (same schema, same row count)")

    spark.stop()
    print("MEDIA SMOKE PASSED")
    return 0


if __name__ == "__main__":
    sys.exit(main())
