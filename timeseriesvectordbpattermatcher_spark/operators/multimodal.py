"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
``modality`` tag and a metadata struct; the decode / feature-extract /
resize / frame-sample kernels run as ``mapInPandas`` batch UDFs.

The decode step itself is STUBBED in this sandbox (no image/audio libs are
installed — see ``decode_image_stub``): it raises ``NotImplementedError``
unless ``fake=True``, in which case a deterministic fake decoder (seeded by
the payload digest) produces stable pseudo-features so the Spark-side
plumbing — schema, partitioning, UDF signature, Arrow batch shape — is real
and testable end-to-end. Swapping in Pillow/ffmpeg on a real cluster only
changes the body of ``_decode_one``.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id string, modality string, payload binary, "
    "width int, height int, n_frames int, sample_rate int"
)

FEATURE_SCHEMA = "media_id string, modality string, feat array<float>, decode_ok boolean"


def synth_media(spark, n_rows: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload = seeded bytes, metadata typed."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n_rows):
        modality = ["image", "audio", "video"][i % 3]
        payload = rng.integers(0, 256, size=128 + (i % 64), dtype=np.uint8).tobytes()
        rows.append(
            (
                f"m{i:05d}",
                modality,
                bytearray(payload),
                64 + (i % 4) * 32 if modality != "audio" else None,
                64 + (i % 3) * 32 if modality != "audio" else None,
                (i % 30) + 1 if modality == "video" else None,
                16000 if modality == "audio" else None,
            )
        )
    # few synthetic rows: cap partitions so we don't spin up one Python
    # worker per core for a handful of payloads (real tables keep their
    # native partitioning)
    return spark.createDataFrame(rows, MEDIA_SCHEMA).coalesce(4)


def _decode_one(payload: bytes, modality: str, fake: bool) -> np.ndarray:
    if not fake:
        # Real decode needs Pillow / soundfile / av — not present in this
        # container. The Spark plumbing around this call is fully real.
        raise NotImplementedError(
            "media decode requires image/audio libraries not present in this "
            "environment; run with fake=True for the deterministic stub"
        )
    digest = hashlib.sha256(payload).digest()
    rng = np.random.default_rng(np.frombuffer(digest[:8], dtype=np.uint64)[0])
    return rng.normal(size=16).astype(np.float32)


def extract_media_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """decode -> 16-dim feature per media row, Arrow-batched.

    At 100 TB this is the canonical mapInPandas shape: payloads stay inside
    their input partition (no shuffle), one Python worker per core decodes
    an Arrow batch at a time; ``spark.sql.execution.arrow.maxRecordsPerBatch``
    bounds peak memory (payloads can be MBs each).
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats, oks = [], []
            for payload, modality in zip(pdf["payload"], pdf["modality"]):
                try:
                    feats.append(_decode_one(bytes(payload), modality, fake))
                    oks.append(True)
                except NotImplementedError:
                    feats.append(np.zeros(16, dtype=np.float32))
                    oks.append(False)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "feat": feats,
                    "decode_ok": oks,
                }
            )

    return media.mapInPandas(op, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 5) -> DataFrame:
    """Video frame-sampling *plan*: one output row per sampled frame index —
    pure Spark exprs (sequence + explode); the decode of each frame is the
    stubbed kernel above."""
    vids = media.filter(F.col("modality") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )
