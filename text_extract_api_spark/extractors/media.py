"""Multimodal (image/audio/video) column plumbing.

The reference treats images as opaque bytes routed to external OCR backends
(``files/file_formats/image.py``, ``extract/strategies/easyocr.py``,
``ollama.py``); no decode library ships in this container. The engine keeps
the Spark-side plumbing real — schema, Arrow batching, partition shape —
and stubs the codec behind ``decode_image`` with a deterministic fake, so
swapping in PIL/ffmpeg on a real cluster changes one function.

All operators here use ``mapInPandas`` (iterator-of-batches) so a partition
of oversized media never materializes fully in one Python worker — the same
bounded-memory concern the reference handles with Celery's
``worker_max_memory_per_child`` (celery_app.py:20-22).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

IMAGE_META_SCHEMA = (
    "media_ref string, byte_len long, sha1 string, width int, height int, mode string"
)


def decode_image(payload: bytes) -> tuple[int, int, str]:
    """STUB: real impl would be PIL ``Image.open(BytesIO(payload))``
    (reference: image.py:43-48 verify / image.py:52-71 unify). This
    deterministic fake derives (width, height, mode) from the payload hash
    so tests exercise the full distributed path.
    """
    h = hashlib.sha1(payload or b"").digest()
    return 64 + h[0] % 192, 64 + h[1] % 192, ("RGB", "L", "RGBA")[h[2] % 3]


def image_metadata(df: DataFrame) -> DataFrame:
    """(media_ref, payload:binary) → typed image metadata, batched via Arrow."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"].map(lambda b: bytes(b) if b is not None else b"")
            dims = payloads.map(decode_image)
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "byte_len": payloads.map(len).astype("int64"),
                    "sha1": payloads.map(lambda b: hashlib.sha1(b).hexdigest()),
                    "width": dims.map(lambda d: d[0]).astype("int32"),
                    "height": dims.map(lambda d: d[1]).astype("int32"),
                    "mode": dims.map(lambda d: d[2]),
                }
            )

    return df.select("media_ref", "payload").mapInPandas(op, IMAGE_META_SCHEMA)


FRAME_SAMPLE_SCHEMA = "media_ref string, frame_no int, frame_sha1 string"


def sample_frames(df: DataFrame, every_n: int = 10, max_frames: int = 8) -> DataFrame:
    """Video frame sampling stub: emits deterministic frame fingerprints.

    Real impl: ffmpeg/pyav seek-and-decode inside the same mapInPandas shape
    (one input row → ≤ max_frames output rows).
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {"media_ref": [], "frame_no": [], "frame_sha1": []}
            for ref, payload in zip(pdf["media_ref"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                n = min(max_frames, max(1, len(data) // max(1, every_n)))
                for i in range(n):
                    rows["media_ref"].append(ref)
                    rows["frame_no"].append(i)
                    rows["frame_sha1"].append(
                        hashlib.sha1(data + i.to_bytes(4, "big")).hexdigest()
                    )
            yield pd.DataFrame(rows)

    return df.select("media_ref", "payload").mapInPandas(op, FRAME_SAMPLE_SCHEMA)
