"""Multimodal (image/audio/video) column plumbing.

The reference treats images as opaque bytes routed to external OCR backends
(``files/file_formats/image.py``, ``extract/strategies/easyocr.py``,
``ollama.py``); no decode library ships in this container. The engine keeps
the Spark-side plumbing real — schema, Arrow batching, partition shape —
and stubs the codec behind ``decode_image`` with a deterministic fake, so
swapping in PIL/ffmpeg on a real cluster changes one function.

The fakes derive every "decoded" property from md5 of the payload with
plain hex-digit arithmetic, so the DuckDB oracle can reproduce them exactly
(``__spark_entry__.py`` media queries) and the full distributed path gets a
value-level correctness gate, not just a schema check.

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
    "media_ref string, page_no int, byte_len long, payload_md5 string, "
    "width int, height int, mode string"
)


def decode_image(payload: bytes) -> tuple[int, int, str]:
    """STUB: real impl would be PIL ``Image.open(BytesIO(payload))``
    (reference: image.py:43-48 verify / image.py:52-71 unify). This
    deterministic fake derives (width, height, mode) from hex digits of
    md5(payload) so tests and the DuckDB oracle exercise the full
    distributed path on values, not just schema.
    """
    h = hashlib.md5(payload or b"").hexdigest()
    return (
        64 + int(h[0:2], 16) % 192,
        64 + int(h[2:4], 16) % 192,
        ("RGB", "L", "RGBA")[int(h[4], 16) % 3],
    )


def image_metadata(df: DataFrame) -> DataFrame:
    """(media_ref, page_no, payload:binary) → typed image metadata, batched
    via Arrow. One output row per input row."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"].map(lambda b: bytes(b) if b is not None else b"")
            dims = payloads.map(decode_image)
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "page_no": pdf["page_no"].astype("int32"),
                    "byte_len": payloads.map(len).astype("int64"),
                    "payload_md5": payloads.map(lambda b: hashlib.md5(b).hexdigest()),
                    "width": dims.map(lambda d: d[0]).astype("int32"),
                    "height": dims.map(lambda d: d[1]).astype("int32"),
                    "mode": dims.map(lambda d: d[2]),
                }
            )

    return df.select("media_ref", "page_no", "payload").mapInPandas(
        op, IMAGE_META_SCHEMA
    )


FRAME_SAMPLE_SCHEMA = "media_ref string, page_no int, frame_no int, frame_md5 string"

FRAME_EVERY_N = 10
FRAME_MAX = 8


def sample_frames(
    df: DataFrame, every_n: int = FRAME_EVERY_N, max_frames: int = FRAME_MAX
) -> DataFrame:
    """Video frame-sampling stub: emits deterministic frame fingerprints.

    Real impl: ffmpeg/pyav seek-and-decode inside the same mapInPandas shape
    (one input row → ≤ max_frames output rows). Frame count scales with
    payload size (one frame per ``every_n`` bytes, capped); the fingerprint
    is md5(payload || ':' || frame_no) — reproducible in the SQL oracle.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                "media_ref": [], "page_no": [], "frame_no": [], "frame_md5": []
            }
            for ref, page, payload in zip(
                pdf["media_ref"], pdf["page_no"], pdf["payload"]
            ):
                data = bytes(payload) if payload is not None else b""
                n = min(max_frames, max(1, len(data) // max(1, every_n)))
                for i in range(n):
                    rows["media_ref"].append(ref)
                    rows["page_no"].append(page)
                    rows["frame_no"].append(i)
                    rows["frame_md5"].append(
                        hashlib.md5(data + f":{i}".encode()).hexdigest()
                    )
            yield pd.DataFrame(rows)

    return df.select("media_ref", "page_no", "payload").mapInPandas(
        op, FRAME_SAMPLE_SCHEMA
    )
