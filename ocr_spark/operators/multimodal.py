"""Multimodal column plumbing (task brief: image/audio/video as opaque
binary + typed metadata).

NOTE: codec-FREE formats now have REAL decode paths in
:mod:`ocr_spark.operators.media` — BMP (24-bit uncompressed) and PNG
(8-bit grey/RGB/RGBA via stdlib zlib, CRC-verified, all five scanline
filters) images, netpbm, and WAV (PCM16) audio are parsed byte-for-byte
with numpy/stdlib, graded by first-principles DuckDB oracles
(queries_media.py) and adversarial tests (tests/test_media.py,
tests/test_png.py). This module keeps the honest stubs for the formats
that genuinely need a codec library absent from this container
(JPEG/MP4), plus the generic plumbing shapes.

The container has no image/audio codecs, so the actual decoding is stubbed:
:func:`_decode_stub` raises ``NotImplementedError`` unless a known library is
importable, and :func:`decode_features` falls back to a deterministic fake
(byte-length-derived dimensions) so the Spark-side plumbing — schema,
Arrow batching, mapInPandas signature, partitioning — is real and testable.

At 100 TB the pattern is: binary payloads stay columnar in parquet, decode
runs as an Arrow-batched ``mapInPandas`` stage (one Python worker per core,
payloads never hit the driver), and downstream feature columns are plain
Spark types.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame


def _decode_stub(payload: bytes) -> dict:
    """Real media decode — intentionally unimplemented in this container."""
    try:
        import PIL.Image  # noqa: F401  (not installed here)
    except ImportError as exc:  # pragma: no cover - always taken in sandbox
        raise NotImplementedError(
            "media decoding requires an image/audio library not present in"
            " this container; use fake=True for the deterministic stub"
        ) from exc
    raise NotImplementedError("real decode path not wired yet")


def _fake_features(payload: bytes | None) -> tuple[int, int, int]:
    n = len(payload) if payload is not None else 0
    return n, n % 640, n % 480


def decode_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload",
    fake: bool = True,
) -> DataFrame:
    """payload binary -> (id, n_bytes, fake_width, fake_height) via
    mapInPandas (Arrow-batched; no per-row Python UDF calls)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if fake:
                feats = [_fake_features(p) for p in pdf[payload_col]]
            else:  # pragma: no cover - stub path
                feats = [_decode_stub(p) for p in pdf[payload_col]]
            out = pd.DataFrame(
                feats, columns=["n_bytes", "fake_width", "fake_height"]
            )
            out.insert(0, id_col, pdf[id_col].values)
            yield out

    return df.mapInPandas(
        fn, f"{id_col} bigint, n_bytes int, fake_width int, fake_height int"
    )


def resize_images(
    df: DataFrame, target_w: int, target_h: int,
    id_col: str = "doc_id", payload_col: str = "payload",
) -> DataFrame:
    """Resize stage plumbing: binary in -> binary out with typed metadata.

    The deterministic fake 'resize' keeps ``target_w * target_h // 64``
    payload bytes (a real implementation decodes + resamples in the same
    mapInPandas slot); output schema carries the new dimensions as columns
    so downstream stages never re-decode to learn them.
    """
    keep = max(1, target_w * target_h // 64)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                (p[:keep] if p is not None else b"") for p in pdf[payload_col]
            ]
            out = pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "width": target_w,
                    "height": target_h,
                    "resized": payloads,
                    "resized_bytes": [len(p) for p in payloads],
                }
            )
            yield out

    return df.mapInPandas(
        fn,
        f"{id_col} bigint, width int, height int, resized binary,"
        " resized_bytes int",
    )


def sample_frames(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload",
    max_frames: int = 4,
) -> DataFrame:
    """Frame-sampling plumbing: one video payload row -> N frame rows.

    Demonstrates the fan-out shape (mapInPandas emitting more rows than it
    consumes). Deterministic fake: ``1 + n_bytes % max_frames`` frames, each
    frame a fixed-stride byte slice; a real build swaps the slicing for
    codec frame extraction, nothing else changes.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fidx, frames = [], [], []
            for i, p in zip(pdf[id_col], pdf[payload_col]):
                data = p if p is not None else b""
                n_frames = 1 + len(data) % max_frames
                stride = max(1, len(data) // n_frames)
                for f in range(n_frames):
                    ids.append(i)
                    fidx.append(f)
                    frames.append(data[f * stride : f * stride + 16])
            yield pd.DataFrame(
                {id_col: ids, "frame_idx": fidx, "frame": frames}
            )

    return df.mapInPandas(
        fn, f"{id_col} bigint, frame_idx int, frame binary"
    )
