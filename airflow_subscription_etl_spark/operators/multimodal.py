"""Multimodal column plumbing (north star; SURVEY.md §7.6).

Convention: media rides as an opaque ``binary`` payload column plus a
typed ``meta`` struct (schemas.MEDIA_SCHEMA). All heavy per-item work
(decode, resize, frame-sample, feature-extract) runs as Arrow-batched
``mapInPandas`` — the payload bytes never pass through Python row
objects one at a time, and the operator parallelizes per input
partition with no shuffle.

The codec step itself is STUBBED: the image/audio libraries are not in
this container. ``decode_fn`` hooks are where Pillow/ffmpeg/torchcodec
would plug in; the default implementation is a deterministic fake
(shape math from ``meta``, content hash from the payload) so the
Spark-side plumbing — schema, batch iteration, partitioning — is real
and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output schema of featurize_media.
MEDIA_FEATURES_DDL = (
    "media_id bigint, kind string, payload_sha256 string, "
    "n_bytes int, width int, height int, n_frames int, ok boolean"
)


def _fake_decode(kind: str, payload: bytes | None, meta: dict) -> dict:
    """Deterministic decode stand-in.

    A real deployment replaces this with e.g. PIL.Image.open /
    soundfile.read / pyav frame iteration. Raising NotImplementedError
    here would also be legitimate; the fake keeps the pipeline testable.
    """
    n = len(payload) if payload is not None else 0
    frames = 1
    if kind == "video" and meta and meta.get("duration_ms"):
        frames = max(1, int(meta["duration_ms"]) // 1000)  # ~1 fps sample
    return {
        "n_bytes": n,
        "width": (meta or {}).get("width"),
        "height": (meta or {}).get("height"),
        "n_frames": frames,
        "ok": payload is not None,
    }


def featurize_media(df: DataFrame, batch_size_hint: int = 256) -> DataFrame:
    """Decode/feature-extract media rows via Arrow-batched mapInPandas.

    Input: MEDIA_SCHEMA rows. Output: MEDIA_FEATURES_DDL rows.
    Partition-parallel, no shuffle; batch shape is whatever Arrow hands
    us (bounded by spark.sql.execution.arrow.maxRecordsPerBatch).
    """

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                meta = row.meta if isinstance(row.meta, dict) else (
                    row.meta._asdict() if hasattr(row.meta, "_asdict") else dict(row.meta or {})
                )
                payload = bytes(row.payload) if row.payload is not None else None
                feats = _fake_decode(row.kind, payload, meta)
                out.append(
                    {
                        "media_id": row.media_id,
                        "kind": row.kind,
                        "payload_sha256": hashlib.sha256(payload).hexdigest()
                        if payload is not None
                        else None,
                        **feats,
                    }
                )
            yield pd.DataFrame(out)

    return df.mapInPandas(process, schema=MEDIA_FEATURES_DDL)


def _fake_raster_decode(payload: bytes, width: int, height: int):
    """Deterministic fake CODEC (clearly marked): interprets the payload
    as row-major uint8 grayscale pixels, zero-padded / truncated to
    width×height. A real deployment swaps this one function for
    PIL.Image.open → np.asarray; everything downstream (the resize
    math, the batch plumbing, the schema) is real.
    """
    import numpy as np  # noqa: PLC0415 — worker-side import

    buf = np.frombuffer(payload or b"", dtype=np.uint8)
    need = width * height
    if buf.size < need:
        buf = np.pad(buf, (0, need - buf.size))
    return buf[:need].reshape(height, width)


def _pool_resize(img, out_w: int, out_h: int):
    """REAL resize math: exact box-average via an integral image. Each
    output cell averages its source region [y0,y1)×[x0,x1) (regions
    cover the image exactly on downscale and collapse to single pixels
    on upscale → replication). Fully vectorized numpy, any ratio."""
    import numpy as np  # noqa: PLC0415

    in_h, in_w = img.shape
    # target-cell source ranges; y1 ≥ y0+1 so upscale replicates
    y0 = np.arange(out_h) * in_h // out_h
    y1 = np.maximum(y0 + 1, (np.arange(out_h) + 1) * in_h // out_h)
    x0 = np.arange(out_w) * in_w // out_w
    x1 = np.maximum(x0 + 1, (np.arange(out_w) + 1) * in_w // out_w)
    # integral image with a zero border: S[i,j] = sum of img[:i,:j]
    s = np.zeros((in_h + 1, in_w + 1), dtype=np.float64)
    np.cumsum(np.cumsum(img, axis=0), axis=1, out=s[1:, 1:])
    sums = (
        s[np.ix_(y1, x1)] - s[np.ix_(y0, x1)] - s[np.ix_(y1, x0)] + s[np.ix_(y0, x0)]
    )
    counts = (y1 - y0)[:, None] * (x1 - x0)[None, :]
    return np.rint(sums / counts).astype(np.uint8)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize operator: binary-in / binary-out so codec → resize →
    encode chains compose; Arrow-batched ``mapInPandas``, partition-
    parallel, no shuffle. The DECODE step is the deterministic fake
    raster codec above (this container has no image libs); the resize
    itself is real average-pooling math and is pixel-level tested.
    """

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                meta = row.meta if isinstance(row.meta, dict) else (
                    row.meta._asdict()
                    if hasattr(row.meta, "_asdict")
                    else dict(row.meta or {})
                )
                if row.kind != "image" or row.payload is None:
                    continue
                src_w = int(meta.get("width") or 1)
                src_h = int(meta.get("height") or 1)
                img = _fake_raster_decode(bytes(row.payload), src_w, src_h)
                resized = _pool_resize(img, width, height)
                out.append(
                    {
                        "media_id": row.media_id,
                        "kind": row.kind,
                        "payload": resized.tobytes(),
                        "meta": {
                            "width": width,
                            "height": height,
                            "sample_rate": meta.get("sample_rate"),
                            "duration_ms": meta.get("duration_ms"),
                            "format": "gray8",
                        },
                    }
                )
            yield pd.DataFrame(
                out,
                columns=["media_id", "kind", "payload", "meta"],
            )

    return df.mapInPandas(
        process,
        schema="media_id bigint, kind string, payload binary, "
        "meta struct<width:int,height:int,sample_rate:int,duration_ms:bigint,format:string>",
    )


def sample_video_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling operator: one output row per sampled frame.

    Frame *positions* compute from typed metadata (JVM-side explode of a
    generated sequence — cheap and exact); frame *decoding* is the
    stubbed step.
    """
    frames = df.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(
                    F.coalesce(F.col("meta.duration_ms"), F.lit(0)) - 1, F.lit(0)
                ),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )
    return frames


def sample_audio_windows(
    df: DataFrame, window_ms: int = 500, hop_ms: int = 250
) -> DataFrame:
    """Audio windowing operator: one row per (overlapping) analysis
    window, positions computed JVM-side from typed metadata
    (sample_rate, duration_ms) — the exact audio analog of
    :func:`sample_video_frames`. Window *positions* are cheap and exact;
    window *decoding* is the pluggable codec step. Start/end sample
    indices ride along so a real decoder can slice the payload without
    re-deriving timing.
    """
    audio = df.filter(
        (F.col("kind") == "audio") & F.col("meta.sample_rate").isNotNull()
    )
    return audio.select(
        "media_id",
        F.col("meta.sample_rate").alias("sample_rate"),
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(
                    F.coalesce(F.col("meta.duration_ms"), F.lit(0))
                    - F.lit(window_ms),
                    F.lit(0),
                ),
                F.lit(hop_ms),
            )
        ).alias("win_start_ms"),
    ).select(
        "media_id",
        "win_start_ms",
        (F.col("win_start_ms") + window_ms).alias("win_end_ms"),
        (F.col("win_start_ms") * F.col("sample_rate") / 1000).cast("bigint").alias(
            "start_sample"
        ),
        ((F.col("win_start_ms") + window_ms) * F.col("sample_rate") / 1000)
        .cast("bigint")
        .alias("end_sample"),
    )
