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


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize operator — REAL plumbing, STUB codec.

    Keeps the payload column binary-in/binary-out so the operator chains
    (decode → resize → encode) compose. The transformation itself
    raises until an image library is available.
    """

    def process(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "image codec not available in this environment; plug Pillow/"
            "opencv into resize_images.process"
        )
        yield  # pragma: no cover

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
