"""Multimodal columns (SURVEY.md §2 B.10): image/audio/video as
opaque ``binary`` payloads + typed metadata, processed with
Arrow-batched pandas iterators (``mapInPandas``).

The decode step itself is STUBBED — this container has no image or
audio libraries — behind ``decode_stub`` (a deterministic fake) and
``decode_real`` (NotImplementedError with the integration point
documented). Everything Spark-side is real and tested: the schema,
the binary column handling, the mapInPandas batch shape, and the
partitioning story.

Scale design: payloads are the heavy part — never shuffle them.
Feature extraction is map-only (mapInPandas, no grouping); the
extracted features (small, typed) are what joins/aggregations touch.
maxRecordsPerBatch bounds Arrow batch memory for multi-MB payloads.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
)

FEATURE_SCHEMA = (
    "media_id bigint, kind string, n_bytes bigint, "
    "payload_digest string, width int, height int, feat_mean double"
)


def synthesize_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministic fake media table from a text table: payload =
    UTF-8 bytes of the text (stands in for encoded image bytes),
    metadata derived from content. Real pipelines replace this with
    a binary-file / parquet-with-binary source."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    return df.select(
        F.col(id_col).alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            (F.col(id_col) % 640 + 1).cast("int").alias("width"),
            (F.col(id_col) % 480 + 1).cast("int").alias("height"),
            F.lit(16000).cast("int").alias("sample_rate"),
            (F.col(id_col) % 90 + 1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def decode_real(payload: bytes, kind: str):
    """Integration point for a real decoder (PIL / torchaudio /
    pyav). Not available in this container."""
    raise NotImplementedError(
        "media decode requires an image/audio library (e.g. PIL, "
        "torchaudio); wire it in here — the Spark plumbing around "
        "this call is complete"
    )


def decode_stub(payload: bytes, kind: str) -> dict:
    """Deterministic fake decode: derives 'features' from the raw
    bytes so tests can assert end-to-end without media libs."""
    n = len(payload)
    return {
        "n_bytes": n,
        "feat_mean": (sum(payload) / n) if n else 0.0,
    }


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Image resize over Arrow batches. Decode/re-encode is stubbed
    (no PIL in this container): payload passes through, metadata is
    rewritten to the target dims — the schema/partitioning/batch
    plumbing is the real deliverable; swap ``_resize_stub`` for a PIL
    call to go live."""

    def _resize_stub(payload: bytes, w: int, h: int) -> bytes:
        return payload  # real impl: PIL.Image.open(...).resize((w, h))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["payload"] = [
                _resize_stub(bytes(p), width, height) for p in pdf["payload"]
            ]
            out["meta"] = [
                {**m, "width": width, "height": height} for m in pdf["meta"]
            ]
            yield out

    return media.filter(F.col("kind") == "image").mapInPandas(run, MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling: one output row per sampled frame index.
    Frame decode is stubbed (frame payload = content digest bytes);
    the row-expansion shape (1 video → n_frames/every_n rows) and
    per-frame schema are real."""
    out_schema = (
        "media_id bigint, frame_index int, frame_payload binary"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            ids, idxs, payloads = [], [], []
            for _, row in pdf.iterrows():
                n_frames = row["meta"]["n_frames"]
                for i in range(0, n_frames, every_n):
                    ids.append(row["media_id"])
                    idxs.append(i)
                    payloads.append(
                        hashlib.sha256(bytes(row["payload"]) + bytes([i % 256])).digest()
                    )
            yield pd.DataFrame(
                {"media_id": ids, "frame_index": idxs, "frame_payload": payloads}
            )

    return media.filter(F.col("kind") == "video").mapInPandas(run, out_schema)


def extract_features(media: DataFrame, use_stub: bool = True) -> DataFrame:
    """Map-only feature extraction over Arrow batches. One pandas
    batch in, one out — no shuffle, payloads never leave their
    partition; output carries only small typed features."""
    decode = decode_stub if use_stub else decode_real

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            feats = [decode(p, k) for p, k in zip(pdf["payload"], pdf["kind"])]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [f["n_bytes"] for f in feats],
                    "payload_digest": [
                        hashlib.sha256(bytes(p)).hexdigest() for p in pdf["payload"]
                    ],
                    "width": [m["width"] for m in pdf["meta"]],
                    "height": [m["height"] for m in pdf["meta"]],
                    "feat_mean": [f["feat_mean"] for f in feats],
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)
