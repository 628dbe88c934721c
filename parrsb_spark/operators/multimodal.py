"""Multimodal column plumbing: image/audio/video as opaque BINARY columns
with typed metadata, processed by Arrow-batched mapInPandas kernels.

The container has no codec libraries, so the actual decode is STUBBED:
`decode=\"fake\"` (default) derives deterministic pseudo-metadata from the
bytes; `decode=\"real\"` raises NotImplementedError where PIL/ffmpeg would
be called. Everything around the stub — schema, batch iteration, UDF
signatures, partition-preserving plumbing — is real and tested, so
swapping in a real codec is a one-function change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = "media_id bigint, kind string, payload binary"
IMAGE_META_SCHEMA = (
    "media_id bigint, n_bytes int, sha1 string, width int, height int, mean_byte double"
)
FRAME_SCHEMA = "media_id bigint, frame_idx int, frame_sha1 string"


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Synthesize a media table from documents (payload = utf-8 bytes) —
    the binary-column plumbing fixture; kind round-robins image/audio/video."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"), kind.alias("kind"), F.encode("text", "utf-8").alias("payload")
    )


def _fake_decode(payload: bytes) -> tuple[int, str, int, int, float]:
    """Deterministic pseudo-decode: metadata as a pure function of bytes."""
    n = len(payload)
    sha1 = hashlib.sha1(payload).hexdigest()
    h = int(sha1[:8], 16)
    width = 16 + h % 1024
    height = 16 + (h >> 10) % 1024
    mean_byte = (sum(payload) / n) if n else 0.0
    return n, sha1, width, height, round(mean_byte, 6)


def decode_image_meta(media: DataFrame, decode: str = "fake") -> DataFrame:
    """(media_id, n_bytes, sha1, width, height, mean_byte) via mapInPandas.

    Arrow batches in/out; the per-batch loop is numpy/pandas-side only."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":
                raise NotImplementedError(
                    "real image decode requires PIL/libvips — not in this container; "
                    "swap _fake_decode for PIL.Image.open(io.BytesIO(payload))"
                )
            metas = [_fake_decode(bytes(p)) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "n_bytes": [m[0] for m in metas],
                    "sha1": [m[1] for m in metas],
                    "width": [m[2] for m in metas],
                    "height": [m[3] for m in metas],
                    "mean_byte": [m[4] for m in metas],
                }
            )

    return media.filter(F.col("kind") == "image").mapInPandas(op, schema=IMAGE_META_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 64, decode: str = "fake") -> DataFrame:
    """Frame sampling stub for video payloads: one 'frame' per
    every_n_bytes chunk, identified by its sha1 — the real kernel would
    seek keyframes via ffmpeg. Demonstrates 1→N mapInPandas fan-out."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decode == "real":
                raise NotImplementedError("real frame extraction requires ffmpeg")
            ids, idxs, shas = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                for i in range(0, max(len(b), 1), every_n_bytes):
                    ids.append(mid)
                    idxs.append(i // every_n_bytes)
                    shas.append(hashlib.sha1(b[i : i + every_n_bytes]).hexdigest())
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame_sha1": shas})

    return media.filter(F.col("kind") == "video").mapInPandas(op, schema=FRAME_SCHEMA)
