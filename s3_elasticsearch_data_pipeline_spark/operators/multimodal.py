"""Multimodal column plumbing (M4 north star).

Images/audio/video are opaque ``binary`` columns with typed metadata.
The Spark-side plumbing — schema, Arrow batch shape, partitioning,
``mapInPandas`` signatures — is real and tested; the actual media
decode is STUBBED (``decode_image`` raises ``NotImplementedError``)
because no image/audio libraries exist in this container. A
deterministic fake feature extractor stands in so the full pipeline is
exercisable end-to-end.

Scale posture: ``mapInPandas`` streams Arrow batches per partition —
memory is bounded by batch size, not partition size
(``spark.sql.execution.arrow.maxRecordsPerBatch``), which is what makes
binary-payload pipelines survivable at 100 TB. Metadata-only queries
never touch payload bytes (column pruning drops the binary column at
the parquet scan).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PAYLOAD_SCHEMA = ("doc_id long, media_type string, payload binary, "
                  "n_bytes long")
FEATURE_SCHEMA = ("doc_id long, media_type string, n_bytes long, "
                  "payload_md5 string, fake_feature double")


def attach_payload(documents: DataFrame,
                   media_type: str = "image/fake") -> DataFrame:
    """Build the canonical multimodal frame: binary payload + typed
    metadata. Here the payload is the utf-8 text bytes (deterministic
    stand-in for real media blobs)."""
    payload = F.encode(F.col("text"), "utf-8")
    return documents.select(
        "doc_id",
        F.lit(media_type).alias("media_type"),
        payload.alias("payload"),
        F.octet_length(payload).alias("n_bytes"))


def decode_image(payload: bytes):
    """Real media decode — STUB. Needs an image library (PIL/opencv)
    that is not in this container; the Spark-side plumbing around it is
    real and tested with the deterministic fake extractor below."""
    raise NotImplementedError(
        "media decode requires an image/audio library not present in "
        "this environment; use extract_features(fake=True)")


def _fake_feature(payload: bytes) -> float:
    """Deterministic stand-in feature: first 4 bytes of md5 as a float
    in [0, 1) — reproducible across runs/engines."""
    digest = hashlib.md5(payload).digest()
    return int.from_bytes(digest[:4], "big") / 2**32


def extract_features(payloads: DataFrame, fake: bool = True) -> DataFrame:
    """Feature extraction over binary payloads via ``mapInPandas``:
    Arrow-batched, per-partition streaming — the pattern a real
    decode/resize/embed stage plugs into."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payload = pdf["payload"]
            if not fake:
                payload.map(decode_image)  # raises NotImplementedError
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["n_bytes"],
                "payload_md5": payload.map(
                    lambda b: hashlib.md5(bytes(b)).hexdigest()),
                "fake_feature": payload.map(
                    lambda b: _fake_feature(bytes(b))),
            })

    return payloads.mapInPandas(run, FEATURE_SCHEMA)


def multimodal_features(documents: DataFrame) -> DataFrame:
    """End-to-end: attach payload → Arrow-batched feature extraction.
    ``fake_feature`` is omitted from the output contract here so the
    result is oracle-checkable (md5/octet_length exist in ANSI SQL)."""
    return (extract_features(attach_payload(documents), fake=True)
            .select("doc_id", "media_type", "n_bytes", "payload_md5"))


RESIZE_SCHEMA = ("doc_id long, media_type string, width int, height int, "
                 "resized_md5 string")
FRAME_SCHEMA = ("doc_id long, frame_index int, frame_md5 string, "
                "frame_offset_bytes long")


def decode_audio(payload: bytes):
    """Audio decode — STUB (no audio libs in this container); the
    Arrow plumbing around it is exercised with deterministic fakes."""
    raise NotImplementedError(
        "audio decode requires a library not present in this environment")


def resize_images(payloads: DataFrame, width: int = 64,
                  height: int = 64) -> DataFrame:
    """Resize stage plumbing: Arrow-batched mapInPandas with a
    deterministic fake resize (md5 over payload+dims stands in for the
    resized bitmap digest). A real implementation swaps the inner
    lambda for PIL/opencv — schema, batching, and partitioning are
    unchanged."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            tag = f":{width}x{height}".encode()
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "width": width,
                "height": height,
                "resized_md5": pdf["payload"].map(
                    lambda b: hashlib.md5(bytes(b) + tag).hexdigest()),
            })

    return payloads.mapInPandas(run, RESIZE_SCHEMA)


def sample_frames(payloads: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emit ``n_frames``
    evenly spaced 'frames' per payload (fan-out inside mapInPandas —
    one input row → n output rows, the shape a real decoder produces).
    Frame bytes are windows of the payload; digests are deterministic."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_index": [], "frame_md5": [],
                   "frame_offset_bytes": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                step = max(len(data) // n_frames, 1)
                for i in range(n_frames):
                    off = min(i * step, max(len(data) - 1, 0))
                    window = data[off:off + step] or b"\x00"
                    out["doc_id"].append(doc_id)
                    out["frame_index"].append(i)
                    out["frame_md5"].append(hashlib.md5(window).hexdigest())
                    out["frame_offset_bytes"].append(off)
            yield pd.DataFrame(out)

    return payloads.mapInPandas(run, FRAME_SCHEMA)


AUDIO_CHUNK_SCHEMA = ("doc_id long, chunk_index int, start_ms double, "
                      "end_ms double, n_chunk_bytes long, chunk_md5 string")


def chunk_audio(payloads: DataFrame, window_ms: float = 1.0,
                hop_ms: float = 0.5, sample_rate: int = 16_000,
                bytes_per_sample: int = 2) -> DataFrame:
    """Sliding-window audio chunking plumbing (the STFT/feature front
    end of a speech pipeline): each binary payload is treated as PCM at
    ``sample_rate``×``bytes_per_sample`` and fanned out into
    overlapping windows of ``window_ms`` every ``hop_ms``.

    Same fan-out shape as ``sample_frames`` (one row → many), same
    Arrow-batched memory bound; a real decoder replaces the byte-slice
    with decoded samples without touching schema or partitioning. The
    digests are deterministic so tests pin exact outputs.
    """
    bytes_per_ms = sample_rate * bytes_per_sample / 1000.0
    win = max(int(window_ms * bytes_per_ms), 1)
    hop = max(int(hop_ms * bytes_per_ms), 1)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "chunk_index": [], "start_ms": [],
                   "end_ms": [], "n_chunk_bytes": [], "chunk_md5": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                data = bytes(payload)
                n_chunks = max((max(len(data) - win, 0) + hop - 1) // hop,
                               0) + 1
                for i in range(n_chunks):
                    off = i * hop
                    window = data[off:off + win]
                    if not window:
                        break
                    out["doc_id"].append(doc_id)
                    out["chunk_index"].append(i)
                    out["start_ms"].append(off / bytes_per_ms)
                    out["end_ms"].append((off + len(window)) / bytes_per_ms)
                    out["n_chunk_bytes"].append(len(window))
                    out["chunk_md5"].append(
                        hashlib.md5(window).hexdigest())
            yield pd.DataFrame(out)

    return payloads.mapInPandas(run, AUDIO_CHUNK_SCHEMA)
