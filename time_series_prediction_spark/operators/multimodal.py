"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Beyond-reference scope (SURVEY §7.1.8): a 100 TB multimodal corpus
stores image/audio/video as ``binary`` columns with typed metadata
(modality, byte size, content hash) beside them. The Spark-side
pipeline — schema, partition-sized Arrow batches, ``mapInPandas``
feature extraction — is real and tested; the actual media DECODE step
is stubbed (image/audio libraries are not in this container): the
default extractor is a deterministic content-hash feature so tests can
assert exact plumbing behavior, and ``decode_real`` raises
``NotImplementedError`` with the integration contract documented.

Why ``mapInPandas``: decode is Python-library work (PIL/ffmpeg), so it
cannot be a native expression — the iterator form streams
Arrow-batches through one Python worker per partition (no per-row
serialization), keeps memory bounded by the batch size, and preserves
the upstream partitioning. This is the one place (besides model
inference) where Python belongs in the hot path.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 16

FEATURES_SCHEMA = (
    "doc_id bigint, modality string, n_bytes bigint, "
    "content_md5 string, features array<float>"
)


def attach_binary_payload(
    df: DataFrame,
    source_col: str = "text",
    id_col: str = "doc_id",
    modality: str = "image",
) -> DataFrame:
    """Synthesize an opaque binary payload column from an existing
    column (UTF-8 encode) + typed metadata — stands in for real media
    bytes so the downstream plumbing is exercised end-to-end."""
    payload = F.encode(F.col(source_col), "UTF-8")
    return df.select(
        F.col(id_col),
        F.lit(modality).alias("modality"),
        payload.alias("payload"),
        F.length(payload).cast("bigint").alias("n_bytes"),
        F.md5(payload).alias("content_md5"),
    )


def _stub_features(payload: bytes) -> list[float]:
    """Deterministic fake feature vector from the payload bytes: a
    16-dim histogram of byte values (normalized). Replaces the real
    decoder so the Spark plumbing is testable without media libs."""
    if payload is None or len(payload) == 0:
        return [0.0] * FEATURE_DIM
    counts = [0] * FEATURE_DIM
    for b in payload:
        counts[b % FEATURE_DIM] += 1
    n = float(len(payload))
    return [c / n for c in counts]


def _pil():  # pragma: no cover - environment-dependent
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def _cv2():  # pragma: no cover - environment-dependent
    try:
        import cv2  # noqa: PLC0415

        return cv2
    except ImportError:
        return None


def decode_real(payload: bytes, modality: str):
    """Integration point for real decoders.

    Contract: return a per-item feature vector (list[float] of
    FEATURE_DIM) from the raw bytes. Images use PIL when it is
    importable (decode → grayscale → 4×4 thumbnail → 16 normalized
    pixel intensities); video uses OpenCV when importable (decode via a
    temp file — cv2.VideoCapture has no bytes API — grab the first
    frame, grayscale, 4×4 thumbnail, same 16-dim contract); audio
    would wire soundfile/librosa the same way. When the library is
    absent (this container), raises NotImplementedError — callers keep
    the deterministic stub.
    """
    Image = _pil()
    if modality == "image" and Image is not None:  # pragma: no cover
        import io  # noqa: PLC0415

        img = Image.open(io.BytesIO(payload)).convert("L").resize((4, 4))
        return [px / 255.0 for px in img.getdata()]
    cv2 = _cv2()
    if modality == "video" and cv2 is not None:  # pragma: no cover
        import os  # noqa: PLC0415
        import tempfile  # noqa: PLC0415

        fd, tmp = tempfile.mkstemp(suffix=".mp4")
        try:
            with os.fdopen(fd, "wb") as f:
                f.write(payload)
            cap = cv2.VideoCapture(tmp)
            ok, frame = cap.read()
            cap.release()
            if not ok:
                raise ValueError("cv2 could not decode a frame")
            gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY)
            thumb = cv2.resize(gray, (4, 4), interpolation=cv2.INTER_AREA)
            return [float(px) / 255.0 for px in thumb.flatten()]
        finally:
            os.unlink(tmp)
    raise NotImplementedError(
        f"real {modality} decoding requires media libraries not present "
        "in this environment; use the deterministic stub extractor"
    )


RESIZED_SCHEMA = (
    "doc_id bigint, modality string, width int, height int, "
    "n_bytes bigint, content_md5 string, payload binary"
)

FRAMES_SCHEMA = (
    "doc_id bigint, frame_idx int, n_bytes bigint, frame_payload binary"
)


def resize_images(
    df: DataFrame, width: int = 32, height: int = 32
) -> DataFrame:
    """Resize plumbing via iterator ``mapInPandas``: payload →
    fixed-size payload + (width, height) metadata, md5/byte accounting
    recomputed. The DECODE+resample itself is a deterministic stub
    (byte stream cycled/truncated to width·height — real impl: PIL
    ``Image.open(...).resize((w, h))`` per ``decode_real``'s
    contract); the Spark-side shape is real: schema evolution, bounded
    Arrow batches, partition inheritance.

    Corrupt-input policy (shared with sample_frames): empty/None
    payloads are DROPPED, not emitted as zero images — downstream row
    accounting must see only decodable media."""
    import hashlib

    target = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keep = pdf["payload"].map(lambda p: p is not None and len(p) > 0)
            pdf = pdf[keep]
            resized = [
                bytes((p * (target // len(p) + 1))[:target])
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "modality": pdf["modality"],
                    "width": width,
                    "height": height,
                    "n_bytes": [len(r) for r in resized],
                    "content_md5": [hashlib.md5(r).hexdigest() for r in resized],
                    "payload": resized,
                }
            )

    return df.mapInPandas(run, schema=RESIZED_SCHEMA)


def sample_frames(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling plumbing: each video payload fans out to
    ``n_frames`` rows (doc_id, frame_idx, frame_payload) — the 1→N
    batch shape of real frame extraction (pyav: decode every k-th
    keyframe). The stub slices the byte stream into n_frames equal
    deterministic segments; empty payloads yield zero rows (a
    corrupt-input drop, the behavior a real decoder needs)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sizes, frames = [], [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                if p is None or len(p) == 0:
                    continue
                step = max(len(p) // n_frames, 1)
                for i in range(n_frames):
                    seg = bytes(p[i * step : (i + 1) * step] or p[-step:])
                    ids.append(doc_id)
                    idxs.append(i)
                    sizes.append(len(seg))
                    frames.append(seg)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "n_bytes": pd.Series(sizes, dtype="int64"),
                    "frame_payload": pd.Series(frames, dtype=object),
                }
            )

    return df.mapInPandas(run, schema=FRAMES_SCHEMA)


def extract_features(
    df: DataFrame,
    batch_size: int = 256,
    use_real_decoder: bool = False,
) -> DataFrame:
    """Feature-extract binary payloads via iterator ``mapInPandas``.

    One Python worker per partition, Arrow batches of ``batch_size``
    rows; output preserves ids + metadata and adds ``features``
    (array<float> of FEATURE_DIM). Partitioning is inherited — at
    100 TB, partition the input by size-balanced file groups first.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[["doc_id", "modality", "n_bytes", "content_md5"]].copy()
            if use_real_decoder:
                out["features"] = [
                    decode_real(p, m)
                    for p, m in zip(pdf["payload"], pdf["modality"])
                ]
            else:
                out["features"] = [_stub_features(p) for p in pdf["payload"]]
            # honor batch_size: emit in bounded chunks
            for start in range(0, len(out), batch_size):
                yield out.iloc[start : start + batch_size]

    return df.mapInPandas(run, schema=FEATURES_SCHEMA)
