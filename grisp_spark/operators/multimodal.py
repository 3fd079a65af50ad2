"""Multimodal column plumbing: opaque binary payloads + typed
metadata, decoded / feature-extracted via Arrow-batched mapInPandas.

The image/audio codec libraries are not in this container, so the
decode kernels are deterministic stubs (clearly marked) — but the
Spark-side plumbing is real and is the part that matters at scale:
binary columns travel as Arrow LargeBinary batches, the decode stage
is a mapInPandas over a size-capped batch iterator, and metadata
lands as typed columns for pushdown-friendly filtering downstream.
Swap ``_stub_decode`` for PIL/ffmpeg and nothing else changes."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = (
    "doc_id long, n_bytes int, width int, height int, format string"
)
FRAME_SCHEMA = "doc_id long, frame_idx int, frame_hash string"
N_FEATURE_BINS = 8
FEATURE_SCHEMA = "doc_id long, " + ", ".join(
    f"b{i} int" for i in range(N_FEATURE_BINS)
)
RESIZE_SCHEMA = "doc_id long, out_w int, out_h int, pixel_hash string"
RESIZE_PIXELS = 16


def attach_payload(docs: DataFrame) -> DataFrame:
    """Synthesize an opaque binary column (utf-8 bytes of the text) —
    the stand-in for image/audio blobs with the same schema shape:
    (id, payload: binary, media_type: string)."""
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.lit("image/fake").alias("media_type"),
    )


def _stub_decode(payload: bytes) -> tuple[int, int, str]:
    """STUB: deterministic fake of an image header parse. Real
    implementation would be PIL.Image.open(io.BytesIO(payload));
    unavailable in this container."""
    if not payload:
        return 0, 0, "empty"
    return payload[0] % 64 + 1, len(payload) % 64 + 1, "fake"


def decode_metadata(media: DataFrame) -> DataFrame:
    """Arrow-batched decode: binary in → typed metadata out."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            widths, heights, fmts, nbytes = [], [], [], []
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                w, h, f = _stub_decode(b)
                widths.append(w)
                heights.append(h)
                fmts.append(f)
                nbytes.append(len(b))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": nbytes,
                    "width": widths,
                    "height": heights,
                    "format": fmts,
                }
            )

    return media.mapInPandas(run, schema=DECODE_SCHEMA)


def extract_features(media: DataFrame, bins: int = N_FEATURE_BINS) -> DataFrame:
    """Feature extraction over binary payloads: a ``bins``-bin
    byte-value histogram per payload (numpy-vectorized over the raw
    bytes — the stand-in for a real image/audio feature extractor
    with identical batch plumbing). Integer counts as scalar columns
    so the driver canon can hash them exactly."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"doc_id": []}
            for i in range(bins):
                out[f"b{i}"] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                arr = np.frombuffer(b, dtype=np.uint8)
                hist = np.bincount(arr % bins, minlength=bins)
                out["doc_id"].append(doc_id)
                for i in range(bins):
                    out[f"b{i}"].append(int(hist[i]))
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def resize(media: DataFrame, max_pixels: int = RESIZE_PIXELS) -> DataFrame:
    """Resize stub: subsample the payload to ≤``max_pixels`` "pixels"
    (every ceil(n/max)-th byte) and hash the result — the
    decimate-then-rehash shape of a real thumbnailer, with the output
    dims recorded as typed columns. Real implementation would be
    PIL.Image.resize; unavailable in this container."""
    import hashlib
    import math

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out_cols = ("doc_id", "out_w", "out_h", "pixel_hash")
        for pdf in batches:
            rows: dict[str, list] = {c: [] for c in out_cols}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                if not b:
                    continue
                step = math.ceil(len(b) / max_pixels)
                sampled = b[::step]
                rows["doc_id"].append(doc_id)
                rows["out_w"].append(len(sampled))
                rows["out_h"].append(1)
                rows["pixel_hash"].append(hashlib.md5(sampled).hexdigest())
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=RESIZE_SCHEMA)


def sample_frames(media: DataFrame, n_frames: int = 3) -> DataFrame:
    """Frame-sampling stub: emit ``n_frames`` deterministic "frames"
    per payload (byte-slice hashes) — the UDTF shape (one row in, many
    rows out) of real video frame extraction."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                if not b:
                    continue
                step = max(1, len(b) // n_frames)
                for i in range(min(n_frames, len(b))):
                    chunk = b[i * step : (i + 1) * step]
                    ids.append(doc_id)
                    idxs.append(i)
                    hashes.append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame_hash": hashes})

    return media.mapInPandas(run, schema=FRAME_SCHEMA)
