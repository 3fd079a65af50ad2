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
