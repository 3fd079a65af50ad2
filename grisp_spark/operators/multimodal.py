"""Multimodal column plumbing: opaque binary payloads + typed
metadata, decoded / feature-extracted via Arrow-batched mapInPandas.

The header DECODE path is real: ``parse_media_header`` parses PNG
IHDR / JPEG SOF / WAV fmt headers with pure byte arithmetic (no codec
libraries), and ``synth_media`` builds genuine headers with
``struct.pack`` so the mm01 oracle checks an actual pack→parse
round-trip. Full-frame pixel/sample decoding would need PIL/ffmpeg
(not in this container), so the frame/feature/resize kernels remain
deterministic stand-ins (clearly marked) — their Spark-side plumbing
(Arrow LargeBinary batches through size-capped mapInPandas, typed
metadata columns for pushdown-friendly filtering) is the part that
matters at scale and is identical to what real codecs would sit in."""

from __future__ import annotations

import struct
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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# JPEG start-of-frame markers that carry dimensions (C4=DHT, C8=JPG
# extension, CC=DAC are NOT frame headers)
_JPEG_SOF = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def _parse_png(b: bytes) -> tuple[int, int, str] | None:
    # signature, then the IHDR chunk must be first: length(4) type(4)
    # width(4) height(4) — widths/heights big-endian at bytes 16..24
    if len(b) < 24 or not b.startswith(_PNG_SIG) or b[12:16] != b"IHDR":
        return None
    w, h = struct.unpack(">II", b[16:24])
    return w, h, "png"


def _parse_jpeg(b: bytes) -> tuple[int, int, str] | None:
    # SOI, then walk marker segments ([0xFF, marker, len_hi, len_lo,
    # payload...]) until a start-of-frame; SOF payload is
    # precision(1) height(2) width(2)
    if len(b) < 4 or b[0] != 0xFF or b[1] != 0xD8:
        return None
    pos = 2
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            return None
        marker = b[pos + 1]
        if marker == 0xFF:  # padding byte
            pos += 1
            continue
        if marker in _JPEG_SOF:
            if pos + 9 > len(b):
                return None
            h, w = struct.unpack(">HH", b[pos + 5 : pos + 9])
            return w, h, "jpeg"
        (seglen,) = struct.unpack(">H", b[pos + 2 : pos + 4])
        if seglen < 2:
            return None
        pos += 2 + seglen
    return None


def _parse_wav(b: bytes) -> tuple[int, int, str] | None:
    # RIFF/WAVE container; walk chunks until 'fmt ': channels(2) at
    # offset 2, sample rate(4) at offset 4, both little-endian.
    # Reported as (width=sample_rate, height=channels) — the audio
    # analogues of the image dims in the shared metadata schema.
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    pos = 12
    while pos + 8 <= len(b):
        cid = b[pos : pos + 4]
        (csize,) = struct.unpack("<I", b[pos + 4 : pos + 8])
        if cid == b"fmt ":
            if pos + 16 > len(b):
                return None
            channels, rate = struct.unpack("<HI", b[pos + 10 : pos + 16])
            return rate, channels, "wav"
        pos += 8 + csize + (csize & 1)  # chunks are word-aligned
    return None


def parse_media_header(payload: bytes) -> tuple[int, int, str]:
    """Real header parse — PNG IHDR, JPEG SOF, WAV fmt — by byte
    arithmetic alone (struct.unpack, no codec libraries). Unknown or
    truncated payloads classify as ('unknown', 0×0) rather than
    raising: at 100 TB a corrupt blob must not kill the stage."""
    if not payload:
        return 0, 0, "empty"
    for parser in (_parse_png, _parse_jpeg, _parse_wav):
        meta = parser(payload)
        if meta is not None:
            return meta
    return 0, 0, "unknown"


def synth_media(docs: DataFrame) -> DataFrame:
    """Deterministic media payloads with GENUINE headers, packed from
    the document columns: doc_id%3 picks PNG/JPEG/WAV; image dims are
    (doc_id%1920+1) × (n_chars%1080+1); WAV sample rate is
    (doc_id%48)*1000+8000 with n_chars%8+1 channels. The text bytes
    ride along as the opaque body, so payload length is
    header_size + n_chars (headers: PNG 33, JPEG 33, WAV 44 bytes) —
    everything an oracle can recompute from the table columns while
    decode_metadata must actually parse the bytes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, kinds = [], []
            for doc_id, n_chars, text in zip(
                pdf["doc_id"], pdf["n_chars"], pdf["text"]
            ):
                body = (text or "").encode("utf-8")
                kind = int(doc_id) % 3
                if kind == 0:
                    w, h = int(doc_id) % 1920 + 1, int(n_chars) % 1080 + 1
                    head = (
                        _PNG_SIG
                        + struct.pack(">I", 13)
                        + b"IHDR"
                        + struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)
                        + b"\x00\x00\x00\x00"  # CRC slot (not validated)
                    )
                    kinds.append("image/png")
                elif kind == 1:
                    w, h = int(doc_id) % 1920 + 1, int(n_chars) % 1080 + 1
                    app0 = (
                        b"\xff\xe0"
                        + struct.pack(">H", 16)
                        + b"JFIF\x00\x01\x01\x00"
                        + struct.pack(">HH", 1, 1)
                        + b"\x00\x00"
                    )
                    sof0 = (
                        b"\xff\xc0"
                        + struct.pack(">H", 11)
                        + b"\x08"
                        + struct.pack(">HH", h, w)
                        + b"\x01\x01\x11\x00"
                    )
                    head = b"\xff\xd8" + app0 + sof0
                    kinds.append("image/jpeg")
                else:
                    rate = (int(doc_id) % 48) * 1000 + 8000
                    ch = int(n_chars) % 8 + 1
                    head = (
                        b"RIFF"
                        + struct.pack("<I", 36 + len(body))
                        + b"WAVE"
                        + b"fmt "
                        + struct.pack("<I", 16)
                        + struct.pack(
                            "<HHIIHH", 1, ch, rate, rate * ch * 2, ch * 2, 16
                        )
                        + b"data"
                        + struct.pack("<I", len(body))
                    )
                    kinds.append("audio/wav")
                payloads.append(head + body)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": payloads,
                    "media_type": kinds,
                }
            )

    return docs.select("doc_id", "n_chars", "text").mapInPandas(
        run, schema="doc_id long, payload binary, media_type string"
    )


def decode_metadata(media: DataFrame) -> DataFrame:
    """Arrow-batched decode: binary in → typed metadata out."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            widths, heights, fmts, nbytes = [], [], [], []
            for payload in pdf["payload"]:
                b = bytes(payload) if payload is not None else b""
                w, h, f = parse_media_header(b)
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
