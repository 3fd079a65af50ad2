"""Multimodal column plumbing: opaque binary payloads + typed
metadata, decoded / feature-extracted via Arrow-batched mapInPandas.

The header DECODE path is real: ``parse_media_header`` parses PNG
IHDR / JPEG SOF / WAV fmt headers with pure byte arithmetic (no codec
libraries), and ``synth_media`` builds genuine headers with
``struct.pack`` so the mm01 oracle checks an actual pack→parse
round-trip.

The PNG PIXEL path is also real (no codec libraries needed — PNG is
zlib + per-row filters, both implementable in stdlib/numpy):
``synth_png`` emits spec-valid 8-bit grayscale PNGs (IHDR + IDAT +
IEND with correct CRC32s, scanlines cycling through ALL five filter
types) whose pixel values follow a closed-form formula of the doc
columns, and ``png_decode`` recovers the pixel matrix by chunk walk →
zlib.decompress → per-row unfilter (Sub/Up/Average/Paeth). The
frame-sample and resize kernels operate on these REAL decoded pixels,
and their oracles recompute the exact integer pixel statistics from
the generation formula in SQL — a wrong unfilter cannot hash-match.
Only JPEG entropy decode (DCT) and audio/video codecs stay
header-only: those genuinely need external libs. The feature kernel
(``extract_features``) also runs on REAL decoded pixels — 8-bin
intensity histogram plus horizontal/vertical gradient energy, the
integer preprocessing a learned featurizer computes; only the learned
EMBEDDING itself (model weights) stays out of scope."""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

DECODE_SCHEMA = (
    "doc_id long, n_bytes int, width int, height int, format string"
)
N_FEATURE_BINS = 8
FEATURE_SCHEMA = (
    "doc_id long, n_px int, px_sum long, "
    + ", ".join(f"h{i} int" for i in range(N_FEATURE_BINS))
    + ", grad_h long, grad_v long"
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


# -- real PNG pixel path (mm02/mm04) ----------------------------------
#
# 8-bit grayscale profile: pixel(y, x) = (7·doc_id + 3x + 5y) mod 251
# — closed-form in the doc columns, so a DuckDB oracle can recompute
# exact integer pixel statistics from the table WITHOUT a decoder,
# while the Spark side must genuinely zlib-inflate and unfilter the
# bytes. Scanline y is filtered with type y mod 5, so every PNG filter
# (None/Sub/Up/Average/Paeth) is exercised on any image with h ≥ 5.
PNG_W_MOD, PNG_H_MOD = 48, 32
FRAME_STATS_SCHEMA = (
    "doc_id long, frame_idx int, band_h int, px_sum long, "
    "px_min int, px_max int"
)
RESIZE_PX_SCHEMA = (
    "doc_id long, width int, height int, out_w int, out_h int, "
    "px_sum long, box_sums string"
)


def _png_pixels(doc_id: int, w: int, h: int):
    import numpy as np

    xs = np.arange(w, dtype=np.int64)
    ys = np.arange(h, dtype=np.int64)
    return ((7 * doc_id + 3 * xs[None, :] + 5 * ys[:, None]) % 251).astype(
        np.uint8
    )


def _paeth(a: int, b: int, c: int) -> int:
    # the PNG predictor (RFC 2083 §6.6): nearest of left/up/up-left
    # to the linear estimate a + b − c, ties a > b > c
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data))
    )


def png_encode(px) -> bytes:
    """Spec-valid 8-bit grayscale PNG from a (h, w) uint8 matrix:
    IHDR + one IDAT + IEND with correct CRC32s; scanline y uses filter
    type y % 5 (filters predict from RAW neighbor values per the PNG
    spec, differences taken mod 256)."""
    import zlib

    import numpy as np

    h, w = px.shape
    raw = bytearray()
    for y in range(h):
        row = px[y].astype(np.int64)
        up = px[y - 1].astype(np.int64) if y else np.zeros(w, dtype=np.int64)
        ft = y % 5
        if ft == 0:
            f = row
        elif ft == 1:  # Sub
            f = row - np.concatenate(([0], row[:-1]))
        elif ft == 2:  # Up
            f = row - up
        elif ft == 3:  # Average
            f = row - (np.concatenate(([0], row[:-1])) + up) // 2
        else:  # Paeth
            f = np.empty(w, dtype=np.int64)
            for x in range(w):
                a = int(row[x - 1]) if x else 0
                c = int(up[x - 1]) if x else 0
                f[x] = row[x] - _paeth(a, int(up[x]), c)
        raw.append(ft)
        raw += (f % 256).astype(np.uint8).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def png_decode(b: bytes):
    """Pure numpy/stdlib PNG pixel decode for the 8-bit grayscale
    profile ``png_encode`` emits: chunk walk → concatenated-IDAT
    zlib.decompress → per-scanline unfilter (Sub via cumsum mod 256;
    Average/Paeth per-pixel — each output pixel feeds the next
    prediction). Returns the (h, w) uint8 matrix, or None for
    non-PNG / unsupported-profile / corrupt payloads (a bad blob must
    not kill the stage at 100 TB)."""
    import zlib

    import numpy as np

    if not b.startswith(_PNG_SIG):
        return None
    pos, w, h, idat = 8, None, None, bytearray()
    while pos + 8 <= len(b):
        (clen,) = struct.unpack(">I", b[pos : pos + 4])
        ctype = b[pos + 4 : pos + 8]
        data = b[pos + 8 : pos + 8 + clen]
        if ctype == b"IHDR":
            if len(data) < 13:
                return None
            w, h, depth, color = struct.unpack(">IIBB", data[:10])
            if depth != 8 or color != 0 or data[12] != 0:  # no interlace
                return None
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
        pos += 12 + clen
    if not w or not h or not idat:
        return None
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error:
        return None
    stride = w + 1
    if len(raw) != h * stride:
        return None
    out = np.empty((h, w), dtype=np.uint8)
    prev = np.zeros(w, dtype=np.int64)
    for y in range(h):
        ft = raw[y * stride]
        line = np.frombuffer(
            raw[y * stride + 1 : (y + 1) * stride], dtype=np.uint8
        ).astype(np.int64)
        if ft == 0:
            row = line
        elif ft == 1:  # Sub: raw[x] = f[x] + raw[x-1]
            row = np.cumsum(line) % 256
        elif ft == 2:  # Up
            row = (line + prev) % 256
        elif ft == 3:  # Average
            row = np.empty(w, dtype=np.int64)
            left = 0
            for x in range(w):
                left = (int(line[x]) + (left + int(prev[x])) // 2) % 256
                row[x] = left
        elif ft == 4:  # Paeth
            row = np.empty(w, dtype=np.int64)
            for x in range(w):
                a = int(row[x - 1]) if x else 0
                c = int(prev[x - 1]) if x else 0
                row[x] = (int(line[x]) + _paeth(a, int(prev[x]), c)) % 256
        else:
            return None
        out[y] = row.astype(np.uint8)
        prev = row
    return out


def synth_png(docs: DataFrame) -> DataFrame:
    """Deterministic spec-valid grayscale PNGs from the doc columns:
    dims (doc_id % 48 + 1) × (n_chars % 32 + 1), pixel values from the
    closed-form formula above — everything an oracle can recompute
    from the table while the pixel kernels must actually decode."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                png_encode(
                    _png_pixels(
                        int(doc_id),
                        int(doc_id) % PNG_W_MOD + 1,
                        int(n_chars) % PNG_H_MOD + 1,
                    )
                )
                for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"])
            ]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return docs.select("doc_id", "n_chars").mapInPandas(
        run, schema="doc_id long, payload binary"
    )


def sample_frames_pixels(media: DataFrame, n_frames: int = 3) -> DataFrame:
    """Frame sampling on REAL decoded pixels: the image splits into
    ≤ ``n_frames`` horizontal bands (band height ⌈h/n⌉ — the row-group
    analogue of video keyframe strides) and each band emits exact
    integer pixel statistics. One row in → many rows out, Arrow
    batches end to end; rows that don't decode as PNG are skipped."""
    import numpy as np

    cols = ("doc_id", "frame_idx", "band_h", "px_sum", "px_min", "px_max")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {c: [] for c in cols}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                px = png_decode(bytes(payload) if payload is not None else b"")
                if px is None:
                    continue
                h = px.shape[0]
                band = -(-h // n_frames)
                for i in range(-(-h // band)):
                    part = px[i * band : (i + 1) * band].astype(np.int64)
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(i)
                    rows["band_h"].append(part.shape[0])
                    rows["px_sum"].append(int(part.sum()))
                    rows["px_min"].append(int(part.min()))
                    rows["px_max"].append(int(part.max()))
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=FRAME_STATS_SCHEMA)


def resize_pixels(media: DataFrame, out: int = 4) -> DataFrame:
    """Box-reduce REAL decoded pixels to an ≤ out×out grid (pixel
    (y, x) → box (y·out÷h, x·out÷w), integer sums per box — the exact
    aggregation a mean-pool thumbnailer computes before the divide,
    kept as integers so the oracle is drift-free). Emits the box sums
    '|'-joined in (by, bx) order plus the total, as scalar columns the
    driver canon can hash."""
    import numpy as np

    cols = ("doc_id", "width", "height", "out_w", "out_h", "px_sum", "box_sums")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {c: [] for c in cols}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                px = png_decode(bytes(payload) if payload is not None else b"")
                if px is None:
                    continue
                h, w = px.shape
                bx = (np.arange(w, dtype=np.int64) * out) // w
                by = (np.arange(h, dtype=np.int64) * out) // h
                m = np.zeros((out, out), dtype=np.int64)
                np.add.at(m, (by[:, None], bx[None, :]), px.astype(np.int64))
                ys, xs = sorted(set(by.tolist())), sorted(set(bx.tolist()))
                rows["doc_id"].append(doc_id)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["out_w"].append(len(xs))
                rows["out_h"].append(len(ys))
                rows["px_sum"].append(int(px.astype(np.int64).sum()))
                rows["box_sums"].append(
                    "|".join(str(int(m[yy, xx])) for yy in ys for xx in xs)
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=RESIZE_PX_SCHEMA)


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
    """Feature extraction over REAL decoded pixels: per image, a
    ``bins``-bin intensity histogram (bin = v // (256 // bins) over
    the uint8 range) plus horizontal/vertical gradient energy
    (sum |Δv| along each axis) and the pixel count/sum — the exact
    integer preprocessing a learned image featurizer computes before
    the model; only the learned embedding itself (model weights) is
    out of scope in this container. All features are exact integers,
    so the oracle recomputes them from the synth_png closed-form
    pixel grid in SQL — a wrong unfilter or histogram edge cannot
    hash-match. Rows that don't decode as the supported PNG profile
    are skipped (a bad blob must not kill the stage at 100 TB)."""
    import numpy as np

    width = 256 // bins
    cols = (
        ["doc_id", "n_px", "px_sum"]
        + [f"h{i}" for i in range(bins)]
        + ["grad_h", "grad_v"]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {c: [] for c in cols}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                px = png_decode(bytes(payload) if payload is not None else b"")
                if px is None:
                    continue
                v = px.astype(np.int64)
                hist = np.bincount((v // width).ravel(), minlength=bins)
                rows["doc_id"].append(doc_id)
                rows["n_px"].append(int(v.size))
                rows["px_sum"].append(int(v.sum()))
                for i in range(bins):
                    rows[f"h{i}"].append(int(hist[i]))
                rows["grad_h"].append(int(np.abs(np.diff(v, axis=1)).sum()))
                rows["grad_v"].append(int(np.abs(np.diff(v, axis=0)).sum()))
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


