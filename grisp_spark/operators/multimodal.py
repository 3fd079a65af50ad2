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
The JPEG PIXEL path is real too (r7): ``jpeg_encode_blocks`` /
``jpeg_decode`` implement baseline sequential grayscale JPEG per the
public ITU T.81 spec in stdlib/numpy — huffman entropy coding, DC
differences, AC run-lengths, zigzag, dequantization, float64 IDCT,
byte stuffing and restart markers — and ``synth_jpeg``'s DC-only
fixtures decode to an exact integer closed form the mm05 oracle
recomputes in SQL. Only audio/video CODECS stay header-only: those
genuinely need external libs. The feature kernel
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



# -- real JPEG pixel path (mm05) ---------------------------------------
#
# Baseline sequential grayscale JPEG per the public ITU T.81 spec —
# no codec libraries. ``jpeg_encode_blocks`` packs QUANTIZED 8×8
# coefficient blocks into a spec-valid JFIF stream (DQT stored in
# zigzag order, SOF0, a DHT with canonical huffman tables, SOS,
# huffman-coded DC differences + AC run-lengths, 0xFF byte stuffing,
# optional DRI/RSTn restart intervals) and ``jpeg_decode`` is a
# GENERIC baseline decoder: marker walk → DHT table build (any valid
# BITS/HUFFVAL, not just the encoder's) → entropy decode with
# unstuffing and restart handling → dequantize → float64 IDCT →
# level shift → clamp. Reference parity: the grisp reference treats
# media attachments as opaque typed blobs (SURVEY.md §2.10); the
# decode stage here is the sandbox-real analogue.
#
# The mm05 FIXTURE profile is DC-only with q[0] = 8: a DC-only block
# IDCTs to the constant F00/8, so the dequantized 8·DC/8 + 128 level
# shift makes every pixel of block (by,bx) EXACTLY DC + 128 — an
# integer closed form of the doc columns that a DuckDB oracle can
# recompute without a decoder, while the Spark side must genuinely
# huffman-decode + IDCT the bytes. The AC path (run-lengths, ZRL,
# EOB, zigzag, full IDCT) is pinned by pytest round-trips of random
# coefficient blocks against an independent cos-formula IDCT.

JPEG_BW_MOD, JPEG_BH_MOD = 6, 4  # blocks: w ≤ 48, h ≤ 32 (8·blocks)
JPEG_DC_MOD, JPEG_DC_OFF = 201, 100  # DC ∈ [-100, 100] → px ∈ [28, 228]
JPEG_STATS_SCHEMA = (
    "doc_id long, width int, height int, n_px int, px_sum long, "
    "px_min int, px_max int, block_sums string"
)

# canonical flat-length huffman tables (valid per T.81 C.2: all
# 12 DC symbols at 4 bits — 12·2⁻⁴ ≤ 1, code 0xF unused; all 162
# standard AC symbols at 8 bits — 162·2⁻⁸ ≤ 1, code 0xFF unused —
# the all-ones code stays reserved as the spec requires)
_JPEG_DC_BITS = [0, 0, 0, 12] + [0] * 12
_JPEG_DC_VALS = list(range(12))
_JPEG_AC_BITS = [0] * 7 + [162] + [0] * 8
_JPEG_AC_VALS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]


def _zigzag_yx() -> list[tuple[int, int]]:
    # anti-diagonal walk, direction alternating per diagonal (T.81
    # figure 5); generated rather than transcribed so it cannot typo
    out = []
    for d in range(15):
        rng = range(max(0, d - 7), min(d, 7) + 1)
        for y in rng if d % 2 else reversed(rng):
            out.append((y, d - y))
    return out


_ZIGZAG = _zigzag_yx()


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    # canonical code assignment (T.81 C.2): within a length, codes
    # increase in HUFFVAL order; moving to the next length shifts left
    codes: dict[int, tuple[int, int]] = {}
    code = k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            codes[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    """Entropy-segment bit packer: MSB-first, 0xFF bytes stuffed with
    a 0x00 per the spec, flush pads the tail with 1-bits."""

    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, value: int, nbits: int) -> None:
        self._acc = (self._acc << nbits) | (value & ((1 << nbits) - 1))
        self._n += nbits
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.put((1 << pad) - 1, pad)


def _dct_basis():
    import numpy as np

    x = np.arange(8, dtype=np.float64)
    m = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) / 2
    m[0] /= np.sqrt(2.0)
    return m  # orthonormal: spatial = M.T @ coef @ M


def _mag_bits(v: int) -> tuple[int, int]:
    # T.81 F.1.2.1: category = bit length of |v|; negative values
    # code as v - 1 in category-many low bits (ones' complement)
    s = int(v).bit_length() if v >= 0 else int(-v).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


def jpeg_encode_blocks(coefs, qtable, restart_interval: int = 0) -> bytes:
    """Spec-valid baseline sequential grayscale JFIF from QUANTIZED
    coefficient blocks ``coefs`` (bh, bw, 8, 8) in natural order and a
    64-entry natural-order ``qtable``. General DC-diff + AC
    run-length/ZRL/EOB coding — the mm05 fixtures just happen to pass
    DC-only blocks. ``restart_interval`` > 0 emits DRI + RSTn markers
    every that many MCUs (predictor reset + byte align)."""
    import numpy as np

    coefs = np.asarray(coefs, dtype=np.int64)
    bh, bw = coefs.shape[:2]
    q = np.asarray(qtable, dtype=np.int64).reshape(8, 8)
    dc_codes = _huff_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _huff_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)

    head = bytearray(b"\xff\xd8")  # SOI
    head += (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    zq = bytes(int(q[y, x]) for y, x in _ZIGZAG)  # DQT stores zigzag
    head += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + zq
    head += (
        b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
        + struct.pack(">HH", bh * 8, bw * 8) + b"\x01\x01\x11\x00"
    )
    dht = (
        b"\x00" + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS)
        + b"\x10" + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS)
    )
    head += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    if restart_interval:
        head += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    head += b"\xff\xda" + struct.pack(">H", 8) + b"\x01\x01\x00\x00\x3f\x00"

    w = _BitWriter()
    pred = 0
    rst = 0
    for i, (by, bx) in enumerate(
        (y, x) for y in range(bh) for x in range(bw)
    ):
        if restart_interval and i and i % restart_interval == 0:
            w.flush()
            head += bytes(w.out) + bytes((0xFF, 0xD0 + rst))
            w = _BitWriter()
            rst = (rst + 1) % 8
            pred = 0
        block = coefs[by, bx]
        dc = int(block[0, 0])
        s, val = _mag_bits(dc - pred)
        pred = dc
        if s > 11:  # baseline DC categories are 0-11 (T.81 F.1.2.1.2)
            raise ValueError(
                f"DC diff {dc} out of baseline range (|diff| <= 2047)"
            )
        code, ln = dc_codes[s]
        w.put(code, ln)
        if s:
            w.put(val, s)
        zz = [int(block[y, x]) for y, x in _ZIGZAG]
        run = 0
        last_nz = max((k for k in range(1, 64) if zz[k]), default=0)
        for k in range(1, last_nz + 1):
            if zz[k] == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_codes[0xF0]  # ZRL: 16 zeros
                w.put(code, ln)
                run -= 16
            s, val = _mag_bits(zz[k])
            if s > 10:  # baseline AC sizes are 1-10 (T.81 F.1.2.2.1)
                raise ValueError(
                    f"AC coefficient {zz[k]} out of baseline range (|v| <= 1023)"
                )
            code, ln = ac_codes[(run << 4) | s]
            w.put(code, ln)
            w.put(val, s)
            run = 0
        if last_nz < 63:
            code, ln = ac_codes[0x00]  # EOB
            w.put(code, ln)
    w.flush()
    return bytes(head) + bytes(w.out) + b"\xff\xd9"


class _BitReader:
    """Entropy-segment bit reader: unstuffs 0xFF00, byte-aligns and
    reports RSTn markers, stops at any other marker."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0
        self.at_marker = False

    def read_bit(self) -> int | None:
        if not self._n:
            if self.pos >= len(self.data):
                return None
            byte = self.data[self.pos]
            if byte == 0xFF:
                nxt = (
                    self.data[self.pos + 1]
                    if self.pos + 1 < len(self.data)
                    else None
                )
                if nxt == 0x00:
                    self.pos += 2  # stuffed data byte
                else:
                    self.at_marker = True
                    return None
                self._acc, self._n = 0xFF, 8
            else:
                self.pos += 1
                self._acc, self._n = byte, 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def restart(self) -> bool:
        # expect an RSTn marker at the current (byte-aligned) position
        self._n = 0
        self.at_marker = False
        if (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.pos += 2
            return True
        return False

    def receive(self, n: int) -> int | None:
        v = 0
        for _ in range(n):
            bit = self.read_bit()
            if bit is None:
                return None
            v = (v << 1) | bit
        return v


def _extend(v: int, s: int) -> int:
    # T.81 F.2.2.1 EXTEND: low-magnitude codes are negative values
    return v if not s or v >= (1 << (s - 1)) else v - (1 << s) + 1


def _huff_decode(r: _BitReader, table: dict[tuple[int, int], int]):
    code = 0
    for ln in range(1, 17):
        bit = r.read_bit()
        if bit is None:
            return None
        code = (code << 1) | bit
        sym = table.get((ln, code))
        if sym is not None:
            return sym
    return None


def jpeg_decode(b: bytes):
    """Generic baseline sequential grayscale JPEG pixel decode (pure
    stdlib/numpy): marker walk → DQT/DHT/SOF0/DRI/SOS parse → huffman
    entropy decode (DC diff + AC run-length, restart handling) →
    dequantize → float64 IDCT → +128 level shift → clamp. Returns the
    (h, w) uint8 matrix, or None for non-JPEG / progressive /
    multi-component / corrupt payloads (a bad blob must not kill the
    stage at 100 TB)."""
    import numpy as np

    if len(b) < 4 or b[0] != 0xFF or b[1] != 0xD8:
        return None
    qtabs: dict[int, list[int]] = {}
    huffs: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    dims = None  # (h, w, qtab_id)
    dri = 0
    pos = 2
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            return None
        marker = b[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        # standalone (zero-payload) markers — TEM and stray RSTn/EOI —
        # carry NO length field; reading one as length-prefixed would
        # mis-walk a foreign/hostile stream into a wrong-but-plausible
        # parse instead of a clean rejection (ADVICE r7). None of them
        # is valid before SOS in a baseline stream we accept.
        if marker == 0x01 or 0xD0 <= marker <= 0xD9:
            return None
        (seglen,) = struct.unpack(">H", b[pos + 2 : pos + 4])
        if seglen < 2 or pos + 2 + seglen > len(b):
            return None
        seg = b[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT — possibly several tables per segment
            sp = 0
            while sp < len(seg):
                if seg[sp] >> 4:  # 16-bit tables unsupported
                    return None
                tid = seg[sp] & 0x0F
                if sp + 65 > len(seg):
                    return None
                qtabs[tid] = list(seg[sp + 1 : sp + 65])  # zigzag order
                sp += 65
        elif marker == 0xC4:  # DHT — build (len, code) -> symbol
            sp = 0
            while sp + 17 <= len(seg):
                tc, th = seg[sp] >> 4, seg[sp] & 0x0F
                bits = list(seg[sp + 1 : sp + 17])
                nv = sum(bits)
                vals = list(seg[sp + 17 : sp + 17 + nv])
                if len(vals) < nv:
                    return None
                table: dict[tuple[int, int], int] = {}
                code = k = 0
                for ln in range(1, 17):
                    for _ in range(bits[ln - 1]):
                        table[(ln, code)] = vals[k]
                        code += 1
                        k += 1
                    code <<= 1
                huffs[(tc, th)] = table
                sp += 17 + nv
        elif marker == 0xC0:  # SOF0 baseline
            if len(seg) < 9 or seg[0] != 8:
                return None
            h, w = struct.unpack(">HH", seg[1:5])
            if seg[5] != 1 or seg[7] != 0x11:  # one component, 1×1
                return None
            # reject degenerate/hostile frames BEFORE any allocation:
            # h==0/w==0 would return a 0-sized array (downstream
            # kernels index [-1] → stage death instead of a skipped
            # blob), and a 200-byte stream declaring 65535×65535
            # would allocate ~4 GB of block planes unvalidated
            if h == 0 or w == 0 or h * w > 16_777_216:  # 16 Mpx cap
                return None
            dims = (h, w, seg[8])
        elif marker in _JPEG_SOF:  # progressive etc. — unsupported
            return None
        elif marker == 0xDD:  # DRI
            if len(seg) < 2:
                return None
            (dri,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if dims is None or len(seg) < 4 or seg[0] != 1:
                return None
            td, ta = seg[2] >> 4, seg[2] & 0x0F
            dctab, actab = huffs.get((0, td)), huffs.get((1, ta))
            h, w, qid = dims
            if dctab is None or actab is None or qid not in qtabs:
                return None
            zq = qtabs[qid]
            q = np.zeros((8, 8), dtype=np.float64)
            for k, (y, x) in enumerate(_ZIGZAG):
                q[y, x] = zq[k]
            m = _dct_basis()
            bh, bw = -(-h // 8), -(-w // 8)
            out = np.zeros((bh * 8, bw * 8), dtype=np.uint8)
            r = _BitReader(b, pos + 2 + seglen)
            pred = 0
            for i in range(bh * bw):
                if dri and i and i % dri == 0:
                    if not r.restart():
                        return None
                    pred = 0
                coef = np.zeros((8, 8), dtype=np.float64)
                s = _huff_decode(r, dctab)
                if s is None or s > 11:
                    return None
                if s:
                    v = r.receive(s)
                    if v is None:
                        return None
                    pred += _extend(v, s)
                coef[0, 0] = pred
                k = 0
                while k < 63:
                    rs = _huff_decode(r, actab)
                    if rs is None:
                        return None
                    if rs == 0x00:  # EOB
                        break
                    if rs == 0xF0:  # ZRL
                        k += 16
                        # ZRL must leave room for a following nonzero
                        # coefficient (trailing zeros are coded by EOB)
                        # — k ≥ 63 here means a hostile/corrupt stream;
                        # reject instead of desyncing the bit reader
                        # into the next block's DC (ADVICE r7)
                        if k >= 63:
                            return None
                        continue
                    k += (rs >> 4) + 1
                    if k > 63:
                        return None
                    sz = rs & 0x0F
                    v = r.receive(sz)
                    if v is None:
                        return None
                    y, x = _ZIGZAG[k]
                    coef[y, x] = _extend(v, sz)
                px = m.T @ (coef * q) @ m + 128.0
                by, bx = divmod(i, bw)
                out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.clip(
                    np.round(px), 0, 255
                ).astype(np.uint8)
            return out[:h, :w]
        pos += 2 + seglen
    return None


def _jpeg_qtable():
    import numpy as np

    q = np.full((8, 8), 16, dtype=np.int64)
    q[0, 0] = 8  # dequant 8·DC cancels the IDCT's /8: pixel = DC + 128
    return q


def synth_jpeg(docs: DataFrame) -> DataFrame:
    """Deterministic spec-valid baseline JPEGs from the doc columns:
    (doc_id % 6 + 1) × (n_chars % 4 + 1) blocks of 8×8, block (by,bx)
    carrying quantized DC = ((11·doc_id + 7·bx + 13·by) mod 201) − 100
    and zero AC — everything the oracle can recompute from the table
    while the pixel kernel must actually huffman-decode + IDCT."""
    import numpy as np

    q = _jpeg_qtable()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for doc_id, n_chars in zip(pdf["doc_id"], pdf["n_chars"]):
                bw = int(doc_id) % JPEG_BW_MOD + 1
                bh = int(n_chars) % JPEG_BH_MOD + 1
                bxs = np.arange(bw, dtype=np.int64)
                bys = np.arange(bh, dtype=np.int64)
                dc = (
                    11 * int(doc_id) + 7 * bxs[None, :] + 13 * bys[:, None]
                ) % JPEG_DC_MOD - JPEG_DC_OFF
                coefs = np.zeros((bh, bw, 8, 8), dtype=np.int64)
                coefs[:, :, 0, 0] = dc
                payloads.append(jpeg_encode_blocks(coefs, q))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "payload": payloads})

    return docs.select("doc_id", "n_chars").mapInPandas(
        run, schema="doc_id long, payload binary"
    )


def jpeg_pixel_stats(media: DataFrame) -> DataFrame:
    """Pixel statistics over REAL entropy-decoded JPEG pixels: per
    image the exact integer pixel count/sum/min/max plus the per-8×8-
    block pixel sums '|'-joined in (by, bx) order — scalar columns the
    driver canon can hash, each recomputable by the oracle from the
    synth_jpeg closed form. Rows that don't decode as baseline
    grayscale JPEG are skipped (a bad blob must not kill the stage at
    100 TB)."""
    import numpy as np

    cols = (
        "doc_id", "width", "height", "n_px", "px_sum",
        "px_min", "px_max", "block_sums",
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {c: [] for c in cols}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                px = jpeg_decode(bytes(payload) if payload is not None else b"")
                if px is None:
                    continue
                h, w = px.shape
                v = px.astype(np.int64)
                gy = np.arange(h, dtype=np.int64) // 8
                gx = np.arange(w, dtype=np.int64) // 8
                m = np.zeros((int(gy[-1]) + 1, int(gx[-1]) + 1), dtype=np.int64)
                np.add.at(m, (gy[:, None], gx[None, :]), v)
                rows["doc_id"].append(doc_id)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_px"].append(int(v.size))
                rows["px_sum"].append(int(v.sum()))
                rows["px_min"].append(int(v.min()))
                rows["px_max"].append(int(v.max()))
                rows["block_sums"].append(
                    "|".join(str(int(x)) for x in m.ravel())
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=JPEG_STATS_SCHEMA)
