"""Header-parser unit tests (pure python — no Spark needed) plus the
pack→parse round-trip through the Spark stages.

The mm01 oracle (tests/test_entry_contract.py) checks the full
round-trip against DuckDB; these tests pin the parser semantics on
hand-built buffers, including the malformed cases the oracle can't
reach."""

import struct

from grisp_spark.operators.multimodal import parse_media_header

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png(w, h):
    return (
        PNG_SIG
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0)
        + b"\x00\x00\x00\x00"
    )


def _jpeg(w, h, *, pad=False, extra_segments=()):
    out = b"\xff\xd8"
    for seg in extra_segments:
        out += seg
    if pad:
        out += b"\xff"  # marker padding byte before the next segment
    out += (
        b"\xff\xc0"
        + struct.pack(">H", 11)
        + b"\x08"
        + struct.pack(">HH", h, w)
        + b"\x01\x01\x11\x00"
    )
    return out


def _wav(rate, channels, *, leading_chunk=False):
    fmt = (
        b"fmt "
        + struct.pack("<I", 16)
        + struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2,
                      channels * 2, 16)
    )
    junk = b"JUNK" + struct.pack("<I", 3) + b"abc\x00" if leading_chunk else b""
    body = junk + fmt + b"data" + struct.pack("<I", 0)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_png_header():
    assert parse_media_header(_png(1920, 1080)) == (1920, 1080, "png")
    assert parse_media_header(_png(1, 1) + b"trailing-bytes") == (1, 1, "png")


def test_png_malformed():
    assert parse_media_header(PNG_SIG) == (0, 0, "unknown")  # truncated
    bad = PNG_SIG + struct.pack(">I", 13) + b"XXXX" + b"\x00" * 17
    assert parse_media_header(bad) == (0, 0, "unknown")  # IHDR not first


def test_jpeg_sof_after_app0():
    app0 = (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    assert parse_media_header(_jpeg(640, 480, extra_segments=(app0,))) == (
        640, 480, "jpeg",
    )


def test_jpeg_padding_and_progressive_sof2():
    # 0xFF padding bytes between segments must be skipped; SOF2
    # (progressive) carries dims like SOF0
    sof2 = (
        b"\xff\xc2" + struct.pack(">H", 11) + b"\x08"
        + struct.pack(">HH", 7, 9) + b"\x01\x01\x11\x00"
    )
    assert parse_media_header(b"\xff\xd8\xff" + sof2) == (9, 7, "jpeg")
    assert parse_media_header(_jpeg(3, 4, pad=True)) == (3, 4, "jpeg")


def test_jpeg_dht_is_not_a_frame_header():
    # C4 (DHT) must be walked over, not read as dimensions
    dht = b"\xff\xc4" + struct.pack(">H", 5) + b"\x00\x01\x02"
    assert parse_media_header(_jpeg(11, 22, extra_segments=(dht,))) == (
        11, 22, "jpeg",
    )


def test_jpeg_malformed():
    assert parse_media_header(b"\xff\xd8") == (0, 0, "unknown")  # no SOF
    assert parse_media_header(b"\xff\xd8\x00\x00\x00\x00") == (0, 0, "unknown")


def test_wav_fmt_chunk():
    assert parse_media_header(_wav(44100, 2)) == (44100, 2, "wav")
    # fmt need not be the first chunk
    assert parse_media_header(_wav(8000, 1, leading_chunk=True)) == (
        8000, 1, "wav",
    )


def test_wav_malformed():
    assert parse_media_header(b"RIFF\x00\x00\x00\x00WAVE") == (0, 0, "unknown")
    assert parse_media_header(b"RIFX1234WAVE") == (0, 0, "unknown")


def test_empty_and_unknown():
    assert parse_media_header(b"") == (0, 0, "empty")
    assert parse_media_header(b"plain text payload") == (0, 0, "unknown")


def test_synth_roundtrip_spark(spark, sf_dir):
    """synth_media headers parse back to exactly the values the mm01
    oracle recomputes from the columns (spot-checked here; the full
    DuckDB comparison runs in test_entry_contract)."""
    from grisp_spark.operators import multimodal
    from grisp_spark.sources.testdata import load_table

    docs = load_table(spark, sf_dir, "documents").limit(30)
    meta = {
        r.doc_id: (r.width, r.height, r.format)
        for r in multimodal.decode_metadata(multimodal.synth_media(docs)).collect()
    }
    for r in docs.select("doc_id", "n_chars").collect():
        kind = r.doc_id % 3
        if kind == 2:
            expect = ((r.doc_id % 48) * 1000 + 8000, r.n_chars % 8 + 1, "wav")
        else:
            expect = (
                r.doc_id % 1920 + 1,
                r.n_chars % 1080 + 1,
                "png" if kind == 0 else "jpeg",
            )
        assert meta[r.doc_id] == expect


# ---- property tests: random valid-header corpora (VERDICT r3 #7) ----

from hypothesis import given, settings, strategies as st  # noqa: E402

_dims = st.integers(min_value=1, max_value=0xFFFF)
_body = st.binary(max_size=64)


@settings(max_examples=200, deadline=None)
@given(w=st.integers(1, 2**32 - 1), h=st.integers(1, 2**32 - 1), body=_body)
def test_prop_png_roundtrip(w, h, body):
    assert parse_media_header(_png(w, h) + body) == (w, h, "png")


# non-frame segments a real camera JPEG carries before the SOF: APPn
# (E0-EF), COM (FE), DQT (DB), DHT (C4 — crucially NOT a frame header)
_seg_marker = st.sampled_from(
    [bytes([0xFF, m]) for m in (*range(0xE0, 0xF0), 0xFE, 0xDB, 0xC4)]
)


@st.composite
def _jpeg_segments(draw):
    segs = []
    for _ in range(draw(st.integers(0, 4))):
        payload = draw(st.binary(max_size=32))
        segs.append(
            draw(_seg_marker) + struct.pack(">H", len(payload) + 2) + payload
        )
    return tuple(segs)


@settings(max_examples=200, deadline=None)
@given(w=_dims, h=_dims, segs=_jpeg_segments(), pad=st.booleans(), body=_body)
def test_prop_jpeg_roundtrip(w, h, segs, pad, body):
    payload = _jpeg(w, h, pad=pad, extra_segments=segs) + body
    assert parse_media_header(payload) == (w, h, "jpeg")


@st.composite
def _wav_chunks(draw):
    chunks = b""
    for _ in range(draw(st.integers(0, 3))):
        cid = draw(
            st.binary(min_size=4, max_size=4).filter(lambda c: c != b"fmt ")
        )
        payload = draw(st.binary(max_size=16))
        chunks += cid + struct.pack("<I", len(payload)) + payload
        if len(payload) & 1:
            chunks += b"\x00"  # word alignment
    return chunks


@settings(max_examples=200, deadline=None)
@given(
    rate=st.integers(1, 2**31 - 1),
    channels=st.integers(1, 0xFFFF),
    pre=_wav_chunks(),
    body=_body,
)
def test_prop_wav_roundtrip(rate, channels, pre, body):
    fmt = (
        b"fmt "
        + struct.pack("<I", 16)
        + struct.pack(
            "<HHIIHH", 1, channels, rate,
            (rate * channels * 2) % 2**32, (channels * 2) % 2**16, 16,
        )
    )
    inner = pre + fmt + b"data" + struct.pack("<I", len(body)) + body
    payload = b"RIFF" + struct.pack("<I", (4 + len(inner)) % 2**32) + b"WAVE" + inner
    assert parse_media_header(payload) == (rate, channels, "wav")


@settings(max_examples=300, deadline=None)
@given(garbage=st.binary(max_size=256))
def test_prop_never_raises(garbage):
    """Total function over arbitrary bytes: a corrupt blob at 100 TB
    must classify, never kill the stage."""
    w, h, fmt = parse_media_header(garbage)
    assert fmt in ("png", "jpeg", "wav", "empty", "unknown")
    assert w >= 0 and h >= 0


# ---- real PNG pixel codec (VERDICT r5 #7): encode → decode ----------

import numpy as np  # noqa: E402

from grisp_spark.operators.multimodal import (  # noqa: E402
    _png_pixels,
    png_decode,
    png_encode,
)


@settings(max_examples=100, deadline=None)
@given(
    w=st.integers(1, 48),
    h=st.integers(1, 32),
    seed=st.integers(0, 2**31 - 1),
)
def test_prop_png_pixel_roundtrip(w, h, seed):
    """png_encode (all five scanline filters, real CRCs) must invert
    through png_decode's zlib + per-row unfilter exactly — arbitrary
    pixel content, not just the synth formula."""
    px = (
        np.random.default_rng(seed)
        .integers(0, 256, size=(h, w))
        .astype(np.uint8)
    )
    out = png_decode(png_encode(px))
    assert out is not None and out.shape == (h, w) and (out == px).all()


def test_png_pixel_filters_all_exercised():
    """h ≥ 5 cycles filter types 0-4; a decoder missing any unfilter
    branch cannot reproduce the matrix. Also: the encoded stream is a
    header-parser-valid PNG (shared schema with the header path)."""
    px = _png_pixels(123, 48, 17)
    b = png_encode(px)
    assert parse_media_header(b) == (48, 17, "png")
    assert (png_decode(b) == px).all()


@settings(max_examples=150, deadline=None)
@given(garbage=st.binary(max_size=200))
def test_prop_png_decode_never_raises(garbage):
    out = png_decode(garbage)
    assert out is None or out.dtype == np.uint8


def test_png_decode_truncation_robust():
    b = png_encode(_png_pixels(5, 10, 10))
    # cuts through the signature, IHDR, and mid-IDAT must all yield
    # None; a cut that only loses IEND still decodes (the full IDAT
    # stream is present — same behavior as a streaming decoder)
    for cut in (0, 7, 8, 20, 33, 60):
        assert png_decode(b[:cut]) is None
    assert (png_decode(b[: len(b) - 5]) == _png_pixels(5, 10, 10)).all()
    # bit-flip inside IDAT → zlib error or stride mismatch, never raise
    mut = bytearray(b)
    mut[45] ^= 0xFF
    out = png_decode(bytes(mut))
    assert out is None or out.shape == (10, 10)


# ---- real-pixel feature kernel (mm03) --------------------------------


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 48),
    h=st.integers(1, 32),
    seed=st.integers(0, 2**31 - 1),
)
def test_prop_feature_math_matches_bruteforce(w, h, seed):
    """The mm03 feature definitions (8-bin intensity histogram,
    |Δ| gradient energies) checked against an index-loop brute force
    on arbitrary pixel content routed through the real PNG codec —
    the same math the DuckDB oracle replays from the closed form."""
    px = (
        np.random.default_rng(seed)
        .integers(0, 256, size=(h, w))
        .astype(np.uint8)
    )
    v = png_decode(png_encode(px)).astype(np.int64)
    hist = np.bincount((v // 32).ravel(), minlength=8)
    grad_h = int(np.abs(np.diff(v, axis=1)).sum())
    grad_v = int(np.abs(np.diff(v, axis=0)).sum())
    exp_hist = [0] * 8
    exp_gh = exp_gv = 0
    for y in range(h):
        for x in range(w):
            exp_hist[int(px[y, x]) // 32] += 1
            if x:
                exp_gh += abs(int(px[y, x]) - int(px[y, x - 1]))
            if y:
                exp_gv += abs(int(px[y, x]) - int(px[y - 1, x]))
    assert list(hist) == exp_hist
    assert (grad_h, grad_v) == (exp_gh, exp_gv)


# ---- real-JPEG pixel path (mm05) -------------------------------------

from grisp_spark.operators.multimodal import (  # noqa: E402
    _jpeg_qtable,
    jpeg_decode,
    jpeg_encode_blocks,
)


def _ref_idct(coef):
    # independent IDCT straight off the T.81 formula (quadruple cos
    # loop) — shares nothing with the decoder's basis-matrix product
    out = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu * cv * coef[u, v]
                        * np.cos((2 * y + 1) * u * np.pi / 16)
                        * np.cos((2 * x + 1) * v * np.pi / 16)
                    )
            out[y, x] = s / 4
    return out


def test_jpeg_dc_only_exact():
    """The mm05 fixture profile: DC-only blocks under q00=8 decode to
    EXACTLY DC+128 on every pixel of the block — the integer identity
    the DuckDB oracle relies on. Also header-parser-valid (shared
    schema with the mm01 path)."""
    rng = np.random.default_rng(7)
    for bw, bh in [(1, 1), (3, 2), (6, 4)]:
        dc = rng.integers(-100, 101, size=(bh, bw))
        coefs = np.zeros((bh, bw, 8, 8), dtype=np.int64)
        coefs[:, :, 0, 0] = dc
        b = jpeg_encode_blocks(coefs, _jpeg_qtable())
        assert parse_media_header(b) == (bw * 8, bh * 8, "jpeg")
        px = jpeg_decode(b)
        exp = np.repeat(np.repeat(dc + 128, 8, axis=0), 8, axis=1)
        assert px is not None and (px == exp).all()


@settings(max_examples=40, deadline=None)
@given(
    bw=st.integers(1, 4),
    bh=st.integers(1, 4),
    seed=st.integers(0, 2**31 - 1),
    dri=st.sampled_from([0, 1, 2, 5]),
)
def test_prop_jpeg_ac_roundtrip(bw, bh, seed, dri):
    """General baseline coding — random quantized AC coefficients
    (run-lengths, ZRL, EOB), random quant tables, restart intervals —
    must decode to within half an output step of an INDEPENDENT
    cos-formula IDCT (the decoder rounds a float64 whose true value
    sits within 1e-9, so pixels are pinned up to a genuine 0.5
    boundary that random integer coefficients never hit)."""
    rng = np.random.default_rng(seed)
    qt = rng.integers(1, 33, size=(8, 8))
    coefs = rng.integers(-30, 31, size=(bh, bw, 8, 8))
    coefs = np.where(rng.random(size=coefs.shape) < 0.8, 0, coefs)
    px = jpeg_decode(jpeg_encode_blocks(coefs, qt, restart_interval=dri))
    assert px is not None and px.shape == (bh * 8, bw * 8)
    for by in range(bh):
        for bx in range(bw):
            ref = np.clip(
                _ref_idct((coefs[by, bx] * qt).astype(float)) + 128, 0, 255
            )
            got = px[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8].astype(float)
            assert (np.abs(got - ref) <= 0.5 + 1e-6).all()


@settings(max_examples=150, deadline=None)
@given(garbage=st.binary(max_size=200))
def test_prop_jpeg_decode_never_raises(garbage):
    out = jpeg_decode(garbage)
    assert out is None or out.dtype == np.uint8


def test_jpeg_decode_truncation_and_mutation_robust():
    coefs = np.zeros((2, 3, 8, 8), dtype=np.int64)
    coefs[:, :, 0, 0] = 50
    b = jpeg_encode_blocks(coefs, _jpeg_qtable())
    for cut in (0, 1, 2, 10, 30, 80, len(b) - 4):
        out = jpeg_decode(b[:cut])
        assert out is None or out.shape == (16, 24)
    # corrupt the entropy segment: decode must fail cleanly or stay
    # in-shape, never raise
    for i in range(len(b) - 12, len(b) - 2):
        mut = bytearray(b)
        mut[i] ^= 0x55
        out = jpeg_decode(bytes(mut))
        assert out is None or out.shape == (16, 24)


def test_jpeg_progressive_and_multicomponent_rejected():
    """The decoder is BASELINE sequential grayscale: progressive SOF2
    and multi-component SOF0 streams return None (clean skip at
    scale), they don't mis-decode."""
    coefs = np.zeros((1, 1, 8, 8), dtype=np.int64)
    b = jpeg_encode_blocks(coefs, _jpeg_qtable())
    prog = b.replace(b"\xff\xc0", b"\xff\xc2", 1)
    assert jpeg_decode(prog) is None
    # patch the SOF component count byte (1 -> 3)
    i = b.index(b"\xff\xc0")
    mut = bytearray(b)
    assert mut[i + 9] == 1  # Nf
    mut[i + 9] = 3
    assert jpeg_decode(bytes(mut)) is None


def test_jpeg_zero_and_hostile_dims_rejected():
    """Review finding (r7): a SOF0 declaring height=0/width=0 used to
    decode to a (0, 0) array — jpeg_pixel_stats only skips None, so
    the empty array killed the whole mapInPandas stage on `gy[-1]`.
    Hostile dims (65535x65535 from a 200-byte blob) would allocate
    ~4 GB of block planes before any entropy validation. Both must
    return None (blob skipped, stage lives)."""
    coefs = np.zeros((1, 1, 8, 8), dtype=np.int64)
    coefs[0, 0, 0, 0] = 10
    b = jpeg_encode_blocks(coefs, _jpeg_qtable())
    i = b.index(b"\xff\xc0")
    for h, w in ((0, 8), (8, 0), (0, 0), (65535, 65535)):
        mut = bytearray(b)
        mut[i + 5 : i + 9] = struct.pack(">HH", h, w)
        assert jpeg_decode(bytes(mut)) is None, (h, w)
    # and the original still round-trips after the guard
    assert jpeg_decode(b).shape == (8, 8)


def test_jpeg_encode_rejects_out_of_baseline_coefficients():
    """Review finding (r7): baseline Huffman categories cap |DC diff|
    at 2047 and |AC| at 1023 — values beyond that used to die with a
    bare KeyError inside the table lookup. They must raise ValueError
    with context instead."""
    import pytest

    qt = _jpeg_qtable()
    dc_hot = np.zeros((1, 1, 8, 8), dtype=np.int64)
    dc_hot[0, 0, 0, 0] = 3000  # DC-diff category 12
    with pytest.raises(ValueError, match="DC diff"):
        jpeg_encode_blocks(dc_hot, qt)
    ac_hot = np.zeros((1, 1, 8, 8), dtype=np.int64)
    ac_hot[0, 0, 0, 1] = 2000  # AC size 11
    with pytest.raises(ValueError, match="AC coefficient"):
        jpeg_encode_blocks(ac_hot, qt)
    # boundary values stay encodable and round-trip
    ok = np.zeros((1, 1, 8, 8), dtype=np.int64)
    ok[0, 0, 0, 0] = 2047
    ok[0, 0, 0, 1] = 1023
    ok[0, 0, 1, 0] = -1023
    assert jpeg_decode(jpeg_encode_blocks(ok, qt)) is not None


def test_jpeg_standalone_marker_rejected():
    # ADVICE r7: TEM (0x01) and stray RSTn/EOI before SOS carry no
    # length field — a walk that reads one as length-prefixed would
    # mis-parse a hostile stream into a plausible wrong answer; the
    # decoder must reject cleanly instead
    base = jpeg_encode_blocks(np.zeros((1, 1, 8, 8)), [8] + [255] * 63)
    assert jpeg_decode(base) is not None
    for marker in (0x01, 0xD0, 0xD7, 0xD9):
        hostile = base[:2] + bytes([0xFF, marker]) + base[2:]
        assert jpeg_decode(hostile) is None, hex(marker)


def test_jpeg_zrl_overrun_rejected():
    # a ZRL that pushes the coefficient index to/past 63 cannot be
    # followed by any valid coefficient — the decoder must reject the
    # blob instead of silently desyncing into the next block's DC.
    # Build a valid 1-block stream, then splice hostile entropy data:
    # DC size 0 (code from the std table), then four ZRLs (4x16 = 64).
    qt = [8] + [255] * 63
    coefs = np.zeros((1, 1, 8, 8))
    coefs[0, 0, 7, 7] = 1  # force AC table emission with full codes
    base = jpeg_encode_blocks(coefs, qt)
    assert jpeg_decode(base) is not None
    sos = base.rfind(b"\xff\xda")
    head = base[: sos + 14]  # SOS header is 14 bytes incl. marker
    # std luminance tables: DC cat 0 = '00' (2 bits); AC ZRL = 11 bits
    # '11111111001'; pad with 1s to byte-align, then EOI
    bits = "00" + "11111111001" * 4
    bits += "1" * ((8 - len(bits) % 8) % 8)
    payload = bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))
    # byte-stuff any 0xFF in entropy data
    payload = payload.replace(b"\xff", b"\xff\x00")
    hostile = head + payload + b"\xff\xd9"
    assert jpeg_decode(hostile) is None
