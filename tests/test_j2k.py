"""JPEG 2000 decoder verification (data/j2k.py).

The decoder is self-written (T.800); correctness is pinned two
independent ways:
1. bit-identity against OpenCV's OpenJPEG build (cv2 encodes, we decode
   — encoder and decoder share no code),
2. a forward-5/3 DWT oracle written here: every decoded subband plane
   must equal the forward transform of the level-shifted image, which
   isolates tier-1/tier-2 (entropy decoding) from the wavelet stage.

DICOM wiring (1.2.840.10008.1.2.4.90/.91) is tested end-to-end through
dcmwrite_minimal/dcmread, incl. multi-frame; unknown compressed
syntaxes must raise a DicomError naming the transfer syntax (round-3
verdict #6; JPEG-LS graduated to a real codec in round 4, lossy JPEG
too, and HTJ2K in round 5 — data/jls.py, data/jpg.py, data/htj2k.py).
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from cadx_tpu.data import dicom
from cadx_tpu.data.codecs import CodecError
from cadx_tpu.data.j2k import _Decoder, _unwrap_jp2, j2k_decode


def _enc(img, q=1000):
    ok, buf = cv2.imencode(".jp2", img,
                           [cv2.IMWRITE_JPEG2000_COMPRESSION_X1000, q])
    assert ok
    return bytes(buf)


def _fdwt53_1d(x, axis):
    x = np.moveaxis(x, axis, 0).astype(np.int64)
    n = x.shape[0]
    if n == 1:
        return np.moveaxis(x, 0, axis), np.moveaxis(x[:0], 0, axis)

    def ext(i):
        period = 2 * (n - 1)
        i = np.abs(i) % period
        return np.where(i >= n, period - i, i)

    odd, even = np.arange(1, n, 2), np.arange(0, n, 2)
    y = x.copy()
    y[odd] = x[odd] - ((x[ext(odd - 1)] + x[ext(odd + 1)]) >> 1)
    y[even] = x[even] + ((y[ext(even - 1)] + y[ext(even + 1)] + 2) >> 2)
    return np.moveaxis(y[0::2], 0, axis), np.moveaxis(y[1::2], 0, axis)


def _fdwt2(img, levels):
    """Forward reversible 5/3, vertical-then-horizontal per level, with
    T.800 band naming (HL = horizontally high-pass)."""
    bands = {}
    cur = img.astype(np.int64)
    for r in range(levels, 0, -1):
        lv, hv = _fdwt53_1d(cur, 0)
        ll, hl = _fdwt53_1d(lv, 1)
        lh, hh = _fdwt53_1d(hv, 1)
        bands[(r, "HL")] = hl
        bands[(r, "LH")] = lh
        bands[(r, "HH")] = hh
        cur = ll
    bands[(0, "LL")] = cur
    return bands


LOSSLESS_CASES = [
    ("u8_random", lambda rng: rng.integers(0, 256, (32, 32)).astype(np.uint8)),
    ("u8_const", lambda rng: np.full((40, 40), 137, np.uint8)),
    ("u16_12bit", lambda rng: rng.integers(0, 4096, (64, 48)).astype(np.uint16)),
    ("u16_full", lambda rng: rng.integers(0, 65536, (40, 56)).astype(np.uint16)),
    ("odd_shape", lambda rng: rng.integers(0, 4096, (37, 51)).astype(np.uint16)),
    ("tall", lambda rng: rng.integers(0, 4096, (129, 33)).astype(np.uint16)),
    ("mammo_like", lambda rng: rng.normal(2000, 300, (128, 96))
     .clip(0, 4095).astype(np.uint16)),
    ("big16", lambda rng: rng.integers(0, 65536, (256, 192)).astype(np.uint16)),
]


@pytest.mark.parametrize("name,make", LOSSLESS_CASES,
                         ids=[c[0] for c in LOSSLESS_CASES])
def test_lossless_bit_identity_vs_openjpeg(name, make, rng):
    img = make(rng)
    out = j2k_decode(_enc(img))
    assert out.dtype == img.dtype
    np.testing.assert_array_equal(out, img)


def test_lossless_rgb_with_rct(rng):
    """3-component with the reversible color transform: bit-exact; the
    decoder returns components in (R, G, B) order (cv2 encodes BGR)."""
    bgr = rng.integers(0, 256, (40, 44, 3)).astype(np.uint8)
    out = j2k_decode(_enc(bgr))
    np.testing.assert_array_equal(out, bgr[..., ::-1])


def test_subbands_match_forward_dwt_oracle(rng):
    """Entropy decoding isolated from the wavelet: decoded subband
    coefficients == an independently-written forward 5/3 of the image."""
    img = rng.integers(0, 4096, (64, 64)).astype(np.uint16)
    dec = _Decoder(_unwrap_jp2(_enc(img)))
    out = dec.decode()
    np.testing.assert_array_equal(out, img)
    exp = _fdwt2(img.astype(np.int64) - (1 << 15), 5)
    assert dec.last_band_planes, "debug hook not populated"
    for (r, kind), (_band, plane) in dec.last_band_planes.items():
        np.testing.assert_array_equal(
            plane, exp[(r, kind)], err_msg=f"subband {(r, kind)}")


def test_lossy_97_reconstruction_quality(rng):
    """Irreversible 9/7 path: our reconstruction must be within ~15% RMSE
    of OpenJPEG's own decode of the same stream (the spec allows any
    in-interval reconstruction, so bit-identity is not required)."""
    img = rng.normal(2000, 300, (128, 96)).clip(0, 4095).astype(np.uint16)
    stream = _enc(img, q=500)
    ref = cv2.imdecode(np.frombuffer(stream, np.uint8), cv2.IMREAD_UNCHANGED)
    out = j2k_decode(stream)
    rmse_ours = np.sqrt(((out.astype(float) - img) ** 2).mean())
    rmse_cv = np.sqrt(((ref.astype(float) - img) ** 2).mean())
    assert rmse_ours < max(rmse_cv * 1.3, rmse_cv + 1.0), (rmse_ours, rmse_cv)


def test_malformed_streams_raise_codec_error():
    with pytest.raises(CodecError):
        j2k_decode(b"\x00\x01\x02\x03" * 10)
    with pytest.raises(CodecError):
        j2k_decode(b"\xff\x4f\xff\x51\x00\x05\x00")  # truncated SIZ
    good = _enc(np.zeros((32, 32), np.uint8))
    raw = bytearray(_unwrap_jp2(good))
    with pytest.raises(CodecError):
        j2k_decode(bytes(raw[: len(raw) // 3]))  # truncated mid-stream


def test_dicom_j2k_roundtrip(tmp_path, rng):
    img = rng.integers(0, 4096, (61, 47)).astype(np.uint16)
    p = str(tmp_path / "j2k.dcm")
    dicom.dcmwrite_minimal(p, img, transfer_syntax=dicom.TS_J2K_LOSSLESS)
    ds = dicom.dcmread(p)
    assert ds.transfer_syntax == dicom.TS_J2K_LOSSLESS
    np.testing.assert_array_equal(ds.pixel_array, img)


def test_dicom_j2k_multiframe(tmp_path, rng):
    frames = rng.integers(0, 4096, (3, 32, 40)).astype(np.uint16)
    p = str(tmp_path / "j2k_mf.dcm")
    dicom.dcmwrite_minimal(p, frames, transfer_syntax=dicom.TS_J2K)
    ds = dicom.dcmread(p)
    arr = ds.pixel_array
    assert arr.shape == (3, 32, 40)
    np.testing.assert_array_equal(arr, frames)


def test_corrupt_siz_fails_fast(rng):
    """Round-4 fuzz findings: a corrupt SIZ header must fail with
    CodecError BEFORE any image-sized allocation (a mutated Xsiz
    otherwise drove a 400GiB np.zeros -> MemoryError), and a SIZ that
    disagrees with the container's expected dims must fail up front."""
    img = rng.integers(0, 4096, (32, 32)).astype(np.uint16)
    stream = _unwrap_jp2(_enc(img))
    # codestream layout: SOC(2) SIZ-marker(2) Lsiz(2) Rsiz(2) Xsiz(4)...
    bad = bytearray(stream)
    bad[8:12] = (0x7FFF0000).to_bytes(4, "big")
    with pytest.raises(CodecError, match="SIZ|limits"):
        j2k_decode(bytes(bad))
    # decode-time DoS bound: a large-but-allocatable corrupt size (fuzz
    # case burned ~40s of full-plane float ops) must also fail up front
    bad = bytearray(stream)
    bad[8:12] = (4_194_344).to_bytes(4, "big")   # Xsiz -> ~200M px
    with pytest.raises(CodecError, match="limits"):
        j2k_decode(bytes(bad))
    # corrupt Ssiz bit depth > 32 would silently overflow the final cast
    bad = bytearray(stream)
    bad[42] = 37                                 # Ssiz: 38-bit unsigned
    with pytest.raises(CodecError, match="bit depth"):
        j2k_decode(bytes(bad))
    with pytest.raises(CodecError, match="expected"):
        j2k_decode(stream, expect_hw=(33, 32))
    # matching expectation still decodes
    assert j2k_decode(stream, expect_hw=(32, 32)).shape == (32, 32)


def test_unknown_syntaxes_raise_named_error(tmp_path, rng):
    """Unrecognized compressed transfer syntaxes must fail with a named
    DicomError, not a crash (verdict #6: no silent gap). HTJ2K
    (.201/.203) graduated to a real codec in round 5 — test_htj2k.py —
    so a retired/unknown UID stands in here. Build the file as
    explicit-LE then patch the meta TS UID."""
    img = rng.integers(0, 4096, (16, 16)).astype(np.uint16)
    base = str(tmp_path / "base.dcm")
    dicom.dcmwrite_minimal(base, img, transfer_syntax=dicom.TS_EXPLICIT_LE)
    blob = open(base, "rb").read()
    # locate the (0002,0010) UI element and re-frame it with the new UID
    key = b"\x02\x00\x10\x00UI"
    at = blob.index(key)
    (old_len,) = np.frombuffer(blob[at + 6:at + 8], "<u2")
    for uid in ["1.2.840.10008.1.2.4.52",    # retired JPEG extended 8/12
                "1.2.840.10008.1.2.4.96"]:   # fictional future syntax
        val = uid.encode()
        if len(val) % 2:
            val += b"\x00"
        delta = len(val) - int(old_len)
        # meta group length (0002,0000 UL, first element after DICM) must
        # track the re-framed size or the meta walk ends early
        glen_at = blob.index(b"\x02\x00\x00\x00UL")
        (glen,) = np.frombuffer(blob[glen_at + 8:glen_at + 12], "<u4")
        patched = (blob[:glen_at + 8]
                   + np.uint32(glen + delta).tobytes()
                   + blob[glen_at + 12:at + 6]
                   + np.uint16(len(val)).tobytes() + val
                   + blob[at + 8 + old_len:])
        p2 = str(tmp_path / f"ts_{uid.split('.')[-1]}.dcm")
        open(p2, "wb").write(patched)
        with pytest.raises(dicom.DicomError, match="transfer syntax"):
            dicom.dcmread(p2)


# ---------------------------------------------------------------------------
# Multi-layer codestreams (B.10.4 inclusion tag-tree thresholds)
# ---------------------------------------------------------------------------

class _MQEncoder:
    """Minimal T.88 MQ encoder for building test fixtures. Context init
    mirrors data/j2k.py::_MQDecoder (UNI=46, RL=3, sig0=4); the test
    round-trips its output through the module's decoder before use, so
    encoder and decoder cannot drift apart silently."""

    def __init__(self):
        from cadx_tpu.data.j2k import _CTX_RL, _CTX_UNI, _N_CTX

        self.idx = [0] * _N_CTX
        self.mps = [0] * _N_CTX
        self.idx[_CTX_UNI] = 46
        self.idx[_CTX_RL] = 3
        self.idx[0] = 4
        self.a = 0x8000
        self.c = 0
        self.ct = 12
        self.out = bytearray([0])  # sentinel byte (dropped at flush)

    def _byteout(self):
        if self.out[-1] == 0xFF:
            self.out.append((self.c >> 20) & 0xFF)
            self.c &= 0xFFFFF
            self.ct = 7
        elif self.c < 0x8000000:
            self.out.append((self.c >> 19) & 0xFF)
            self.c &= 0x7FFFF
            self.ct = 8
        else:
            self.out[-1] += 1
            if self.out[-1] == 0xFF:
                self.c &= 0x7FFFFFF
                self.out.append((self.c >> 20) & 0xFF)
                self.c &= 0xFFFFF
                self.ct = 7
            else:
                self.out.append((self.c >> 19) & 0xFF)
                self.c &= 0x7FFFF
                self.ct = 8

    def _renorm(self):
        # canonical T.88 order (byteout when CT hits 0 AFTER the shift):
        # deferring the byteout breaks FLUSH's <<CT alignment when a
        # renorm ends exactly at CT == 0
        while True:
            self.a = (self.a << 1) & 0xFFFF
            self.c <<= 1
            self.ct -= 1
            if self.ct == 0:
                self._byteout()
            if self.a & 0x8000:
                break

    def encode(self, d, cx):
        from cadx_tpu.data.j2k import _QE

        qe, nmps, nlps, switch = _QE[self.idx[cx]]
        self.a -= qe
        if d == self.mps[cx]:
            if self.a & 0x8000:
                self.c += qe
            else:
                if self.a < qe:
                    self.a = qe
                else:
                    self.c += qe
                self.idx[cx] = nmps
                self._renorm()
        else:
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            if switch:
                self.mps[cx] ^= 1
            self.idx[cx] = nlps
            self._renorm()

    def flush(self) -> bytes:
        # SETBITS, OpenJPEG form (the module decoder is the same
        # software variant): saturate the low bits inside [C, C+A)
        tempc = self.c + self.a
        self.c |= 0xFFFF
        if self.c >= tempc:
            self.c -= 0x8000
        self.c <<= self.ct
        self._byteout()
        self.c <<= self.ct
        self._byteout()
        body = bytes(self.out[1:])
        while body and body[-1] == 0xFF:
            body = body[:-1]  # discardable terminator
        return body


def _bitpack(bits):
    out = bytearray()
    for i in range(0, len(bits), 8):
        b = 0
        for j, bit in enumerate(bits[i:i + 8]):
            b |= bit << (7 - j)
        out.append(b)
    return bytes(out)


def _two_layer_stream(include_at_layer: int) -> bytes:
    """Hand-built 8x8 8-bit codestream: levels=0, one all-zero code
    block, 2 quality layers. include_at_layer=1 puts an empty packet in
    layer 0 and first-includes the block in layer 1 (inclusion tag-tree
    value 1, only decodable with the per-layer threshold of B.10.4);
    include_at_layer=0 is the value-0 control."""
    import struct as _s

    # cleanup-pass body: one significant sample at (0,0), +1 in the
    # single decoded bitplane (mb=9, zbp=8). Decision sequence derived
    # from D.4: stripe-0 col 0 interrupts its run (RL=1, 2 uniform bits
    # select row 0, sign ctx 9 positive), neighbours then code per-sample
    # significance zeros in ctx 3/0/0 (col 0) and 5/1/0/0 (col 1), the
    # remaining 6 + 8 columns are zero runs (RL=0)
    from cadx_tpu.data.j2k import _CTX_RL, _CTX_UNI, _MQDecoder

    decisions = ([(1, _CTX_RL), (0, _CTX_UNI), (0, _CTX_UNI), (0, 9),
                  (0, 3), (0, 0), (0, 0),
                  (0, 5), (0, 1), (0, 0), (0, 0)]
                 + [(0, _CTX_RL)] * 6 + [(0, _CTX_RL)] * 8)
    enc = _MQEncoder()
    for d, cx in decisions:
        enc.encode(d, cx)
    body = enc.flush()
    # self-check: the module's own MQ decoder must read the sequence back
    dec = _MQDecoder(body)
    assert [dec.decode(cx) for _, cx in decisions] == [d for d, _ in decisions]
    assert len(body) <= 7  # must fit the 3-bit first length field

    soc = b"\xff\x4f"
    siz = b"\xff\x51" + _s.pack(">HHIIIIIIIIH", 41, 0, 8, 8, 0, 0, 8, 8,
                                0, 0, 1) + bytes([7, 1, 1])
    # Scod=0, LRCP, 2 layers, no MCT, 0 levels, 64x64 blocks, style 0,
    # 5/3 reversible
    cod = b"\xff\x52" + _s.pack(">HBBHB", 12, 0, 0, 2, 0) + bytes(
        [0, 4, 4, 0, 1])
    # no quantization, 2 guard bits, LL exponent 8 -> mb = 2 + 8 - 1 = 9
    qcd = b"\xff\x5c" + _s.pack(">H", 4) + bytes([0x40, 8 << 3])

    full_bits = ([1]            # non-empty packet
                 + [0] * include_at_layer + [1]   # inclusion tag tree
                 + [0] * 8 + [1]                  # zbp tag tree: value 8
                 + [0]          # one coding pass
                 + [0])         # no lblock increase
    nbits = len(body)
    full_bits += [(nbits >> (2 - k)) & 1 for k in range(3)]  # 3-bit len
    full_pkt = _bitpack(full_bits) + body
    empty_pkt = b"\x00"
    if include_at_layer == 0:
        # layer 1: non-empty packet, already-included block contributes
        # no new passes (inclusion bit 0)
        packets = full_pkt + _bitpack([1, 0])
    else:
        packets = empty_pkt + full_pkt
    psot = 12 + 2 + len(packets)
    sot = b"\xff\x90" + _s.pack(">HHIBB", 10, 0, psot, 0, 1)
    return soc + siz + cod + qcd + sot + b"\xff\x93" + packets + b"\xff\xd9"


@pytest.mark.parametrize("layer", [0, 1])
def test_two_layer_first_inclusion(layer):
    """A block first included in quality layer 1 must decode: the
    inclusion tag tree is read with threshold layer+1 (T.800 B.10.4),
    so its value-1 coding consumes bits across the layer-0/layer-1
    packets. Before the round-4 fix the threshold was hardcoded to 1
    and any multi-layer stream with late first inclusion desynced."""
    from cadx_tpu.data.j2k import j2k_decode

    out = np.asarray(j2k_decode(_two_layer_stream(layer)))
    # one +1 coefficient at (0,0) over the unsigned level shift: losing
    # the layer-1 contribution (the pre-fix desync) flattens it to 128
    expect = np.full((8, 8), 128)
    expect[0, 0] = 129
    np.testing.assert_array_equal(out, expect)


def _split_passes_stream() -> bytes:
    """2-layer codestream where the block is included at layer 0 with 1
    pass (cleanup @ plane 1) and layer 1 carries 3 more passes (SPP/MRP/
    CUP @ plane 0) of the SAME MQ codeword — the bytes split mid-
    codeword across the two packets (B.10.7: no termination between
    passes, so tier-1 must concatenate the per-packet chunks)."""
    import struct as _s

    from cadx_tpu.data.j2k import _CTX_RL, _CTX_UNI, _MQDecoder

    # one coefficient at (0,0), magnitude 2 (significant at plane 1,
    # refinement bit 0 at plane 0), positive
    decisions = (
        # pass 0: cleanup @ bp 1 (same schedule as _two_layer_stream)
        [(1, _CTX_RL), (0, _CTX_UNI), (0, _CTX_UNI), (0, 9),
         (0, 3), (0, 0), (0, 0), (0, 5), (0, 1), (0, 0), (0, 0)]
        + [(0, _CTX_RL)] * 6 + [(0, _CTX_RL)] * 8
        # pass 1: SPP @ bp 0 — the three nonzero-context neighbours
        + [(0, 3), (0, 5), (0, 1)]
        # pass 2: MRP @ bp 0 — first refinement of (0,0), ctx 14
        + [(0, 14)]
        # pass 3: CUP @ bp 0 — cols 0/1 rows 2-3 per-sample (ctx 0),
        # cols 2-7 + stripe 1 zero runs
        + [(0, 0)] * 4 + [(0, _CTX_RL)] * 6 + [(0, _CTX_RL)] * 8)
    enc = _MQEncoder()
    for d, cx in decisions:
        enc.encode(d, cx)
    body = enc.flush()
    dec = _MQDecoder(body)
    assert [dec.decode(cx) for _, cx in decisions] == [d for d, _ in decisions]
    l0 = min(2, len(body))          # split the codeword mid-stream
    l1 = len(body) - l0
    assert l0 <= 7 and l1 <= 15     # 3-bit / 4-bit length fields

    soc = b"\xff\x4f"
    siz = b"\xff\x51" + _s.pack(">HHIIIIIIIIH", 41, 0, 8, 8, 0, 0, 8, 8,
                                0, 0, 1) + bytes([7, 1, 1])
    cod = b"\xff\x52" + _s.pack(">HBBHB", 12, 0, 0, 2, 0) + bytes(
        [0, 4, 4, 0, 1])
    qcd = b"\xff\x5c" + _s.pack(">H", 4) + bytes([0x40, 8 << 3])

    # layer 0: included (tag value 0), zbp 7 -> bp_start = 1, 1 pass
    bits0 = ([1, 1] + [0] * 7 + [1] + [0] + [0]
             + [(l0 >> (2 - k)) & 1 for k in range(3)])
    pkt0 = _bitpack(bits0) + body[:l0]
    # layer 1: included-again bit, 3 passes ("11"+2-bit 0), no lblock bump
    bits1 = ([1, 1] + [1, 1, 0, 0] + [0]
             + [(l1 >> (3 - k)) & 1 for k in range(4)])
    pkt1 = _bitpack(bits1) + body[l0:]
    packets = pkt0 + pkt1
    psot = 12 + 2 + len(packets)
    sot = b"\xff\x90" + _s.pack(">HHIBB", 10, 0, psot, 0, 1)
    return soc + siz + cod + qcd + sot + b"\xff\x93" + packets + b"\xff\xd9"


def test_two_layer_pass_continuation():
    """Passes split across quality layers concatenate into one MQ
    codeword (no termination between passes): layer 0 carries the first
    2 bytes, layer 1 the rest plus 3 more passes. Exercises the
    cb.included continuation bit, npass=3 coding, and tier-1 chunk
    concatenation across packets."""
    from cadx_tpu.data.j2k import j2k_decode

    out = np.asarray(j2k_decode(_split_passes_stream()))
    expect = np.full((8, 8), 128)
    expect[0, 0] = 130   # +2 coefficient over the level shift
    np.testing.assert_array_equal(out, expect)


def test_mq_encoder_roundtrip_property(rng):
    """The test-local MQ encoder round-trips random decision/context
    sequences through the module's MQ decoder (500 cases): the fixture
    builders above depend on this equivalence."""
    from cadx_tpu.data.j2k import _MQDecoder, _N_CTX

    for _ in range(500):
        n = int(rng.integers(1, 120))
        seq = [(int(rng.integers(2)), int(rng.integers(_N_CTX)))
               for _ in range(n)]
        enc = _MQEncoder()
        for d, cx in seq:
            enc.encode(d, cx)
        dec = _MQDecoder(enc.flush())
        assert [dec.decode(cx) for _, cx in seq] == [d for d, _ in seq]
