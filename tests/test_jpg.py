"""Lossy sequential JPEG decoder verification (data/jpg.py).

Unlike JPEG-LS, a genuine independent oracle exists in-image: cv2's
libjpeg build ENCODES the fixtures and independently DECODES them, and
our decoder shares no code with either direction. T.81 permits small
decoder-accuracy differences (libjpeg uses an integer IDCT; ours is the
exact float DCT-III), so natural-image parity is bounded at max |diff|
<= 2 codes, while DC-only blocks (where every conformant IDCT is exact)
are pinned bit-identically — including a self-written minimal 12-bit
SOF1 stream for the .51 path, which cv2 cannot emit.

DICOM wiring: 1.2.840.10008.1.2.4.50/.51 end-to-end through
dcmwrite_minimal (cv2-encoded pixels) / dcmread (our decoder), with a
lossy RMSE bound vs the source.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from cadx_tpu.data import dicom
from cadx_tpu.data.jpg import (JpegError, _IDCT_C, _ZIGZAG,
                               jpeg_lossy_decode)


@pytest.fixture
def rng():
    return np.random.default_rng(77)


def _natural(rng, h=120, w=90):
    base = 130 + 60 * (np.sin(np.linspace(0, 7, h))[:, None]
                       * np.cos(np.linspace(0, 5, w))[None, :])
    return np.clip(base + rng.normal(0, 10, (h, w)), 0, 255).astype(np.uint8)


def _enc(img, q=90, rst=0):
    flags = [cv2.IMWRITE_JPEG_QUALITY, q]
    if rst:
        flags += [cv2.IMWRITE_JPEG_RST_INTERVAL, rst]
    ok, buf = cv2.imencode(".jpg", img, flags)
    assert ok
    return bytes(buf)


def test_matches_libjpeg_within_idct_tolerance(rng):
    img = _natural(rng)
    for q in (95, 80, 50, 20):
        buf = _enc(img, q)
        ours, p = jpeg_lossy_decode(buf)
        assert p == 8 and ours.dtype == np.uint8
        ref = cv2.imdecode(np.frombuffer(buf, np.uint8),
                           cv2.IMREAD_GRAYSCALE)
        diff = np.abs(ours.astype(int) - ref.astype(int))
        assert diff.max() <= 2, (q, diff.max())
        assert np.sqrt((diff ** 2).mean()) < 0.5


def test_odd_sizes_and_restart_markers(rng):
    img = _natural(rng)[:101, :67]
    ours, _ = jpeg_lossy_decode(_enc(img))
    assert ours.shape == (101, 67)
    ref = cv2.imdecode(np.frombuffer(_enc(img), np.uint8),
                       cv2.IMREAD_GRAYSCALE)
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 2
    full = _natural(rng)
    buf = _enc(full, 85, rst=2)
    assert b"\xff\xdd" in buf  # DRI actually present
    ours, _ = jpeg_lossy_decode(buf)
    ref = cv2.imdecode(np.frombuffer(buf, np.uint8), cv2.IMREAD_GRAYSCALE)
    assert np.abs(ours.astype(int) - ref.astype(int)).max() <= 2


def _minimal_sof1_12bit(dc_values, bw, bh, quant_dc=4):
    """Hand-assembled 12-bit SOF1 stream of DC-only blocks: each 8x8
    block decodes to the constant round(dc*quant/8 + 2048) — exact for
    every conformant IDCT. Huffman tables: DC categories 0..15 as
    4-bit-prefixed canonical codes; AC table with just EOB."""
    import struct

    out = bytearray(b"\xff\xd8")
    q = np.ones(64, np.int32)
    q[0] = quant_dc
    out += b"\xff\xdb" + struct.pack(">H", 2 + 1 + 128) + b"\x10"
    out += b"".join(struct.pack(">H", v) for v in q)
    # DC table 0: 16 symbols (categories 0..15), lengths 4..? canonical:
    # use BITS = 15 codes of length 4..18 is invalid; simplest legal:
    # one code per length 1..16 for categories 0..15
    bits = [1] * 16
    vals = bytes(range(16))
    out += b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + 16) + b"\x00"
    out += bytes(bits) + vals
    # AC table 0: single symbol 0x00 (EOB) with a 1-bit code
    out += b"\xff\xc4" + struct.pack(">H", 2 + 1 + 16 + 1) + b"\x10"
    out += bytes([1] + [0] * 15) + b"\x00"
    h, w = bh * 8, bw * 8
    out += b"\xff\xc1" + struct.pack(">HBHHB", 11, 12, h, w, 1)
    out += bytes([1, 0x11, 0])
    out += b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 0, 63, 0])

    # entropy data: per block, DC category code + magnitude bits + EOB
    acc, nbits = 0, 0
    data = bytearray()

    def put(v, n):
        nonlocal acc, nbits
        for s in range(n - 1, -1, -1):
            acc = (acc << 1) | ((v >> s) & 1)
            nbits += 1
            if nbits == 8:
                data.append(acc)
                if acc == 0xFF:
                    data.append(0x00)
                acc, nbits = 0, 0

    pred = 0
    for dc in dc_values:
        diff = dc - pred
        pred = dc
        t = int(abs(diff)).bit_length()
        # category t has the canonical code of length t+1: 0b111...10
        put((1 << (t + 1)) - 2, t + 1)
        if t:
            put(diff if diff >= 0 else diff + (1 << t) - 1, t)
        put(0, 1)  # EOB (1-bit code 0)
    if nbits:
        put(0xFF, 8 - nbits)  # pad
    out += data + b"\xff\xd9"
    return bytes(out)


def test_12bit_sof1_dc_only_exact():
    """.51-path: 12-bit SOF1 decodes, and DC-only blocks are exact."""
    rng = np.random.default_rng(3)
    bw = bh = 3
    dcs = rng.integers(-1000, 1000, bw * bh).tolist()
    stream = _minimal_sof1_12bit(dcs, bw, bh, quant_dc=4)
    img, p = jpeg_lossy_decode(stream)
    assert p == 12 and img.dtype == np.uint16 and img.shape == (24, 24)
    blocks = img.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 64)
    expect = np.clip(np.rint(np.asarray(dcs) * 4 / 8 + 2048), 0, 4095)
    assert (blocks == expect[:, None].astype(np.uint16)).all()


def test_idct_basis_is_orthonormal():
    assert np.allclose(_IDCT_C @ _IDCT_C.T, np.eye(8), atol=1e-12)
    assert sorted(_ZIGZAG.tolist()) == list(range(64))


def test_error_paths(rng):
    buf = _enc(_natural(rng))
    with pytest.raises(JpegError, match="SOI"):
        jpeg_lossy_decode(b"\x00\x01")
    with pytest.raises(JpegError):
        jpeg_lossy_decode(buf[:len(buf) // 3])
    # color JPEG (3 components) must raise the named error
    rgb = np.dstack([_natural(rng)] * 3)
    ok, cbuf = cv2.imencode(".jpg", rgb)
    with pytest.raises(JpegError, match="multi-component"):
        jpeg_lossy_decode(bytes(cbuf))
    # progressive must be rejected by SOF kind
    ok, pbuf = cv2.imencode(".jpg", _natural(rng),
                            [cv2.IMWRITE_JPEG_PROGRESSIVE, 1])
    if ok:
        with pytest.raises(JpegError):
            jpeg_lossy_decode(bytes(pbuf))


def test_hostile_header_guards(rng):
    """Decode-size DoS bound + truncated-segment errors stay JpegError
    (never raw IndexError/struct.error/MemoryError)."""
    buf = bytearray(_enc(_natural(rng)))
    sof = buf.find(b"\xff\xc0")
    assert sof >= 0
    # forge 65535x65535 dims: ~4.3G px would allocate ~17GB of
    # coefficient planes without the 1<<28 bound
    hostile = bytes(buf[:sof + 5]) + b"\xff\xff\xff\xff" + bytes(buf[sof + 9:])
    with pytest.raises(JpegError, match="implausible"):
        jpeg_lossy_decode(hostile)
    # truncation at every prefix length must raise JpegError only
    base = bytes(buf)
    for cut in range(2, min(len(base), 220)):
        with pytest.raises(JpegError):
            jpeg_lossy_decode(base[:cut])
    # single-byte mutations over the header region: JpegError or a
    # successful decode, nothing else (mirrors the DICOM-level fuzz)
    rnd = np.random.RandomState(7)
    scan_start = base.find(b"\xff\xda")
    for _ in range(300):
        i = int(rnd.randint(2, max(scan_start + 12, 16)))
        m = bytearray(base)
        m[i] ^= 1 << int(rnd.randint(8))
        try:
            jpeg_lossy_decode(bytes(m))
        except JpegError:
            pass


def test_dicom_jpeg_baseline_roundtrip(tmp_path, rng):
    img = _natural(rng, 96, 80)
    p = str(tmp_path / "jpg.dcm")
    dicom.dcmwrite_minimal(p, img, patient_id="P1",
                           transfer_syntax=dicom.TS_JPEG_BASELINE)
    ds = dicom.dcmread(p)
    assert ds.transfer_syntax == dicom.TS_JPEG_BASELINE
    out = ds.pixel_array
    assert out.shape == img.shape and out.dtype == np.uint8
    err = out.astype(float) - img.astype(float)
    assert np.sqrt((err ** 2).mean()) < 6.0  # lossy q=92 bound


def test_dicom_extended_12bit_via_patched_ts(tmp_path):
    """.51: hand-built 12-bit stream wrapped in an encapsulated DICOM."""
    from cadx_tpu.data import codecs

    stream = _minimal_sof1_12bit([100, -200, 300, 0], 2, 2)
    img, _ = jpeg_lossy_decode(stream)
    p = str(tmp_path / "ext.dcm")
    # write an RLE file for the framing, then replace PixelData + TS
    dicom.dcmwrite_minimal(p, img, transfer_syntax=dicom.TS_RLE)
    blob = open(p, "rb").read()
    uid_new = dicom.TS_JPEG_EXTENDED.encode()
    if len(uid_new) % 2:
        uid_new += b"\x00"
    at = blob.index(b"\x02\x00\x10\x00UI")
    (old_len,) = np.frombuffer(blob[at + 6:at + 8], "<u2")
    glen_at = blob.index(b"\x02\x00\x00\x00UL")
    (glen,) = np.frombuffer(blob[glen_at + 8:glen_at + 12], "<u4")
    delta = len(uid_new) - int(old_len)
    patched = (blob[:glen_at + 8] + np.uint32(glen + delta).tobytes()
               + blob[glen_at + 12:at + 6]
               + np.uint16(len(uid_new)).tobytes() + uid_new
               + blob[at + 8 + old_len:])
    # swap the encapsulated payload for the JPEG stream
    pd_at = patched.index(b"\xe0\x7f\x10\x00OB")
    encap = codecs.encapsulate([stream])
    patched = (patched[:pd_at + 8]
               + (0xFFFFFFFF).to_bytes(4, "little") + encap)
    p2 = str(tmp_path / "ext12.dcm")
    open(p2, "wb").write(patched)
    ds = dicom.dcmread(p2)
    assert ds.transfer_syntax == dicom.TS_JPEG_EXTENDED
    np.testing.assert_array_equal(ds.pixel_array, img)
