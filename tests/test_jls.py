"""JPEG-LS codec verification (data/jls.py).

No JPEG-LS oracle library exists in this image (charls / imagecodecs /
pydicom are absent by design), so — like the RLE and JPEG-lossless
codecs — the encoder and decoder are independently written from the two
directions of the T.87 spec and pinned against each other:

1. lossless round-trip batteries over 8/12/16-bit random, gradient,
   constant, sparse, and mammogram-like images (regular mode, run mode,
   run interruptions, bias correction, Golomb escapes all exercised),
2. the near-lossless contract |x - x'| <= NEAR,
3. a spec property checkable WITHOUT an oracle: the entropy-coded
   segment must contain no marker (a byte >= 0x80 after any 0xFF) —
   this is the FF bit-stuffing rule of T.87 A.1,
4. a golden-bytes regression pin (self-generated; guards the bitstream
   against silent drift, not absolute conformance),
5. error paths: truncation, garbage, multi-component, DNL,
6. DICOM wiring for 1.2.840.10008.1.2.4.80/.81 end-to-end through
   dcmwrite_minimal/dcmread, incl. multi-frame and the LSE preset path.

Reference parity target: the reference reads TCIA DICOMs via pydicom's
handler ecosystem (/root/reference/Classes/Preprocessing.py:149), which
decodes JPEG-LS; round-3 verdict item #6 named these the last fenced
ingest syntaxes.
"""

import numpy as np
import pytest

from cadx_tpu.data import dicom
from cadx_tpu.data.jls import JlsError, jls_decode, jls_encode


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def _cases(rng):
    ramp = np.add.outer(np.arange(80), np.arange(70))
    return [
        ("rand8", rng.integers(0, 256, (37, 53)).astype(np.uint8)),
        ("rand16", rng.integers(0, 65536, (41, 29)).astype(np.uint16)),
        ("rand12", rng.integers(0, 4096, (64, 48)).astype(np.uint16)),
        ("const", np.full((33, 47), 130, np.uint8)),
        ("zeros", np.zeros((16, 16), np.uint8)),
        ("grad", (ramp % 256).astype(np.uint8)),
        ("sparse", (rng.random((48, 48)) > 0.97).astype(np.uint8) * 255),
        ("tiny", np.array([[5]], np.uint8)),
        ("row", np.arange(256, dtype=np.uint8)[None, :]),
        ("col", np.arange(256, dtype=np.uint8)[:, None]),
        ("mammo", np.clip(rng.normal(900, 400, (96, 72)),
                          0, 4095).astype(np.uint16)),
        # piecewise-flat: long runs interrupted by edges (RItype 0 and 1)
        ("flat", np.repeat(rng.integers(0, 16, (8, 9)),
                           8, axis=0).repeat(8, axis=1)
                    .astype(np.uint8) * 17),
    ]


def test_lossless_roundtrip_battery(rng):
    for name, img in _cases(rng):
        natural = max(2, int(img.max()).bit_length())
        full = 8 if img.dtype == np.uint8 else 16
        for prec in {natural, full}:
            enc = jls_encode(img, precision=prec)
            dec, p = jls_decode(enc)
            assert p == prec
            assert dec.dtype == (np.uint8 if prec <= 8 else np.uint16)
            np.testing.assert_array_equal(dec, img, err_msg=f"{name}/{prec}")


def test_near_lossless_error_bound(rng):
    for near in (1, 2, 7):
        for name, img in _cases(rng):
            # full dtype precision: T.87 requires NEAR <= MAXVAL/2, which
            # the natural precision of near-constant images would violate
            prec = 8 if img.dtype == np.uint8 else 16
            enc = jls_encode(img, near=near, precision=prec)
            dec, _ = jls_decode(enc)
            err = np.abs(dec.astype(np.int64) - img.astype(np.int64)).max()
            assert err <= near, (name, near, err)


def test_compresses_structured_images(rng):
    """Sanity: LOCO-I must actually compress smooth/flat content (a
    broken context model would still round-trip, but at ~1x)."""
    ramp = (np.add.outer(np.arange(128), np.arange(128)) % 256)
    enc = jls_encode(ramp.astype(np.uint8))
    assert ramp.size / len(enc) > 4
    flat = np.full((128, 128), 200, np.uint8)
    assert flat.size / len(jls_encode(flat)) > 100


def test_scan_contains_no_marker_bytes(rng):
    """T.87 A.1 FF stuffing: after any 0xFF inside the entropy-coded
    segment the next byte must be < 0x80, so no marker can appear. This
    is a spec property verifiable without an oracle decoder."""
    for _, img in _cases(rng):
        enc = jls_encode(img)
        sos = enc.index(bytes([0xFF, 0xDA]))
        scan = enc[sos + 10:-2]  # SOS segment is 8 bytes + marker
        for i in range(len(scan) - 1):
            if scan[i] == 0xFF:
                assert scan[i + 1] < 0x80, f"marker byte at {i}"


def test_golden_bytes_pin():
    """Regression pin of the exact bitstream for a fixed input (self-
    generated at round 4; guards against silent codec drift)."""
    img = (np.add.outer(np.arange(8), np.arange(8)) * 4).astype(np.uint8)
    enc = jls_encode(img)
    assert enc == bytes.fromhex(
        "ffd8fff7000b060008000801011100ffda0008010100000000"
        "8631aff4209936c15554dfd3feff5ff7f8ffd9")


def test_lse_preset_maxval_roundtrip(rng):
    """LSE preset MAXVAL (the BitsStored<BitsAllocated form real TCIA
    files use) must round-trip and change the coded parameters."""
    img = rng.integers(0, 1001, (40, 40)).astype(np.uint16)
    enc = jls_encode(img, precision=10, maxval=1000)
    assert bytes([0xFF, 0xF8]) in enc  # LSE present
    dec, p = jls_decode(enc)
    assert p == 10
    np.testing.assert_array_equal(dec, img)


def test_error_paths(rng):
    img = rng.integers(0, 256, (24, 24)).astype(np.uint8)
    enc = jls_encode(img)
    with pytest.raises(JlsError, match="SOI"):
        jls_decode(b"\x00\x01\x02\x03")
    with pytest.raises(JlsError):
        jls_decode(enc[: len(enc) // 2])  # truncated scan
    # multi-component SOF55
    bad = bytearray(enc)
    nf_at = enc.index(bytes([0xFF, 0xF7])) + 9
    bad[nf_at] = 3
    with pytest.raises(JlsError, match="multi-component"):
        jls_decode(bytes(bad))
    # DNL-deferred height
    bad = bytearray(enc)
    y_at = enc.index(bytes([0xFF, 0xF7])) + 5
    bad[y_at:y_at + 2] = b"\x00\x00"
    with pytest.raises(JlsError, match="DNL"):
        jls_decode(bytes(bad))
    with pytest.raises(JlsError):
        jls_encode(img.astype(np.float32))  # bad dtype
    with pytest.raises(JlsError):
        jls_encode(img[None])  # 3-D
    # decode-size DoS bound: forged 65535x65535 dims must fail before
    # the output-plane allocation (JlsError, never MemoryError)
    bad = bytearray(enc)
    y_at = enc.index(bytes([0xFF, 0xF7])) + 5
    bad[y_at:y_at + 4] = b"\xff\xff\xff\xff"
    with pytest.raises(JlsError, match="implausible"):
        jls_decode(bytes(bad))


def test_native_matches_python(rng):
    """The C++ fast path (native/cadx_io.cc::jls_decode) must be
    bit-identical to the pure-Python reference codec on every stream
    class, incl. near-lossless and LSE presets."""
    from cadx_tpu.data import native_loader as nl

    if not nl.available():
        pytest.skip("native toolchain unavailable")
    for name, img in _cases(rng):
        prec = 8 if img.dtype == np.uint8 else 16
        for near in (0, 2):
            enc = jls_encode(img, near=near, precision=prec)
            py, _ = jls_decode(enc)
            nat = nl.decode_jls(enc, *img.shape)
            assert nat is not None, (name, near)
            np.testing.assert_array_equal(nat, py, err_msg=f"{name}/{near}")
    img = rng.integers(0, 1001, (40, 40)).astype(np.uint16)
    enc = jls_encode(img, precision=10, maxval=1000)
    np.testing.assert_array_equal(nl.decode_jls(enc, 40, 40), img)
    # malformed streams must be rejected (rc!=0 -> None), not crash
    assert nl.decode_jls(enc[:30], 40, 40) is None
    assert nl.decode_jls(b"\x12\x34" * 40, 40, 40) is None


def test_dicom_jls_roundtrip(tmp_path, rng):
    img = np.clip(rng.normal(900, 400, (128, 96)), 0, 4095).astype(np.uint16)
    p = str(tmp_path / "jls.dcm")
    dicom.dcmwrite_minimal(p, img, patient_id="P1",
                           transfer_syntax=dicom.TS_JPEG_LS)
    ds = dicom.dcmread(p)
    assert ds.transfer_syntax == dicom.TS_JPEG_LS
    np.testing.assert_array_equal(ds.pixel_array, img)


def test_dicom_jls_multiframe(tmp_path, rng):
    frames = rng.integers(0, 256, (3, 32, 40)).astype(np.uint8)
    p = str(tmp_path / "jls_mf.dcm")
    dicom.dcmwrite_minimal(p, frames, transfer_syntax=dicom.TS_JPEG_LS)
    arr = dicom.dcmread(p).pixel_array
    assert arr.shape == (3, 32, 40)
    np.testing.assert_array_equal(arr, frames)


def test_dicom_jls_near_lossless(tmp_path, rng):
    img = np.clip(rng.normal(900, 400, (64, 64)), 0, 4095).astype(np.uint16)
    p = str(tmp_path / "jls_nl.dcm")
    dicom.dcmwrite_minimal(p, img, transfer_syntax=dicom.TS_JPEG_LS_NEAR)
    out = dicom.dcmread(p).pixel_array
    err = np.abs(out.astype(np.int64) - img.astype(np.int64)).max()
    assert 0 < err <= 2  # writer uses NEAR=2 for the .81 syntax


def test_dicom_jls_size_mismatch_named_error(tmp_path, rng):
    """A JLS frame whose decoded size disagrees with Rows/Columns must
    fail with a DicomError naming JPEG-LS, not garbage pixels."""
    img = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    p = str(tmp_path / "jls_bad.dcm")
    dicom.dcmwrite_minimal(p, img, transfer_syntax=dicom.TS_JPEG_LS)
    blob = bytearray(open(p, "rb").read())
    at = bytes(blob).index(b"\x28\x00\x10\x00")  # Rows element
    blob[at + 8] = 17  # Rows: 16 -> 17
    open(p, "wb").write(bytes(blob))
    with pytest.raises(dicom.DicomError, match="JPEG-LS|Rows"):
        _ = dicom.dcmread(p).pixel_array
