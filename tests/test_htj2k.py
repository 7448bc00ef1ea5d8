"""HTJ2K (ITU-T T.814) decoder + encoder verification (data/htj2k.py).

The T.814 spec text was unavailable offline; every block-coder rule was
pinned EMPIRICALLY against the system OpenJPEG 2.5 HT decoder (via cv2)
using hand-assembled codestreams. These tests reproduce that battery:

1. single-bit position probes that pin the SigProp scan order (4-row
   stripes / 4-column groups / group-end signs) and the MagRef reverse
   reader (byte table incl. the low7-ones overlap-unstuff rule),
2. kappa-window cases where the NW/NE diagonal carries the largest
   exponent (the two-sample window decodes self-consistently but
   diverges from the oracle — the bug class that black-box calibration
   exists to catch),
3. property fuzz: encoder -> our decoder round-trip, encoder -> cv2
   bit-identity, and random refinement segments through both decoders,
4. full-pipeline decodes through data/j2k.py tier-2 and DICOM
   round-trips through the .201/.203 transfer syntaxes.

Reference parity note: the reference has NO HTJ2K path (its pydicom
ingest at Classes/Preprocessing.py:149 would need an external plugin);
this closes the last named ingest gap and exceeds the reference.
"""

import struct

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from cadx_tpu.data import dicom
from cadx_tpu.data.codecs import CodecError
from cadx_tpu.data.htj2k import (ht_decode_block, ht_encode_cleanup,
                                 ht_encode_lossless)
from cadx_tpu.data.j2k import j2k_decode


@pytest.fixture
def rng():
    return np.random.default_rng(0x47)


# ---------------------------------------------------------------------------
# oracle harness: single-block 16-bit HT codestreams for cv2
# ---------------------------------------------------------------------------

def _build16(hw, cleanup, zbp=10, qexp=10, guard=2, cbexp=(4, 4),
             extra=b"", npasses=1):
    """Raw single-tile, levels=0 HT codestream around a hand-assembled
    cleanup segment (16-bit component; decoded pixel = coeff + 32768)."""
    h, w = hw
    s = struct
    soc = b"\xff\x4f"
    siz = b"\xff\x51" + s.pack(">HHIIIIIIIIH", 41, 0x4000, w, h, 0, 0,
                               w, h, 0, 0, 1) + bytes([15, 1, 1])
    cap = b"\xff\x50" + s.pack(">HIH", 8, 0x00020000, 0)
    cod = b"\xff\x52" + s.pack(">HBBHB", 12, 0, 0, 1, 0) + bytes(
        [0, cbexp[0] - 2, cbexp[1] - 2, 0x40, 1])
    qcd = b"\xff\x5c" + s.pack(">H", 4) + bytes(
        [0x40 | (guard << 5), qexp << 3])
    bits = [1, 1] + [0] * zbp + [1]
    bits += {1: [0], 2: [1, 0], 3: [1, 1, 0, 0]}[npasses]
    lblock = 3
    nb2_extra = 1 if npasses == 3 else 0
    while (len(cleanup) >> lblock) or (
            npasses > 1 and (len(extra) >> (lblock + nb2_extra))):
        lblock += 1
    bits += [1] * (lblock - 3) + [0]
    bits += [(len(cleanup) >> (lblock - 1 - k)) & 1 for k in range(lblock)]
    if npasses > 1:
        nb2 = lblock + nb2_extra
        bits += [(len(extra) >> (nb2 - 1 - k)) & 1 for k in range(nb2)]
    pkt = bytearray()
    for i in range(0, len(bits), 8):
        b = 0
        for j, bit in enumerate(bits[i:i + 8]):
            b |= bit << (7 - j)
        pkt.append(b)
    packets = bytes(pkt) + cleanup + extra
    psot = 12 + 2 + len(packets)
    sot = b"\xff\x90" + s.pack(">HHIBB", 10, 0, psot, 0, 1)
    return (soc + siz + cap + cod + qcd + sot + b"\xff\x93" + packets
            + b"\xff\xd9")


def _cv2_decode(stream, h, w):
    img = cv2.imdecode(np.frombuffer(stream, np.uint8),
                       cv2.IMREAD_UNCHANGED)
    if img is None:
        return None
    return np.asarray(img).reshape(h, w).astype(np.int64) - 32768


def _ref_from_bits(bits, nbytes=10):
    """LSB-first bit list -> refinement segment bytes (zero padded)."""
    bb = list(bits) + [0] * (nbytes * 8 - len(bits))
    return bytes(sum(bb[i + j] << j for j in range(8))
                 for i in range(0, nbytes * 8, 8))


# ---------------------------------------------------------------------------
# cleanup pass: encoder <-> decoder <-> OpenJPEG
# ---------------------------------------------------------------------------

def test_cleanup_roundtrip_property(rng):
    """Random sparse/dense signed blocks: segment round-trips through
    our decoder exactly, and cv2 decodes the same stream identically
    (sampled — the cv2 call dominates runtime)."""
    for it in range(150):
        h = int(rng.integers(1, 17))
        w = int(rng.integers(1, 17))
        magbits = int(rng.integers(1, 11))
        mask = rng.random((h, w)) < rng.uniform(0.02, 1.0)
        mags = rng.integers(1, 1 << magbits, size=(h, w))
        signs = rng.choice([-1, 1], size=(h, w))
        coeffs = (mask * mags * signs).astype(np.int64)
        seg = ht_encode_cleanup(coeffs)
        got = ht_decode_block([seg], w, h, mb=11, zbp=10, n_passes=1)
        np.testing.assert_array_equal(got, coeffs)
        if it % 10 == 0:
            out = _cv2_decode(_build16((h, w), seg), h, w)
            assert out is not None, "cv2 rejected our HT stream"
            np.testing.assert_array_equal(out, coeffs)


def test_kappa_uses_diagonal_exponents(rng):
    """The quad-context exponent window spans NW..NE of the row above.
    Construct quads whose largest above-exponent sits on a DIAGONAL:
    with the (wrong) two-sample window these decode self-consistently
    but diverge from OpenJPEG."""
    # (1,1) holds a large value; the quad at rows 2-3 cols 2-3 has
    # nothing directly above it but sees (1,1) as its NW neighbour.
    coeffs = np.zeros((4, 4), np.int64)
    coeffs[1, 1] = -20          # E = 6
    coeffs[2, 2] = -10
    coeffs[2, 3] = -4
    seg = ht_encode_cleanup(coeffs)
    got = ht_decode_block([seg], 4, 4, mb=11, zbp=10, n_passes=1)
    np.testing.assert_array_equal(got, coeffs)
    out = _cv2_decode(_build16((4, 4), seg), 4, 4)
    np.testing.assert_array_equal(out, coeffs)


def test_lossy_shift_and_midpoint(rng):
    """p > 0 blocks: magnitudes shift to the top bitplanes and nonzero
    samples get the 2^(p-1) midpoint — bit-identical to OpenJPEG."""
    for _ in range(40):
        h = int(rng.integers(1, 13))
        w = int(rng.integers(1, 13))
        zbp = int(rng.integers(2, 9))
        magbits = int(rng.integers(1, min(zbp, 6)))
        mask = rng.random((h, w)) < rng.uniform(0.05, 1.0)
        mags = rng.integers(1, 1 << magbits, size=(h, w))
        signs = rng.choice([-1, 1], size=(h, w))
        coeffs = (mask * mags * signs).astype(np.int64)
        seg = ht_encode_cleanup(coeffs)
        ours = ht_decode_block([seg], w, h, mb=11, zbp=zbp, n_passes=1)
        out = _cv2_decode(_build16((h, w), seg, zbp=zbp), h, w)
        assert out is not None
        np.testing.assert_array_equal(out, ours)


# ---------------------------------------------------------------------------
# SigProp: scan order probes + refinement fuzz
# ---------------------------------------------------------------------------

def _sparse_fixture():
    """9x9 block, single cleanup-significant sample at (4,4) (value 2),
    zbp=8 -> p=2: SigProp-new samples decode as +-3, cleanup as +-10."""
    coeffs = np.zeros((9, 9), np.int64)
    coeffs[4, 4] = 2
    return ht_encode_cleanup(coeffs)


def _sp_on(seg, refbits, npasses=2):
    ref = _ref_from_bits(refbits)
    out = _cv2_decode(_build16((9, 9), seg, zbp=8, extra=ref,
                               npasses=npasses), 9, 9)
    assert out is not None
    return {(int(y), int(x)): int(out[y, x])
            for y, x in np.argwhere(out != 0)}


def test_sigprop_visit_order_sparse():
    """Single-bit probes read out OpenJPEG's member visit order around
    an isolated significant sample; our decoder must agree on every
    probe. Pins: 4-row stripes, 4-column groups, columns left-to-right,
    top-down, sign bits at group end, causal membership."""
    seg = _sparse_fixture()
    base_order = [(3, 3), (3, 4), (3, 5), (4, 3), (5, 3), (5, 4), (4, 5),
                  (5, 5)]
    for k, want in enumerate(base_order):
        hits = _sp_on(seg, [0] * k + [1])
        assert hits == {(4, 4): 10, want: 3}, (k, hits)
        ours = ht_decode_block([seg, _ref_from_bits([0] * k + [1])],
                               9, 9, mb=11, zbp=8, n_passes=2)
        assert ours[want] == 3 and ours[4, 4] == 10
    # with (3,3) significant: sign immediately at its group end (bit1),
    # then causal members (2,4) at bit2, and next-stripe (4,2) at bit5
    for prefix, extra, want in [
            ([1], [0, 1], (2, 4)),       # causal cross-group member
            ([1], [0, 0, 1], (3, 4)),
            ([1], [0, 0, 0, 0, 1], (4, 2)),  # next stripe via (3,3)
    ]:
        bits = prefix + extra
        hits = _sp_on(seg, bits)
        assert hits.get(want) == 3, (bits, hits)
        ours = ht_decode_block([seg, _ref_from_bits(bits)],
                               9, 9, mb=11, zbp=8, n_passes=2)
        assert ours[want] == 3
    # sign bit: [1,1] makes (3,3) negative in both decoders
    hits = _sp_on(seg, [1, 1])
    assert hits == {(4, 4): 10, (3, 3): -3}
    ours = ht_decode_block([seg, _ref_from_bits([1, 1])],
                           9, 9, mb=11, zbp=8, n_passes=2)
    assert ours[3, 3] == -3


def test_sigprop_group_end_signs_dense(rng):
    """Dense fixture: a group with several members defers every sign to
    the group end (the original round-5 calibration bug: per-pair signs
    decoded the sparse probes but not dense blocks)."""
    coeffs = np.ones((9, 4), np.int64)
    for y, x in [(5, 0), (6, 1), (7, 1), (7, 2), (8, 0)]:
        coeffs[y, x] = 0
    seg = ht_encode_cleanup(coeffs)
    bits = [1, 1, 0, 0, 1, 0, 1, 0]
    ref = _ref_from_bits(bits)
    ours = ht_decode_block([seg, ref], 4, 9, mb=11, zbp=8, n_passes=2)
    out = _cv2_decode(_build16((9, 4), seg, zbp=8, extra=ref, npasses=2),
                      9, 4)
    np.testing.assert_array_equal(out, ours)
    # the pinned outcome: (5,0) negative, (6,1) positive, (8,0) positive
    assert ours[5, 0] == -3 and ours[6, 1] == 3 and ours[8, 0] == 3
    assert ours[7, 2] == 0


def test_refinement_differential_fuzz(rng):
    """Random refinement segments (SigProp np=2, +MagRef np=3) through
    both decoders — bit-identical outputs, including streams with raw
    0xFF bytes (exercises the overlap unstuffing rules)."""
    for it in range(60):
        h = int(rng.integers(1, 13))
        w = int(rng.integers(1, 13))
        zbp = int(rng.integers(2, 9))
        npasses = int(rng.choice([2, 3]))
        magbits = int(rng.integers(1, min(zbp, 6)))
        mask = rng.random((h, w)) < rng.uniform(0.05, 1.0)
        mags = rng.integers(1, 1 << magbits, size=(h, w))
        signs = rng.choice([-1, 1], size=(h, w))
        coeffs = (mask * mags * signs).astype(np.int64)
        seg = ht_encode_cleanup(coeffs)
        nref = int(rng.integers(1, 40))
        ref = bytearray(rng.integers(0, 256, size=nref, dtype=np.uint8))
        if it % 2:
            for _ in range(int(rng.integers(1, 4))):
                ref[int(rng.integers(0, nref))] = 0xFF
        ref = bytes(ref)
        st = _build16((h, w), seg, zbp=zbp, extra=ref, npasses=npasses)
        out = _cv2_decode(st, h, w)
        if out is None:
            continue
        ours = ht_decode_block([seg, ref], w, h, mb=11, zbp=zbp,
                               n_passes=npasses)
        np.testing.assert_array_equal(out, ours, err_msg=f"iter {it}")


def test_magref_reverse_reader_table():
    """The MagRef reverse reader byte table pinned against OpenJPEG:
    LSB-first from the segment end, zero over-read pad, and the armed
    low7-ones rule where the byte's MSB OR-overlaps the next byte's
    first bit."""
    coeffs = np.ones((6, 6), np.int64)   # all significant, mu=1
    seg = ht_encode_cleanup(coeffs)
    order = []
    for y0 in (0, 4):
        for x in range(6):
            for y in range(y0, min(y0 + 4, 6)):
                order.append((y, x))

    def hits(ref, use_cv2):
        if use_cv2:
            out = _cv2_decode(_build16((6, 6), seg, zbp=8, extra=ref,
                                       npasses=3), 6, 6)
        else:
            out = ht_decode_block([seg, ref], 6, 6, mb=11, zbp=8,
                                  n_passes=3)
        # base (no magref bit) = 5; refined = 7
        return sorted(order.index((int(y), int(x)))
                      for y, x in np.argwhere(out == 7))

    cases = {
        b"\x00": [],                         # zero pad, not 0xFF
        b"\xff": list(range(8)),             # init-armed overlap
        b"\x9f": [0, 1, 2, 3, 4, 7],
        b"\x01\xff": list(range(8)),         # 0x01's lsb eaten by stuff
        b"\x01\x7f": list(range(8)),         # overlap OR at bit 7
        b"\x9f\x7f": [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 14],
        b"\xff\x7f": list(range(15)),
        b"\x01\x9f": [0, 1, 2, 3, 4, 7, 8],  # 0x9f>0x8f doesn't re-arm..
        b"\xfe\x7f": [0, 1, 2, 3, 4, 5, 6, 8, 9, 10, 11, 12, 13, 14],
        b"\x01\x00\xff": list(range(8)) + [15],
    }
    for ref, want in cases.items():
        assert hits(ref, use_cv2=False) == want, ref
        assert hits(ref, use_cv2=True) == want, ref


# ---------------------------------------------------------------------------
# full pipeline: tier-2 + DICOM
# ---------------------------------------------------------------------------

def test_full_codestream_decode(rng):
    """ht_encode_lossless codestreams (64x64 tiles, CAP marker, HT
    cbstyle) through the full tier-2 pipeline — ours AND OpenJPEG."""
    for h, w, d in [(61, 47, 12), (130, 200, 16), (64, 64, 8),
                    (1, 1, 12), (65, 3, 10), (127, 129, 12)]:
        img = rng.integers(0, 1 << d, (h, w)).astype(
            np.uint8 if d <= 8 else np.uint16)
        st = ht_encode_lossless(img, d)
        out = j2k_decode(st, expect_hw=(h, w))
        np.testing.assert_array_equal(out.astype(np.int64), img)
        cvout = cv2.imdecode(np.frombuffer(st, np.uint8),
                             cv2.IMREAD_UNCHANGED)
        assert cvout is not None
        np.testing.assert_array_equal(
            np.asarray(cvout).reshape(h, w).astype(np.int64), img)


def test_dicom_htj2k_roundtrip(tmp_path, rng):
    img = rng.integers(0, 4096, (61, 47)).astype(np.uint16)
    p = str(tmp_path / "ht.dcm")
    dicom.dcmwrite_minimal(p, img,
                           transfer_syntax=dicom.TS_HTJ2K_LOSSLESS)
    ds = dicom.dcmread(p)
    assert ds.transfer_syntax == dicom.TS_HTJ2K_LOSSLESS
    np.testing.assert_array_equal(ds.pixel_array, img)


def test_dicom_htj2k_multiframe_16bit(tmp_path, rng):
    frames = rng.integers(0, 65536, (3, 40, 32)).astype(np.uint16)
    p = str(tmp_path / "ht_mf.dcm")
    dicom.dcmwrite_minimal(p, frames, transfer_syntax=dicom.TS_HTJ2K)
    np.testing.assert_array_equal(dicom.dcmread(p).pixel_array, frames)


def test_malformed_ht_segments_raise():
    """Corrupt HT cleanup segments fail with CodecError (bounds mirror
    OpenJPEG's): bad Scup, U_q over the bound, truncated segment."""
    with pytest.raises(CodecError, match="Scup|shorter"):
        ht_decode_block([b"\x00"], 4, 4, mb=11, zbp=10, n_passes=1)
    with pytest.raises(CodecError, match="Scup"):
        ht_decode_block([b"\x00\x00\xff\xff"], 4, 4, mb=11, zbp=10,
                        n_passes=1)
    # a valid lossless segment re-declared with tiny zbp violates the
    # U bound exactly like OpenJPEG's "U_q is larger than" check
    coeffs = np.full((4, 4), 900, np.int64)
    seg = ht_encode_cleanup(coeffs)
    with pytest.raises(CodecError, match="U_q|bound"):
        ht_decode_block([seg], 4, 4, mb=3, zbp=2, n_passes=1)
    with pytest.raises(CodecError, match="passes"):
        ht_decode_block([seg, b"\x00"], 4, 4, mb=11, zbp=10, n_passes=4)
