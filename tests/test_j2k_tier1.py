"""EBCOT tier-1 code-block round trips under every coding-style option.

The OpenJPEG-encoded fixtures in test_j2k.py never enable the optional
code-block styles (cv2's encoder can't emit them), so selective
arithmetic BYPASS, context RESET, TERMALL, vertically-CAUSAL contexts
and SEGSYM were previously untested in both the Python decoder
(data/j2k.py::_decode_block) and the native port
(native/cadx_io.cc::cadx_j2k_decode_block) — even though real encoders
(Kakadu in particular) enable bypass/termall routinely on mammograms.

This module implements an independent tier-1 ENCODER (MQ coder per
T.800 Annex C, pass scheduling per D.4) and round-trips random sparse
code-blocks through both decoders for every option combination,
asserting exact coefficient recovery and native==python bit identity.
The raw-segment sign path (coded directly, NO Table-D.3 prediction —
T.800 D.6, matching OpenJPEG's raw sigpass) is pinned here; the
pre-round-4 decoders applied the MQ xor-prediction to raw signs.
"""

import numpy as np
import pytest

from cadx_tpu.data import j2k
from cadx_tpu.data.j2k import (_CTX_RL, _CTX_UNI, _QE, _CodeBlock,
                               _sig_ctx, _sign_ctx)

# ---------------------------------------------------------------------------
# MQ encoder (T.800 Annex C software conventions)
# ---------------------------------------------------------------------------


class _MQEncoder:
    def __init__(self):
        self.reset_contexts()
        self._init_codeword()

    def reset_contexts(self):
        self.idx = [0] * 19
        self.mps = [0] * 19
        self.idx[_CTX_UNI] = 46
        self.idx[_CTX_RL] = 3
        self.idx[0] = 4

    def _init_codeword(self):
        self.a = 0x8000
        self.c = 0
        self.ct = 12
        self.out = bytearray(b"\x00")  # scratch byte, dropped at flush

    def _byteout(self):
        if self.out[-1] == 0xFF:
            self.out.append((self.c >> 20) & 0xFF)
            self.c &= 0xFFFFF
            self.ct = 7
        else:
            if self.c < 0x8000000:
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
        while True:
            if self.ct == 0:
                self._byteout()
            self.a = (self.a << 1) & 0xFFFF
            self.c = (self.c << 1) & 0xFFFFFFFF
            self.ct -= 1
            if self.a & 0x8000:
                break

    def encode(self, d: int, cx: int):
        qe = _QE[self.idx[cx]][0]
        self.a -= qe
        if d == self.mps[cx]:
            if self.a & 0x8000:
                self.c += qe  # MPS upper sub-interval, no renorm needed
                return
            if self.a < qe:
                self.a = qe
            else:
                self.c += qe
            self.idx[cx] = _QE[self.idx[cx]][1]  # NMPS
            self._renorm()
        else:
            if self.a < qe:
                self.c += qe
            else:
                self.a = qe
            if _QE[self.idx[cx]][3]:
                self.mps[cx] = 1 - self.mps[cx]
            self.idx[cx] = _QE[self.idx[cx]][2]  # NLPS
            self._renorm()

    def flush(self) -> bytes:
        """Terminate the codeword; contexts survive for the next segment."""
        # SETBITS
        tempc = self.c + self.a
        self.c |= 0xFFFF
        if self.c >= tempc:
            self.c -= 0x8000
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        self.c = (self.c << self.ct) & 0xFFFFFFFF
        self._byteout()
        data = bytes(self.out[1:])  # drop the scratch byte
        while data.endswith(b"\xff"):
            data = data[:-1]  # spec: segments must not end in 0xFF
        self._init_codeword()
        return data


class _RawEncoder:
    """Raw bit writer with the 0xFF stuffing rule (one fewer bit after
    an 0xFF byte), mirroring data/j2k.py::_RawBitReader."""

    def __init__(self):
        self.out = bytearray()
        self.buf = 0
        self.ct = 8

    def write(self, bit: int):
        if self.ct == 0:
            self.out.append(self.buf)
            self.ct = 7 if self.buf == 0xFF else 8
            self.buf = 0
        self.ct -= 1
        self.buf |= (bit & 1) << self.ct

    def flush(self) -> bytes:
        if self.ct < 8:  # pending bits (ct==0: full byte awaiting append)
            self.out.append(self.buf)
        data = bytes(self.out)
        self.__init__()
        return data


# ---------------------------------------------------------------------------
# Forward tier-1 (mirrors _decode_block's pass structure exactly)
# ---------------------------------------------------------------------------


def _encode_block(coefs: np.ndarray, kind: str, cbstyle: int):
    """Encode signed int coefficients -> (segments, bp_start, n_passes)
    with segments = [(bytes, n_passes)] at decoder-segment granularity."""
    h, w = coefs.shape
    mags = np.abs(coefs).astype(np.int64)
    negs = coefs < 0
    vmax = int(mags.max())
    assert vmax > 0
    bp_start = vmax.bit_length() - 1
    n_passes = 1 + 3 * bp_start

    bypass = bool(cbstyle & 1)
    reset_ctx = bool(cbstyle & 2)
    termall = bool(cbstyle & 4)
    causal = bool(cbstyle & 8)
    segsym = bool(cbstyle & 32)

    pass_types = [2]
    bp_of_pass = [bp_start]
    bp = bp_start
    while len(pass_types) < n_passes:
        bp -= 1
        for t in (0, 1, 2):
            pass_types.append(t)
            bp_of_pass.append(bp)
            if len(pass_types) >= n_passes:
                break

    def pass_is_raw(k):
        return (bypass and pass_types[k] in (0, 1)
                and (bp_start - bp_of_pass[k]) >= 4)

    sig = np.zeros((h + 2, w + 2), np.uint8)
    sgn = np.zeros((h + 2, w + 2), np.int8)
    visited = np.zeros((h, w), bool)
    refined = np.zeros((h, w), bool)

    mq = _MQEncoder()
    raw = _RawEncoder()

    def nb_counts(yy, x):
        ys, xs = yy + 1, x + 1
        vn = int(sig[ys - 1, xs])
        vs_ = int(sig[ys + 1, xs])
        dn = int(sig[ys - 1, xs - 1] + sig[ys - 1, xs + 1])
        dsn = int(sig[ys + 1, xs - 1] + sig[ys + 1, xs + 1])
        if causal and (yy % 4) == 3:  # VSC: south-only masking
            vs_ = 0
            dsn = 0
        hs = int(sig[ys, xs - 1] + sig[ys, xs + 1])
        return hs, vn + vs_, dn + dsn

    def enc_sig(yy, x, is_raw):
        """Sample becomes significant: record state, code its sign."""
        ys, xs = yy + 1, x + 1
        if is_raw:
            # raw sign: coded directly, no prediction (T.800 D.6)
            raw.write(int(negs[yy, x]))
        else:
            vup = int(sig[ys - 1, xs]) * int(sgn[ys - 1, xs])
            vdn = int(sig[ys + 1, xs]) * int(sgn[ys + 1, xs])
            if causal and (yy % 4) == 3:
                vdn = 0
            hc = max(-1, min(1, int(sig[ys, xs - 1]) * int(sgn[ys, xs - 1])
                             + int(sig[ys, xs + 1]) * int(sgn[ys, xs + 1])))
            vc = max(-1, min(1, vup + vdn))
            cx, xorbit = _sign_ctx(hc, vc)
            mq.encode(int(negs[yy, x]) ^ xorbit, cx)
        sig[ys, xs] = 1
        sgn[ys, xs] = -1 if negs[yy, x] else 1

    def run_pass(k):
        t = pass_types[k]
        bp_i = bp_of_pass[k]
        is_raw = pass_is_raw(k)

        def put(bit, cx):
            if is_raw:
                raw.write(bit)
            else:
                mq.encode(bit, cx)

        for y0s in range(0, h, 4):
            y1s = min(y0s + 4, h)
            for x in range(w):
                if t == 2:
                    yy = y0s
                    while yy < y1s:
                        if yy == y0s and y1s - y0s == 4:
                            all_zero_ctx = True
                            for yk in range(y0s, y1s):
                                if visited[yk, x] or sig[yk + 1, x + 1]:
                                    all_zero_ctx = False
                                    break
                                hs, vs, ds = nb_counts(yk, x)
                                if hs or vs or ds:
                                    all_zero_ctx = False
                                    break
                            if all_zero_ctx:
                                first = -1
                                for r2 in range(4):
                                    if (mags[y0s + r2, x] >> bp_i) & 1:
                                        first = r2
                                        break
                                if first < 0:
                                    mq.encode(0, _CTX_RL)
                                    yy = y1s
                                    continue
                                mq.encode(1, _CTX_RL)
                                mq.encode((first >> 1) & 1, _CTX_UNI)
                                mq.encode(first & 1, _CTX_UNI)
                                yy = y0s + first
                                enc_sig(yy, x, False)
                                yy += 1
                                continue
                        if not visited[yy, x] and not sig[yy + 1, x + 1]:
                            hs, vs, ds = nb_counts(yy, x)
                            cx = _sig_ctx(kind, hs, vs, ds)
                            bit = int((mags[yy, x] >> bp_i) & 1)
                            mq.encode(bit, cx)
                            if bit:
                                enc_sig(yy, x, False)
                        visited[yy, x] = False
                        yy += 1
                    continue
                for yy in range(y0s, y1s):
                    if t == 0:
                        if sig[yy + 1, x + 1] or visited[yy, x]:
                            continue
                        hs, vs, ds = nb_counts(yy, x)
                        if hs + vs + ds == 0:
                            continue
                        cx = _sig_ctx(kind, hs, vs, ds)
                        bit = int((mags[yy, x] >> bp_i) & 1)
                        put(bit, cx)
                        if bit:
                            enc_sig(yy, x, is_raw)
                        visited[yy, x] = True
                    elif t == 1:
                        if not sig[yy + 1, x + 1] or visited[yy, x]:
                            continue
                        if refined[yy, x]:
                            cx = 16
                        else:
                            hs, vs, ds = nb_counts(yy, x)
                            cx = 15 if (hs + vs + ds) else 14
                        put(int((mags[yy, x] >> bp_i) & 1), cx)
                        refined[yy, x] = True
                        visited[yy, x] = True

    # segment boundaries: identical rule to the decoder
    segments = []
    seg_start = 0
    for k in range(n_passes):
        run_pass(k)
        if pass_types[k] == 2:
            if segsym:
                for b in (1, 0, 1, 0):  # 0xA
                    mq.encode(b, _CTX_UNI)
            visited[:] = False
        if reset_ctx:
            mq.reset_contexts()
        last = k == n_passes - 1
        boundary = last or termall or (
            bypass and not last and pass_is_raw(k) != pass_is_raw(k + 1))
        if boundary:
            data = raw.flush() if pass_is_raw(k) else mq.flush()
            segments.append((data, k + 1 - seg_start))
            seg_start = k + 1
    return segments, bp_start, n_passes


def _roundtrip(coefs, kind, cbstyle):
    segments, bp_start, n_passes = _encode_block(coefs, kind, cbstyle)
    h, w = coefs.shape
    cb = _CodeBlock(0, 0, w, h)
    cb.included = True
    cb.zbp = 0
    cb.passes_total = n_passes
    cb.data_parts = segments
    cb.nb_seg_passes = [(len(d), np_) for d, np_ in segments]
    mb = bp_start + 1
    return j2k._decode_block(cb, kind, mb, cbstyle)


def _rand_block(rng, h, w, density=0.25, maxmag=2000):
    m = rng.random((h, w)) < density
    v = rng.integers(1, maxmag, (h, w)) * np.where(rng.random((h, w)) < 0.5,
                                                   -1, 1)
    out = np.where(m, v, 0).astype(np.int64)
    if not out.any():
        out[h // 2, w // 2] = 7
    return out


_STYLES = {
    "plain": 0,
    "bypass": 1,
    "reset": 2,
    "termall": 4,
    "causal": 8,
    "segsym": 32,
    "bypass+termall": 5,
    "bypass+reset+termall": 7,
    "all": 1 | 2 | 4 | 8 | 32,
}


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.mark.parametrize("style", sorted(_STYLES))
@pytest.mark.parametrize("kind", ["LL", "HL", "HH"])
def test_roundtrip_python(style, kind, rng, monkeypatch):
    monkeypatch.setattr(j2k, "_NATIVE_J2K", False)
    for h, w in ((32, 32), (17, 13), (4, 64), (64, 3), (5, 5)):
        coefs = _rand_block(rng, h, w)
        out = _roundtrip(coefs, kind, _STYLES[style])
        np.testing.assert_array_equal(out, coefs, err_msg=f"{style} {kind}")


@pytest.mark.parametrize("style", sorted(_STYLES))
def test_roundtrip_native_matches(style, rng, monkeypatch):
    from cadx_tpu.data import native_loader
    try:
        native_loader.get_lib()
    except native_loader.NativeUnavailable:
        pytest.skip("no native toolchain")
    orig = native_loader.decode_j2k_block  # bind ONCE, before any patching
    for h, w in ((32, 32), (17, 13), (4, 64)):
        coefs = _rand_block(rng, h, w)
        monkeypatch.setattr(j2k, "_NATIVE_J2K", True)
        monkeypatch.setattr(j2k, "_native_j2k_dead", False)
        calls = []

        def counted(*a, **kw):
            calls.append(1)
            return orig(*a, **kw)

        monkeypatch.setattr(native_loader, "decode_j2k_block", counted)
        out_native = _roundtrip(coefs, "HL", _STYLES[style])
        assert calls, "native tier-1 silently not engaged"
        assert not j2k._native_j2k_dead
        monkeypatch.setattr(j2k, "_NATIVE_J2K", False)
        out_py = _roundtrip(coefs, "HL", _STYLES[style])
        np.testing.assert_array_equal(out_native, out_py)
        np.testing.assert_array_equal(out_native, coefs)


def test_deep_bitplanes_bypass(rng, monkeypatch):
    """Large magnitudes -> many raw passes; pins raw sign handling."""
    monkeypatch.setattr(j2k, "_NATIVE_J2K", False)
    coefs = _rand_block(rng, 24, 24, density=0.4, maxmag=1 << 17)
    out = _roundtrip(coefs, "LL", 1)
    np.testing.assert_array_equal(out, coefs)


def test_native_idwt_matches_numpy(rng, monkeypatch):
    from cadx_tpu.data import native_loader
    try:
        native_loader.get_lib()
    except native_loader.NativeUnavailable:
        pytest.skip("no native toolchain")
    for n_low, n_high, other, parity in ((8, 8, 13, 0), (9, 8, 5, 0),
                                         (8, 9, 7, 1), (3, 2, 4, 0),
                                         (1, 1, 6, 0), (1, 2, 3, 1),
                                         (50, 50, 33, 1)):
        for axis in (0, 1):
            shp_l = (n_low, other) if axis == 0 else (other, n_low)
            shp_h = (n_high, other) if axis == 0 else (other, n_high)
            low = rng.integers(-9999, 9999, shp_l).astype(np.int64)
            high = rng.integers(-9999, 9999, shp_h).astype(np.int64)
            got = native_loader.idwt53_1d(low, high, parity, axis)
            monkeypatch.setattr(j2k, "_NATIVE_J2K", False)
            want = j2k._idwt53_1d(low, high, parity, axis)
            monkeypatch.setattr(j2k, "_NATIVE_J2K", True)
            np.testing.assert_array_equal(
                got, want, err_msg=f"{n_low},{n_high},{other},{parity},{axis}")
