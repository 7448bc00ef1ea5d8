"""ASAN+UBSAN fuzz driver for the native decode entry points.

Build:  g++ -O1 -g -fsanitize=address,undefined -fno-sanitize-recover=undefined \
        -shared -fPIC -std=c++17 -pthread native/cadx_io.cc -o /tmp/libcadx_asan.so
Run:    ASAN_OPTIONS=detect_leaks=0 LD_PRELOAD=$(gcc -print-file-name=libasan.so) \
        python _scratch/native_asan_fuzz.py [seconds]
Last run (round 4): 1,203,188 iterations clean after the SSSS>16 and
Golomb-k bounds; two UBSAN findings fixed (left shift of negative /
past int width).
"""
import ctypes, random, sys, time, tempfile, os
sys.path.insert(0, "/root/repo")
import numpy as np
lib = ctypes.CDLL("/tmp/libcadx_asan.so")
from cadx_tpu.data import codecs, jls, dicom

rng = np.random.default_rng(5)
img16 = rng.integers(0, 4096, (96, 80)).astype(np.uint16)
img8 = (img16 >> 4).astype(np.uint8)
frames = {
    "rle16": (codecs.rle_encode(img16), 96, 80, 16),
    "rle8": (codecs.rle_encode(img8), 96, 80, 8),
    "jll": (codecs.jpeg_lossless_encode(img16), 96, 80, 16),
    "jls": (jls.jls_encode(img16), 96, 80, 16),
    "jls_near": (jls.jls_encode(img16, near=2), 96, 80, 16),
}
# whole-file seeds for the parser entry points
d = tempfile.mkdtemp()
files = []
for ts in (dicom.TS_EXPLICIT_LE, dicom.TS_RLE, dicom.TS_JPEG_LOSSLESS_SV1,
           dicom.TS_JPEG_LS):
    p = os.path.join(d, ts.replace(".", "_") + ".dcm")
    dicom.dcmwrite_minimal(p, img16, transfer_syntax=ts)
    files.append(open(p, "rb").read())

R = random.Random(99)
def mutate(b):
    b = bytearray(b)
    op = R.randrange(5)
    if op == 0:
        for _ in range(R.randrange(1, 10)):
            i = R.randrange(len(b)); b[i] ^= 1 << R.randrange(8)
    elif op == 1:
        del b[R.randrange(1, len(b)):]
    elif op == 2:
        i = R.randrange(max(len(b)-4,1)); b[i:i+4] = bytes(R.randrange(256) for _ in range(4))
    elif op == 3:
        i = R.randrange(len(b)); b[i:i] = bytes(R.randrange(256) for _ in range(R.randrange(1,16)))
    else:
        i = R.randrange(len(b)); b[i:i+8] = b"\xff"*8
    return bytes(b)

out = np.empty((96, 80), np.uint16)
t0 = time.time(); n = 0
dur = float(sys.argv[1]) if len(sys.argv) > 1 else 300.0
while time.time() - t0 < dur:
    kind = R.randrange(4)
    if kind == 0:
        name = R.choice(list(frames))
        fb, r_, c_, bits = frames[name]
        m = mutate(fb)
        # sometimes lie about dims too
        rr = r_ if R.random() < 0.7 else R.randrange(1, 200)
        cc = c_ if R.random() < 0.7 else R.randrange(1, 200)
        ob = np.empty((max(rr,1), max(cc,1)), np.uint16)
        if name.startswith("rle"):
            lib.cadx_decode_rle(m, len(m), ob.ctypes.data_as(ctypes.c_void_p), rr, cc, bits)
        elif name == "jll":
            lib.cadx_decode_jpeg_lossless(m, len(m), ob.ctypes.data_as(ctypes.c_void_p), rr, cc)
        else:
            lib.cadx_decode_jls(m, len(m), ob.ctypes.data_as(ctypes.c_void_p), rr, cc)
    elif kind == 1:
        blob = mutate(R.choice(files))
        p = os.path.join(d, "fz.dcm")
        open(p, "wb").write(blob)
        r = ctypes.c_int(); c = ctypes.c_int(); b_ = ctypes.c_int()
        rc = lib.cadx_dicom_info(p.encode(), ctypes.byref(r), ctypes.byref(c), ctypes.byref(b_))
        if rc == 0 and 0 < r.value * c.value <= (1<<24):
            ob = np.empty(r.value * c.value, np.uint16)
            lib.cadx_dicom_pixels(p.encode(), ob.ctypes.data_as(ctypes.c_void_p), ob.size)
    elif kind == 2:
        # j2k block decoder with hostile segment tables
        blob = bytes(R.randrange(256) for _ in range(R.randrange(1, 200)))
        nseg = R.randrange(1, 4)
        sb = (ctypes.c_int64 * nseg)(*[R.randrange(0, len(blob)+4) for _ in range(nseg)])
        sp = (ctypes.c_int32 * nseg)(*[R.randrange(0, 40) for _ in range(nseg)])
        sr = (ctypes.c_int32 * nseg)(*[R.randrange(2) for _ in range(nseg)])
        w = R.randrange(1, 70); h = R.randrange(1, 70)
        ob = np.empty(w*h, np.int64)
        lib.cadx_j2k_decode_block(blob, len(blob), sb, sp, sr, nseg, w, h,
                                  R.randrange(0, 30), R.randrange(3), R.randrange(64),
                                  ob.ctypes.data_as(ctypes.c_void_p))
    else:
        # valid frames with hostile expect dims (exercise the guards)
        name = R.choice(list(frames))
        fb, r_, c_, bits = frames[name]
        rr, cc = R.randrange(1, 300), R.randrange(1, 300)
        ob = np.empty((rr, cc), np.uint16)
        if name.startswith("rle"):
            lib.cadx_decode_rle(fb, len(fb), ob.ctypes.data_as(ctypes.c_void_p), rr, cc, bits)
        elif name == "jll":
            lib.cadx_decode_jpeg_lossless(fb, len(fb), ob.ctypes.data_as(ctypes.c_void_p), rr, cc)
        else:
            lib.cadx_decode_jls(fb, len(fb), ob.ctypes.data_as(ctypes.c_void_p), rr, cc)
    n += 1
print("native fuzz iterations:", n, "clean")
