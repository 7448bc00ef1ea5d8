"""On-chip HTTP serve drive (onchip_checklist step 4 + 6).

Real TPU engine behind the real ThreadingHTTPServer: upload a
multi-frame RLE DICOM, a J2K-lossless DICOM, and a JPEG-LS DICOM over
HTTP, hit /classify (the r4 fused one-dispatch path), confirm 200 + the
reference's confidence quirk, and measure request wall times including
the feature-cache hot/cold delta.

Run: cd /root/repo && timeout 1800 python _scratch/serve_drive.py
"""
import json
import sys
import tempfile
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, "/root/repo")

from cadx_tpu.data import dicom as _dicom  # noqa: E402
from cadx_tpu.serve.app import make_server  # noqa: E402
from cadx_tpu.serve.engine import EngineConfig, InferenceEngine  # noqa: E402


def _post_multipart(url, fields, files):
    boundary = "XBOUNDARYX"
    parts = []
    for name, value in fields.items():
        parts.append(
            f'--{boundary}\r\nContent-Disposition: form-data; name="{name}"'
            f"\r\n\r\n{value}\r\n".encode())
    for name, (fname, data) in files.items():
        parts.append(
            f'--{boundary}\r\nContent-Disposition: form-data; name="{name}"; '
            f'filename="{fname}"\r\nContent-Type: application/octet-stream'
            "\r\n\r\n".encode() + data + b"\r\n")
    parts.append(f"--{boundary}--\r\n".encode())
    body = b"".join(parts)
    req = urllib.request.Request(url, data=body, method="POST", headers={
        "Content-Type": f"multipart/form-data; boundary={boundary}"})
    try:
        with urllib.request.urlopen(req) as r:
            return r.status
    except urllib.error.HTTPError as e:
        return e.code


def _get(url):
    t0 = time.perf_counter()
    with urllib.request.urlopen(url) as r:
        body = json.loads(r.read())
        return r.status, body, (time.perf_counter() - t0) * 1e3


def main():
    ws = tempfile.mkdtemp(prefix="cadx_drive_")
    eng = InferenceEngine(EngineConfig())
    srv = make_server(ws, port=0, engine=eng)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    rng = np.random.default_rng(7)
    out = {}

    cases = [
        ("rle_multiframe", _dicom.TS_RLE,
         rng.integers(0, 4096, (3, 512, 512), dtype=np.uint16)),
        ("j2k_lossless", _dicom.TS_J2K_LOSSLESS,
         rng.integers(0, 4096, (512, 512), dtype=np.uint16)),
        ("jpeg_ls", _dicom.TS_JPEG_LS,
         rng.integers(0, 4096, (512, 512), dtype=np.uint16)),
        ("htj2k", _dicom.TS_HTJ2K_LOSSLESS,
         rng.integers(0, 4096, (512, 512), dtype=np.uint16)),
    ]
    for name, ts, img in cases:
        with tempfile.NamedTemporaryFile(suffix=".dcm") as f:
            _dicom.dcmwrite_minimal(f.name, img, f"P-{name}",
                                    transfer_syntax=ts)
            dcm = open(f.name, "rb").read()
        t0 = time.perf_counter()
        status = _post_multipart(base + "/upload-single",
                                 {"modality1": "MG"},
                                 {"image1": (f"{name}.dcm", dcm)})
        up_ms = (time.perf_counter() - t0) * 1e3
        assert status in (200, 302), (name, status)
        s1, body, cold_ms = _get(base + "/classify?pipeline=basic")
        assert s1 == 200, (name, s1)
        # hot pass: device feature cache keyed by (path, mtime)
        hots = []
        for _ in range(5):
            s2, body2, ms = _get(base + "/classify?pipeline=basic")
            assert s2 == 200
            hots.append(ms)
        out[name] = {
            "upload_ms": round(up_ms, 1),
            "classify_cold_ms": round(cold_ms, 1),
            "classify_hot_ms_p50": round(float(np.median(hots)), 1),
            "predicted_class": body["classificationData"][0]["predicted_class"],
            "confidence_quirk": body["classificationData"][0]["confidence"],
        }
        # the reference's fixed-confidence quirk (app.py:548) must survive
        assert out[name]["confidence_quirk"] == 76, out[name]
        print(f"{name}: {out[name]}", file=sys.stderr, flush=True)

    srv.shutdown()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
