"""Self-contained DICOM reader (pydicom is not available in this image).

Covers what the reference pipeline needs from pydicom (Classes/
Preprocessing.py:149-156, Classes/load.py): reading uncompressed
little-endian DICOM files, extracting the pixel array and PatientID.
Supports explicit and implicit VR, OB/OW pixel data, 8/16-bit
monochrome, and the common meta group. Compressed transfer syntaxes
raise a clear error.
"""

from __future__ import annotations

import dataclasses
import os
import struct

import numpy as np

_EXPLICIT_LONG_VRS = {b"OB", b"OW", b"OF", b"SQ", b"UT", b"UN"}

# transfer syntax UIDs we can decode (uncompressed)
_SUPPORTED_TS = {
    "1.2.840.10008.1.2",       # implicit VR little endian
    "1.2.840.10008.1.2.1",     # explicit VR little endian
}

TAG_TRANSFER_SYNTAX = (0x0002, 0x0010)
TAG_PATIENT_ID = (0x0010, 0x0020)
TAG_ROWS = (0x0028, 0x0010)
TAG_COLS = (0x0028, 0x0011)
TAG_BITS_ALLOCATED = (0x0028, 0x0100)
TAG_PIXEL_REPRESENTATION = (0x0028, 0x0103)
TAG_SAMPLES_PER_PIXEL = (0x0028, 0x0002)
TAG_PIXEL_DATA = (0x7FE0, 0x0010)


class DicomError(ValueError):
    pass


@dataclasses.dataclass
class DicomFile:
    """Parsed DICOM dataset: raw elements + decoded pixel array."""

    elements: dict[tuple[int, int], bytes]
    transfer_syntax: str

    def get(self, tag: tuple[int, int], default=None):
        return self.elements.get(tag, default)

    # --- typed accessors -------------------------------------------------
    def get_str(self, tag, default: str = "") -> str:
        raw = self.elements.get(tag)
        if raw is None:
            return default
        return raw.decode("ascii", errors="replace").strip("\x00 ").strip()

    def get_int(self, tag, default: int = 0) -> int:
        raw = self.elements.get(tag)
        if raw is None:
            return default
        if len(raw) == 2:
            return struct.unpack("<H", raw)[0]
        if len(raw) == 4:
            return struct.unpack("<I", raw)[0]
        try:
            return int(raw.decode("ascii").strip() or default)
        except ValueError:
            return default

    @property
    def PatientID(self) -> str:  # pydicom-style convenience
        return self.get_str(TAG_PATIENT_ID, "Unknown")

    @property
    def pixel_array(self) -> np.ndarray:
        raw = self.elements.get(TAG_PIXEL_DATA)
        if raw is None:
            raise DicomError("no PixelData (7FE0,0010) element")
        rows = self.get_int(TAG_ROWS)
        cols = self.get_int(TAG_COLS)
        bits = self.get_int(TAG_BITS_ALLOCATED, 16)
        signed = self.get_int(TAG_PIXEL_REPRESENTATION, 0) == 1
        samples = max(self.get_int(TAG_SAMPLES_PER_PIXEL, 1), 1)
        if rows <= 0 or cols <= 0:
            raise DicomError("missing Rows/Columns")
        if bits == 8:
            dtype = np.int8 if signed else np.uint8
        elif bits == 16:
            dtype = np.int16 if signed else np.uint16
        else:
            raise DicomError(f"unsupported BitsAllocated={bits}")
        need = rows * cols * samples * (bits // 8)
        if len(raw) < need:
            raise DicomError(f"PixelData too short: {len(raw)} < {need}")
        arr = np.frombuffer(raw[:need], dtype=dtype)
        if samples > 1:
            return arr.reshape(rows, cols, samples)
        return arr.reshape(rows, cols)


def _read_element(buf: memoryview, off: int, explicit: bool):
    group, elem = struct.unpack_from("<HH", buf, off)
    off += 4
    if explicit or group == 0x0002:  # file-meta group is always explicit
        vr = bytes(buf[off : off + 2])
        if vr in _EXPLICIT_LONG_VRS:
            length = struct.unpack_from("<I", buf, off + 4)[0]
            off += 8
        else:
            length = struct.unpack_from("<H", buf, off + 2)[0]
            off += 4
    else:
        length = struct.unpack_from("<I", buf, off)[0]
        off += 4
    if length == 0xFFFFFFFF:
        raise DicomError(
            "undefined-length element (encapsulated/compressed pixel data "
            "is not supported by the built-in reader)"
        )
    value = bytes(buf[off : off + length])
    return (group, elem), value, off + length


def dcmread(path_or_bytes) -> DicomFile:
    """Read a DICOM file (path or bytes). pydicom.dcmread equivalent for
    uncompressed little-endian files."""
    if isinstance(path_or_bytes, (bytes, bytearray, memoryview)):
        data = bytes(path_or_bytes)
    else:
        with open(os.fspath(path_or_bytes), "rb") as f:
            data = f.read()

    if len(data) < 132 or data[128:132] != b"DICM":
        raise DicomError("not a DICOM file (missing DICM magic)")
    buf = memoryview(data)
    off = 132

    elements: dict[tuple[int, int], bytes] = {}
    # file meta group (always explicit VR LE)
    ts = "1.2.840.10008.1.2.1"
    while off < len(buf):
        group = struct.unpack_from("<H", buf, off)[0]
        if group != 0x0002:
            break
        tag, value, off = _read_element(buf, off, explicit=True)
        elements[tag] = value
    ts = elements.get(TAG_TRANSFER_SYNTAX, ts)
    if isinstance(ts, bytes):
        ts = ts.decode("ascii", errors="replace").strip("\x00 ").strip()
    if ts not in _SUPPORTED_TS:
        raise DicomError(f"unsupported transfer syntax {ts!r} (compressed?)")
    explicit = ts == "1.2.840.10008.1.2.1"

    while off + 8 <= len(buf):
        tag, value, off = _read_element(buf, off, explicit)
        elements[tag] = value
    return DicomFile(elements=elements, transfer_syntax=ts)


def dcmwrite_minimal(path: str, pixel_array: np.ndarray,
                     patient_id: str = "Unknown") -> None:
    """Write a minimal valid explicit-VR-LE DICOM (for tests/demos)."""
    arr = np.ascontiguousarray(pixel_array)
    if arr.dtype == np.uint8:
        bits = 8
    elif arr.dtype == np.uint16:
        bits = 16
    else:
        raise DicomError("writer supports uint8/uint16 only")
    rows, cols = arr.shape[:2]

    def elem_short(group, el, vr: bytes, value: bytes) -> bytes:
        if len(value) % 2:
            value += b"\x00" if vr != b"UI" else b"\x00"
        return struct.pack("<HH", group, el) + vr + struct.pack("<H", len(value)) + value

    def elem_long(group, el, vr: bytes, value: bytes) -> bytes:
        if len(value) % 2:
            value += b"\x00"
        return (struct.pack("<HH", group, el) + vr + b"\x00\x00"
                + struct.pack("<I", len(value)) + value)

    ts = b"1.2.840.10008.1.2.1"
    meta = elem_short(0x0002, 0x0010, b"UI", ts)
    meta = elem_long(0x0002, 0x0001, b"OB", b"\x00\x01") + meta
    body = b""
    body += elem_short(0x0010, 0x0020, b"LO", patient_id.encode())
    body += elem_short(0x0028, 0x0002, b"US", struct.pack("<H", 1))
    body += elem_short(0x0028, 0x0010, b"US", struct.pack("<H", rows))
    body += elem_short(0x0028, 0x0011, b"US", struct.pack("<H", cols))
    body += elem_short(0x0028, 0x0100, b"US", struct.pack("<H", bits))
    body += elem_short(0x0028, 0x0103, b"US", struct.pack("<H", 0))
    body += elem_long(0x7FE0, 0x0010, b"OW", arr.tobytes())

    with open(path, "wb") as f:
        f.write(b"\x00" * 128 + b"DICM" + meta + body)
