"""Native C++ IO runtime tests: build, DICOM parity with the Python
reader, prefetching batch loader semantics, graceful skip."""

import os

import numpy as np
import pytest

from cadx_tpu.data import dicom
from cadx_tpu.data import native_loader as nl

pytestmark = pytest.mark.skipif(not nl.available(),
                                reason="no C++ toolchain available")


@pytest.fixture
def dicom_files(tmp_path, rng):
    paths, labels, arrays = [], [], []
    for i in range(7):
        img = rng.integers(0, 4096, (40 + i, 32), dtype=np.uint16)
        p = str(tmp_path / f"f{i}.dcm")
        dicom.dcmwrite_minimal(p, img, patient_id=f"P{i}")
        paths.append(p)
        labels.append(i % 2)
        arrays.append(img)
    return paths, labels, arrays


def test_native_dicom_matches_python(dicom_files):
    paths, _, arrays = dicom_files
    for p, ref in zip(paths, arrays):
        out = nl.read_dicom_pixels(p)
        np.testing.assert_array_equal(out, ref)


def test_native_dicom_uint8(tmp_path, rng):
    img = rng.integers(0, 255, (16, 16), dtype=np.uint8)
    p = str(tmp_path / "u8.dcm")
    dicom.dcmwrite_minimal(p, img)
    out = nl.read_dicom_pixels(p)
    np.testing.assert_array_equal(out, img.astype(np.uint16))


def test_parse_cache_misses_on_rewrite(tmp_path, rng):
    """A rewritten file with identical size, header, and tail bytes must
    not serve stale cached pixels (round-3 advisor finding: the cache key
    now carries stat mtime/inode, not just size + head/tail bytes)."""
    img = rng.integers(0, 4096, (64, 64), dtype=np.uint16)
    p = str(tmp_path / "c.dcm")
    dicom.dcmwrite_minimal(p, img)
    first = nl.read_dicom_pixels(p)  # populates the single-entry cache
    np.testing.assert_array_equal(first, img)

    # same shape => same file size and identical meta-group head; flip
    # only interior pixels so the first/last 64 bytes stay byte-identical
    img2 = img.copy()
    img2[16:48, 16:48] = (img2[16:48, 16:48] + 1) % 4096
    dicom.dcmwrite_minimal(p, img2)
    # force a distinct mtime even if both writes land in one clock tick
    st = os.stat(p)
    os.utime(p, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
    second = nl.read_dicom_pixels(p)
    np.testing.assert_array_equal(second, img2)


def test_batch_loader_full_epoch(dicom_files):
    paths, labels, arrays = dicom_files
    loader = nl.NativeBatchLoader(paths, labels, batch_size=3, out_hw=(16, 16))
    batches = list(loader)
    loader.close()
    # 7 items in batches of 3 -> 3, 3, 1
    counts = sorted(len(b[0]) for b in batches)
    assert counts == [1, 3, 3]
    total_ok = sum(int(b[2].sum()) for b in batches)
    assert total_ok == 7
    # labels preserved (order within epoch is deterministic ranges,
    # batch arrival order may vary with threading)
    all_labels = np.concatenate([b[1][b[2]] for b in batches])
    assert sorted(all_labels.tolist()) == sorted(labels)
    # normalized to [0, 1]
    for data, _, ok in batches:
        assert data[ok].max() <= 1.0 + 1e-6


def test_batch_loader_matches_python_resize(dicom_files):
    """Native resize+normalize tracks the Python area-resize pipeline."""
    import jax.numpy as jnp

    from cadx_tpu.ops.resize import resize_area

    paths, labels, arrays = dicom_files
    loader = nl.NativeBatchLoader(paths[:1], labels[:1], batch_size=1,
                                  out_hw=(20, 16), n_workers=1)
    data, lab, ok = next(iter(loader))
    loader.close()
    assert ok[0]
    ref = np.asarray(resize_area(jnp.asarray(arrays[0].astype(np.float32)), (20, 16)))
    ref = ref / ref.max()
    np.testing.assert_allclose(data[0], ref, atol=0.05)  # binning differs slightly


def test_loader_rescues_j2k_items(tmp_path, rng):
    """Transfer syntaxes the C++ parser doesn't decode (JPEG 2000) must
    come back ok=True via the pure-Python rescue with bit-identical
    resize semantics — not silently skipped; corrupt files still skip."""
    cv2 = pytest.importorskip("cv2")  # noqa: F841 — J2K writing needs cv2
    paths, labels, arrays = [], [], []
    for i in range(5):
        img = rng.integers(0, 4096, (40, 32), dtype=np.uint16)
        p = str(tmp_path / f"r{i}.dcm")
        ts = (dicom.TS_J2K_LOSSLESS, dicom.TS_JPEG_LOSSLESS_SV1,
              dicom.TS_JPEG_LS)[i % 3]  # .80 decodes natively in-loader (r4)
        dicom.dcmwrite_minimal(p, img, transfer_syntax=ts)
        paths.append(p)
        labels.append(i)
        arrays.append(img)
    bad = str(tmp_path / "corrupt.dcm")
    open(bad, "wb").write(b"\x00" * 200)
    paths.append(bad)
    labels.append(99)

    out_hw = (16, 16)
    got = {}
    loader = nl.NativeBatchLoader(paths, labels, batch_size=2, out_hw=out_hw,
                                  n_workers=2)
    for data, labs, ok in loader:
        for d, l, o in zip(data, labs, ok):
            if o:
                got[int(l)] = d.copy()
    loader.close()
    assert sorted(got) == [0, 1, 2, 3, 4]  # J2K rescued, corrupt skipped
    for i, img in enumerate(arrays):
        # f32-cast BEFORE the normalize divide, like both decode paths
        expect = nl._box_resize(img.astype(np.float64), out_hw)
        expect /= np.float32(max(float(expect.max()), 1e-8))
        np.testing.assert_array_equal(
            got[i], expect, err_msg=f"item {i} ({'J2K' if i % 2 else 'SV1'})")


def test_graceful_skip(tmp_path, dicom_files, rng):
    paths, labels, _ = dicom_files
    bad = str(tmp_path / "bad.dcm")
    with open(bad, "wb") as f:
        f.write(b"not a dicom at all")
    loader = nl.NativeBatchLoader(paths[:2] + [bad], labels[:2] + [1],
                                  batch_size=3, out_hw=(8, 8))
    data, lab, ok = next(iter(loader))
    loader.close()
    assert ok.tolist() == [True, True, False]
    assert lab[2] == -1
