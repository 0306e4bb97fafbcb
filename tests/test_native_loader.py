"""Native C++ loader: builds, decodes exactly like PIL, resizes exactly like
the Python/cv2 path, batch API works, dataset integration is identical."""
import os

import numpy as np
import pytest
from PIL import Image

from dino_tpu.data import native_loader
from dino_tpu.data.augment import resize_pair


@pytest.fixture(scope="module")
def jpegs(tmp_path_factory):
    d = tmp_path_factory.mktemp("jpegs")
    rs = np.random.RandomState(0)
    paths = []
    for i, (h, w) in enumerate([(96, 128), (64, 64), (200, 150)]):
        img = rs.randint(0, 255, (h, w, 3), np.uint8)
        p = str(d / f"im{i}.jpg")
        Image.fromarray(img).save(p, quality=92)
        paths.append(p)
    return paths


@pytest.fixture(scope="module")
def lib():
    lib = native_loader.get_lib()
    if lib is None:
        pytest.skip("native loader unavailable (no g++/libjpeg)")
    return lib


def test_decode_matches_pil(jpegs, lib):
    for p in jpegs:
        ours = native_loader.decode(p)
        ref = np.array(Image.open(p).convert("RGB"))
        assert ours is not None
        np.testing.assert_array_equal(ours, ref)


def test_decode_bytes_matches_pil(jpegs, lib):
    """In-memory decode (the dt-serve request-body path): byte-identical to
    PIL's decode of the same JPEG (both are libjpeg underneath)."""
    for p in jpegs:
        with open(p, "rb") as f:
            data = f.read()
        ours = native_loader.decode_bytes(data)
        assert ours is not None
        ref = np.array(Image.open(p).convert("RGB"))
        np.testing.assert_array_equal(ours, ref)
        # file-path decode goes through the same mem-source implementation
        np.testing.assert_array_equal(ours, native_loader.decode(p))


def test_decode_bytes_rejects_non_jpeg(lib):
    """PNG/garbage bodies return None (caller keeps the PIL path)."""
    import io
    buf = io.BytesIO()
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(buf, format="PNG")
    assert native_loader.decode_bytes(buf.getvalue()) is None
    assert native_loader.decode_bytes(b"\xff\xd8garbage") is None
    assert native_loader.decode_bytes(b"") is None


def test_decode_bytes_rejects_dimension_bombs(lib):
    """The header-only dims gate rejects frames above the cap BEFORE any
    full-frame malloc (a few-KB JPEG can declare a 65000x65000 frame whose
    decode would commit tens of GB — the dt-serve request-body path must
    never allocate for it)."""
    import io
    buf = io.BytesIO()
    Image.fromarray(np.zeros((64, 48, 3), np.uint8)).save(buf,
                                                          format="JPEG")
    data = buf.getvalue()
    assert native_loader.decode_bytes(data) is not None
    # the same frame with a cap below its declared dims is refused
    assert native_loader.decode_bytes(data, max_h=32) is None
    assert native_loader.decode_bytes(data, max_w=32) is None
    assert native_loader.decode_resize_bytes(data, 16, 16, max_h=32) is None
    assert native_loader.decode_resize_bytes(data, 16, 16) is not None


def test_decode_resize_bytes_matches_file_path(jpegs, lib):
    for p in jpegs:
        with open(p, "rb") as f:
            data = f.read()
        ours = native_loader.decode_resize_bytes(data, 64, 64)
        assert ours is not None
        np.testing.assert_array_equal(ours,
                                      native_loader.decode_resize(p, 64, 64))


def test_decode_resize_matches_python_path(jpegs, lib):
    for p in jpegs:
        ours = native_loader.decode_resize(p, 64, 64)
        ref_img = np.array(Image.open(p).convert("RGB"))
        ref, _ = resize_pair(ref_img, None, 64)
        assert ours is not None
        # fused C++ resize vs cv2: identical half-pixel bilinear + rounding;
        # allow 1 LSB for cv2's fixed-point arithmetic
        diff = np.abs(ours.astype(int) - ref.astype(int))
        assert diff.max() <= 1, diff.max()
        assert (diff > 0).mean() < 0.25  # cv2 fixed-point rounding boundaries


def test_load_batch(jpegs, lib):
    batch = native_loader.load_batch(jpegs, 48, 48, n_threads=2)
    assert batch is not None and batch.shape == (3, 48, 48, 3)
    one = native_loader.decode_resize(jpegs[1], 48, 48)
    np.testing.assert_array_equal(batch[1], one)


def test_load_batch_failure_returns_none(jpegs, lib):
    assert native_loader.load_batch(jpegs + ["/missing.jpg"], 48, 48) is None


def test_dataset_uses_native(tmp_path, lib):
    from dino_tpu.data.dataset import DuckieSegDataset
    os.makedirs(tmp_path / "JPEGImages")
    os.makedirs(tmp_path / "SegmentationClass")
    rs = np.random.RandomState(0)
    img = rs.randint(0, 255, (100, 100, 3), np.uint8)
    Image.fromarray(img).save(tmp_path / "JPEGImages" / "a.jpg", quality=95)
    np.save(tmp_path / "SegmentationClass" / "a.npy",
            rs.randint(0, 3, (100, 100)))
    ds = DuckieSegDataset(str(tmp_path), augmented=False, resolution=64)
    x_native, m_native = ds[0]
    os.environ["DINO_TPU_NO_NATIVE"] = "1"
    native_loader._tried, native_loader._lib = False, None
    try:
        x_py, m_py = ds[0]
    finally:
        del os.environ["DINO_TPU_NO_NATIVE"]
        native_loader._tried, native_loader._lib = False, None
    np.testing.assert_array_equal(m_native, m_py)
    assert np.abs(x_native.astype(int) - x_py.astype(int)).max() <= 1


def test_batched_loader_native_path_matches_python(tmp_path, lib):
    """Eval batches via the C++ batch loader == the per-item Python path."""
    from dino_tpu.data.dataset import DuckieSegDataset, batched_loader
    os.makedirs(tmp_path / "JPEGImages")
    os.makedirs(tmp_path / "SegmentationClass")
    rs = np.random.RandomState(0)
    for i in range(5):
        Image.fromarray(rs.randint(0, 255, (90, 110, 3), np.uint8)).save(
            tmp_path / "JPEGImages" / f"x{i}.jpg", quality=95)
        np.save(tmp_path / "SegmentationClass" / f"x{i}.npy",
                rs.randint(0, 3, (90, 110)))
    ds = DuckieSegDataset(str(tmp_path), augmented=False, resolution=64)
    idx = np.arange(5)
    native_batches = list(batched_loader(ds, idx, batch_size=2))
    os.environ["DINO_TPU_NO_NATIVE"] = "1"
    native_loader._tried, native_loader._lib = False, None
    try:
        py_batches = list(batched_loader(ds, idx, batch_size=2))
    finally:
        del os.environ["DINO_TPU_NO_NATIVE"]
        native_loader._tried, native_loader._lib = False, None
    assert len(native_batches) == len(py_batches) == 3
    for (nx, ny), (px, py) in zip(native_batches, py_batches):
        np.testing.assert_array_equal(ny, py)
        assert np.abs(nx.astype(int) - px.astype(int)).max() <= 1
