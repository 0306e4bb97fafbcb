"""ctypes binding for the native C++ loader (native/dtloader.cpp).

Builds the shared library on first use (cached next to the source; override
the location with $DINO_TPU_NATIVE_DIR) and falls back to None when a
toolchain or libjpeg is unavailable — callers keep the PIL path.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

_lock = threading.Lock()
_lib = None
_tried = False


def _native_dir() -> str:
    default = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "native")
    return os.environ.get("DINO_TPU_NATIVE_DIR", default)


def _cpu_tag() -> str:
    """Cache tag keyed on actual CPU capability (shared with the XLA
    compile cache — see utils/hostcpu.py for why hostname is not enough)."""
    from dino_tpu.utils.hostcpu import cpu_tag
    return cpu_tag()


def _build(src_dir: str) -> Optional[str]:
    # -march=native makes the binary CPU-specific: key the cache per CPU
    # capability so a shared checkout (NFS home, multi-host jobs) never
    # executes an .so built for a different CPU (SIGILL mid-epoch otherwise)
    so = os.path.join(src_dir, f"libdtloader.{_cpu_tag()}.so")
    src = os.path.join(src_dir, "dtloader.cpp")
    if os.path.exists(so) and os.path.getmtime(so) >= os.path.getmtime(src):
        return so
    # build to a process-private temp name and rename atomically: another
    # process racing get_lib() must never dlopen a half-written .so.  Other
    # tags are deliberately NOT pruned — in a heterogeneous shared checkout
    # each CPU generation keeps its own cached build (pruning would make
    # every generation evict the others' cache on every job start); stale
    # files are bounded by the number of distinct CPU generations.
    tmp = f"{so}.build.{os.getpid()}"
    try:
        # -ffp-contract=off: GCC's default 'fast' contraction fuses
        # mul+add into fma ACROSS statements, silently changing f32
        # last-ulp results — the jitter chain's bit-exactness contract
        # (vs the numpy oracle, which never contracts) depends on plain
        # two-rounding ops (no deliberate fusions remain in the file).
        subprocess.run(
            ["g++", "-O3", "-march=native", "-funroll-loops",
             "-ffp-contract=off", "-fPIC",
             "-shared", "-std=c++17", "-o", tmp, src, "-ljpeg", "-lpthread"],
            check=True, capture_output=True, timeout=120)
        os.replace(tmp, so)
    except Exception:
        try:
            os.remove(tmp)
        except OSError:
            pass
        return None
    return so


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if os.environ.get("DINO_TPU_NO_NATIVE") == "1":
            return None
        src_dir = _native_dir()
        if not os.path.exists(os.path.join(src_dir, "dtloader.cpp")):
            return None
        so = _build(src_dir)
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None
        lib.dt_decode_jpeg_file.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.c_int, ctypes.c_int]
        lib.dt_decode_jpeg_file.restype = ctypes.c_int
        lib.dt_decode_resize_file.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8)]
        lib.dt_decode_resize_file.restype = ctypes.c_int
        lib.dt_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int]
        lib.dt_load_batch.restype = ctypes.c_int
        lib.dt_jpeg_dims.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
        lib.dt_jpeg_dims.restype = ctypes.c_int
        lib.dt_decode_jpeg_mem.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_longlong,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int]
        lib.dt_decode_jpeg_mem.restype = ctypes.c_int
        lib.dt_decode_resize_mem.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_longlong,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8)]
        lib.dt_decode_resize_mem.restype = ctypes.c_int
        lib.dt_augment_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int]
        lib.dt_augment_batch.restype = ctypes.c_int
        lib.dt_dino_crops_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int]
        lib.dt_dino_crops_batch.restype = ctypes.c_int
        lib.dt_warp_affine_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint8)]
        lib.dt_warp_affine_u8.restype = None
        lib.dt_warp_affine_i32.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_int32)]
        lib.dt_warp_affine_i32.restype = None
        lib.dt_gaussian_blur_u8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.c_int]
        lib.dt_gaussian_blur_u8.restype = None
        _lib = lib
        return _lib


def decode_resize(path: str, out_h: int, out_w: int) -> Optional[np.ndarray]:
    """Decode + resize one JPEG natively; None on any failure."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.empty((out_h, out_w, 3), np.uint8)
    rc = lib.dt_decode_resize_file(
        path.encode(), out_h, out_w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out if rc == 0 else None


def decode(path: str, max_h: int = 4096, max_w: int = 4096
           ) -> Optional[np.ndarray]:
    """Decode one JPEG at full resolution; None on failure."""
    lib = get_lib()
    if lib is None:
        return None
    buf = np.empty(max_h * max_w * 3, np.uint8)  # C side writes packed rows
    h, w = ctypes.c_int(), ctypes.c_int()
    rc = lib.dt_decode_jpeg_file(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.byref(h), ctypes.byref(w), max_h, max_w)
    if rc != 0:
        return None
    return buf[:h.value * w.value * 3].reshape(h.value, w.value, 3).copy()


def _jpeg_dims_checked(lib, data: bytes, max_h: int, max_w: int):
    """(h, w, src_ptr) of in-memory JPEG bytes, or None — rejecting
    non-JPEG bodies AND decompression bombs (a few-KB solid-color JPEG
    can declare a 65000x65000 frame whose decode commits tens of GB; the
    header-only parse costs microseconds and gates the malloc)."""
    if lib is None or len(data) < 4 or data[:2] != b"\xff\xd8":
        return None  # not a JPEG (PNG etc. keep the PIL path)
    buf = np.frombuffer(data, np.uint8)
    src = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    h, w = ctypes.c_int(), ctypes.c_int()
    if lib.dt_jpeg_dims(src, len(data), ctypes.byref(h),
                        ctypes.byref(w)) != 0:
        return None
    if not (0 < h.value <= max_h and 0 < w.value <= max_w):
        return None  # dimension bomb / corrupt header
    return h.value, w.value, src


def decode_bytes(data: bytes, max_h: int = 4096,
                 max_w: int = 4096) -> Optional[np.ndarray]:
    """Decode in-memory JPEG bytes (a dt-serve request body) natively;
    None on any failure or when the declared frame exceeds max_h x max_w
    (the same bomb cap as :func:`decode`; callers fall back to PIL, whose
    own MAX_IMAGE_PIXELS guard then applies).  Both native calls release
    the GIL, so concurrent server request threads decode on real
    parallel cores."""
    lib = get_lib()
    dims = _jpeg_dims_checked(lib, data, max_h, max_w)
    if dims is None:
        return None
    h, w, src = dims
    out = np.empty((h, w, 3), np.uint8)
    rc = lib.dt_decode_jpeg_mem(
        src, len(data), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, w)
    return out if rc == 0 else None


def decode_resize_bytes(data: bytes, out_h: int, out_w: int,
                        max_h: int = 4096,
                        max_w: int = 4096) -> Optional[np.ndarray]:
    """Decode + bilinear-resize in-memory JPEG bytes natively; None on
    failure or oversized declared dimensions (bomb cap — the C side
    mallocs the full decoded frame before resizing)."""
    lib = get_lib()
    if _jpeg_dims_checked(lib, data, max_h, max_w) is None:
        return None
    buf = np.frombuffer(data, np.uint8)
    out = np.empty((out_h, out_w, 3), np.uint8)
    rc = lib.dt_decode_resize_mem(
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(data),
        out_h, out_w, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out if rc == 0 else None


def augment_batch(paths: List[str], masks: List[np.ndarray], res: int,
                  params: np.ndarray, n_threads: int = 0):
    """Full training-augmentation batch on the C++ thread pool.

    ``params`` is (n, PARAMS_LEN) float32 from data.augment.pack_params (all
    randomness drawn in Python).  Returns (imgs u8 (n,res,res,3), masks i32
    (n,res,res)) or None on any failure (caller falls back to cv2).
    """
    lib = get_lib()
    if lib is None or not paths:
        return None
    n = len(paths)
    params = np.ascontiguousarray(params, np.float32)
    assert params.shape == (n, 24), params.shape
    masks = [np.ascontiguousarray(m, np.int32) for m in masks]
    out_imgs = np.empty((n, res, res, 3), np.uint8)
    out_masks = np.empty((n, res, res), np.int32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    mptrs = (ctypes.POINTER(ctypes.c_int32) * n)(
        *[m.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)) for m in masks])
    mh = (ctypes.c_int * n)(*[m.shape[0] for m in masks])
    mw = (ctypes.c_int * n)(*[m.shape[1] for m in masks])
    n_threads = n_threads or min(n, os.cpu_count() or 1)
    failures = lib.dt_augment_batch(
        arr, n, res, params.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        mptrs, mh, mw,
        out_imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out_masks.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n_threads)
    return (out_imgs, out_masks) if failures == 0 else None


def dino_crops_batch(paths: List[str], params: np.ndarray, n_local: int,
                     g_size: int, l_size: int, n_threads: int = 0):
    """DINO multi-crop batch on the C++ thread pool (decode each JPEG once,
    all 2 + n_local crops per image off the GIL).

    ``params`` is (n, 2 + n_local, 20) float32 from
    train.dino_pretrain.pack_dino_params (all randomness drawn in Python).
    Returns (g_crops u8 (2, n, g, g, 3), l_crops u8 (n_local, n, l, l, 3))
    or None on any failure (caller falls back to the cv2 path)."""
    lib = get_lib()
    if lib is None or not paths:
        return None
    n = len(paths)
    params = np.ascontiguousarray(params, np.float32)
    assert params.shape == (n, 2 + n_local, 20), params.shape
    out_g = np.empty((2, n, g_size, g_size, 3), np.uint8)
    out_l = np.empty((n_local, n, l_size, l_size, 3), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    n_threads = n_threads or min(n, os.cpu_count() or 1)
    failures = lib.dt_dino_crops_batch(
        arr, n, n_local, g_size, l_size,
        params.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_g.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out_l.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n_threads)
    return (out_g, out_l) if failures == 0 else None


def load_batch(paths: List[str], out_h: int, out_w: int,
               n_threads: int = 0) -> Optional[np.ndarray]:
    """Decode + resize a batch with the C++ thread pool; None on failure."""
    lib = get_lib()
    if lib is None or not paths:
        return None
    n = len(paths)
    out = np.empty((n, out_h, out_w, 3), np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    n_threads = n_threads or min(n, os.cpu_count() or 1)
    failures = lib.dt_load_batch(
        arr, n, out_h, out_w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n_threads)
    return out if failures == 0 else None


def warp_affine(img: np.ndarray, M, size: int) -> Optional[np.ndarray]:
    """Bilinear reflect-101 warp via the native recipe implementation
    (bit-identical to data/augment.py:warp_affine_u8's numpy definition);
    None when the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.uint8)
    m = np.ascontiguousarray(np.asarray(M, np.float32).ravel())
    out = np.empty((size, size, 3), np.uint8)
    lib.dt_warp_affine_u8(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        img.shape[0], img.shape[1], size,
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out


def warp_affine_nearest(mask: np.ndarray, M, size: int
                        ) -> Optional[np.ndarray]:
    """Nearest reflect-101 warp of an int32 mask via the native recipe;
    None when the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    mask = np.ascontiguousarray(mask, np.int32)
    m = np.ascontiguousarray(np.asarray(M, np.float32).ravel())
    out = np.empty((size, size), np.int32)
    lib.dt_warp_affine_i32(
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        mask.shape[0], mask.shape[1], size,
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out


def gaussian_blur(img: np.ndarray, k: int) -> Optional[np.ndarray]:
    """In-place-free native Gaussian blur (the exact dyadic-tap recipe,
    sigma=0 path — bit-identical to the numpy definition in
    data/augment.py:gaussian_blur_u8); None when the library is
    unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    out = np.ascontiguousarray(img, np.uint8).copy()
    lib.dt_gaussian_blur_u8(
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        out.shape[0], out.shape[1], int(k))
    return out
