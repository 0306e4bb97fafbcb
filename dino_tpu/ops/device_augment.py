"""Training augmentations ON DEVICE: the albumentations-equivalent pipeline
(reference pl_torch_modules.py:44-57) as one jitted XLA program, except the
rotation warp, which is staged on the host (rationale below).

Third backend next to the cv2 and native-C++ host pipelines (data/augment.py
contract): randomness is still drawn on the host (`draw_params` /
`pack_params` — the SAME packed float32[24] layout the C++ pipeline
consumes); RandomResizedCrop, HFlip, ColorJitter and GaussianBlur run inside
one vmapped device program built ENTIRELY of MXU/VPU-friendly ops — the
geometry as banded-matrix resampling matmuls, the blur as banded matmuls,
the jitter as fused elementwise chains; no per-pixel gather anywhere
(gathers are the one thing TPUs run poorly: the first cut's gather-based
warp measured ~10x the rest of the program combined).  ShiftScaleRotate —
inherently a 2-D gather — is therefore staged on the HOST through the
exact-f32 warp recipe (bit-identical on every backend, round 5) for the
25% of samples whose affine fires
(data/augment.py:prepare_device_batch), and the token-grid mask labels are
composed nearest gathers on the host (:func:`augment_grid_mask`).  The
host's per-sample work drops to decode+resize (+ the occasional warp),
which matters exactly where training is host-bound: the train step is
~2 ms/sample while the host augment chain is ~16 ms/core-sample (PERF.md
"Host pipeline"), so on few-core hosts the augmentation, not the chip,
caps unfrozen-finetune throughput.

Numerics contract (enforced by tests/test_device_augment.py): geometry
follows cv2's coordinate conventions (half-pixel bilinear with clamped
taps; torchvision floor-nearest for masks) in float math with
round-half-up between stages — images match the cv2 oracle to the same
tolerance class as the native C++ backend (MAD < 2.5 levels, mask
agreement > 97% for crop-resample ties); affine samples are recipe-exact
by construction on BOTH streams (pixels via the host staging, grid
labels via the composed recipe index map — equality-tested); flip is
bit-exact; blur is bit-exact for k <= 9 and off-by-<=1 beyond (cv2's own
taps, see ``_gaussian_taps``).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from dino_tpu.ops.resize import nearest_resize_indices

MAX_BLUR = 41  # albumentations blur_limit upper bound (static tap count)

# cv2's sigma=0 Gaussian taps are NOT the textbook formula for small
# kernels: getGaussianKernel(k, 0) returns hardcoded binomial-style tables
# for k <= 7 and an 8-bit fixed-point quantization (round(g*256)/256) at
# k = 9 (OpenCV's bit-exact u8 path); only k >= 11 follows
# sigma = 0.3((k-1)/2 - 1) + 0.8 in floats.  Deriving taps from the plain
# formula alone was measured up to ~6 levels off the oracle at k=3 hard
# edges.  The ladder below reproduces cv2 5.0's taps exactly (tables,
# quantization, formula — verified against getGaussianKernel to <1e-16 for
# every odd k in 3..41) and is used UNCONDITIONALLY: asking the installed
# cv2 at trace time would silently re-derive different taps on OpenCV
# builds whose getGaussianKernel(9, 0) is not /256-quantized even though
# their u8 GaussianBlur path quantizes internally — breaking the k <= 9
# bit-exactness contract precisely when it matters.
_SMALL_GAUSSIAN_TAB = {
    3: [0.25, 0.5, 0.25],
    5: [0.0625, 0.25, 0.375, 0.25, 0.0625],
    7: [0.03125, 0.109375, 0.21875, 0.28125, 0.21875, 0.109375, 0.03125],
}


def _gaussian_taps(k: int) -> np.ndarray:
    """GaussianBlur(k, sigma=0) taps (float64, sum 1) for the augment
    chain, derived locally (see ladder rationale above); odd k only.

    Round 5: the /256 fixed-point quantization cv2 applies at k = 9 is
    extended to EVERY k >= 9, making the whole blur an exact recipe: all
    taps become dyadic rationals q/256, so every product u8*tap and every
    partial sum in both separable passes is an exactly-representable f32
    value (final-pass magnitudes peak at 255*65536 < 2^24) — the result
    is independent of accumulation order, hence BIT-IDENTICAL across the
    numpy, C++, and XLA-matmul implementations with no arithmetic pinning
    at all.  k <= 9 keeps cv2's own values (tables are dyadic too, so the
    same exactness argument applies — that is why k <= 9 was already
    cross-backend bit-exact); k >= 11 now deviates from cv2's float-tap
    output by the quantization instead of each backend deviating
    differently (off-by-<=1, pinned in tests/test_native_augment.py)."""
    if k <= 7:
        return np.asarray(_SMALL_GAUSSIAN_TAB[k], np.float64)
    s = 0.3 * ((k - 1) * 0.5 - 1.0) + 0.8
    x = np.arange(k, dtype=np.float64) - (k - 1) / 2
    g = np.exp(-x * x / (2 * s * s))
    g /= g.sum()
    # /256 fixed point for every k >= 9 (cv2's own treatment at k = 9)
    q = np.floor(g * 256 + 0.5)
    q[k // 2] += 256 - q.sum()
    return q / 256


@functools.lru_cache(maxsize=1)
def _blur_taps_table() -> np.ndarray:
    """(20, MAX_BLUR) float32: row (k-3)//2 holds the cv2 taps for odd
    kernel size k, centered in the static MAX_BLUR window (zeros beyond)."""
    ks = range(3, MAX_BLUR + 1, 2)
    tab = np.zeros(((MAX_BLUR - 3) // 2 + 1, MAX_BLUR), np.float64)
    for i, k in enumerate(ks):
        t = _gaussian_taps(k)
        lo = (MAX_BLUR - k) // 2
        tab[i, lo:lo + k] = t / t.sum()
    return tab.astype(np.float32)


# ---------------------------------------------------------------------------
# sampling helpers (per-sample; everything static-shaped)
# ---------------------------------------------------------------------------

def _round_u8(x):
    return jnp.clip(jnp.floor(x + 0.5), 0.0, 255.0)


# ---------------------------------------------------------------------------
# per-op implementations
# ---------------------------------------------------------------------------

def _resample_matrix(f, s: int):
    """(S,) float source coords -> (S, S) two-tap bilinear resampling
    matrix, built with comparisons (TPU scatters are slow; a dense mask
    compare is vectorized VPU work and the result feeds the MXU)."""
    i0 = jnp.floor(f)
    t = (f - i0)[:, None]
    cols = jnp.arange(s, dtype=jnp.float32)[None, :]
    lo = jnp.clip(i0, 0, s - 1)[:, None]
    hi = jnp.clip(i0 + 1, 0, s - 1)[:, None]
    return ((cols == lo) * (1.0 - t) + (cols == hi) * t).astype(jnp.float32)


def _crop_resize(img, p):
    """RandomResizedCrop: crop (x0,y0,cw,ch) then resize back to S x S —
    cv2.resize semantics on the crop (half-pixel bilinear, clamped taps).
    The coordinates are separable (rows depend on i only, columns on j
    only), so the whole op is two banded matmuls — MXU work, vs a
    per-pixel 2-D gather which measured ~21 ms/batch16 on TPU
    (PERF.md "Device-side augmentation")."""
    s = img.shape[0]
    on = p[0] > 0.5
    x0, y0, cw, ch = p[1], p[2], p[3], p[4]
    d = jnp.arange(s, dtype=jnp.float32)
    # image: src = (dst + .5) * c/s - .5, clamped WITHIN the crop, + offset
    fy = jnp.clip((d + 0.5) * ch / s - 0.5, 0.0, ch - 1.0) + y0
    fx = jnp.clip((d + 0.5) * cw / s - 0.5, 0.0, cw - 1.0) + x0
    fy = jnp.where(on, fy, d)
    fx = jnp.where(on, fx, d)
    wy = _resample_matrix(fy, s)
    wx = _resample_matrix(fx, s)
    out = jnp.einsum("ip,pjc->ijc", wy, img,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    out = jnp.einsum("jq,iqc->ijc", wx, out,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    return _round_u8(out)


def _floordiv_exact_f32(num, den):
    """floor(num / den) EXACTLY for int32 operands whose values fit f32
    integers (num < 2^24, q*den < 2^31): one f32 division (fast VPU op)
    plus a branchless integer fixup.  Correctly-rounded f32 division of
    exact operands errs < 1 ulp, so the floored quotient is off by at
    most 1 either way — the two compare-adds repair it exactly (asserted
    over the whole u8 domain in tests/test_device_augment.py).  Replaces
    ``//`` because XLA lowers int32 division to a slow scalarized path on
    the VPU — measured 31% of the whole augment program (round 5,
    tools/ablate_device_jitter.py)."""
    q = jnp.floor(num.astype(jnp.float32)
                  / den.astype(jnp.float32)).astype(jnp.int32)
    r = num - q * den
    q = q + (r >= den).astype(jnp.int32)
    return q - (r < 0).astype(jnp.int32)


def _rgb_to_hsv_u8(x_u8f):
    """cv2 RGB2HSV u8 integer path on float-held u8 values (S,S,3) ->
    (h, s, v) int32 arrays.  The div tables are computed ARITHMETICALLY
    per pixel — sdiv[v] = round((255<<12)/v) == (2*1044480 + v)//(2*v),
    verified equal to the float64 tables for every v (round-half-up
    never lands on the half-even tie for these numerators) — because a
    per-pixel 256-entry ``jnp.take`` is a real gather on TPU and gathers
    are the one op TPUs run poorly (measured ~170x on this op).  The
    divisions themselves run as f32-with-exact-fixup
    (:func:`_floordiv_exact_f32` — same values, 0.49 -> 0.34 ms/sample).
    All products fit int32 (diff*sdiv <= 2^28)."""
    xi = x_u8f.astype(jnp.int32)
    r, g, b = xi[..., 0], xi[..., 1], xi[..., 2]
    v = jnp.max(xi, axis=-1)
    diff = v - jnp.min(xi, axis=-1)
    vs = jnp.maximum(v, 1)
    sdiv = jnp.where(v == 0, 0, _floordiv_exact_f32(2 * 1044480 + vs,
                                                    2 * vs))
    s = (diff * sdiv + (1 << 11)) >> 12
    ds = jnp.maximum(diff, 1)
    hdiv = jnp.where(diff == 0, 0, _floordiv_exact_f32(2 * 122880 + ds,
                                                       2 * ds))
    h = jnp.where(v == r, g - b,
                  jnp.where(v == g, b - r + 2 * diff, r - g + 4 * diff))
    h = (h * hdiv + (1 << 11)) >> 12
    return jnp.where(h < 0, h + 180, h), s, v


def _opaque_zero(x):
    """int32 0 that XLA cannot constant-fold (it is derived from runtime
    data — isnan of an image/factor value, always false here).  Needed
    because `lax.optimization_barrier` and plain bitcast round-trips are
    simplified away before codegen, where XLA:CPU's LLVM contracts a mul
    feeding an add/sub into an fma (measured; TPU performs true
    two-rounding f32 and matches numpy with no help)."""
    return jnp.isnan(jax.lax.reshape(x, (x.size,))[0]).astype(jnp.int32)


def _rounded(x, z):
    """Pin a multiply's ROUNDED f32 value against fma contraction: xor the
    bit pattern with a runtime zero (``z`` from :func:`_opaque_zero`) —
    an integer op codegen cannot contract through — and bitcast back.
    Only needed where the product is inexact AND feeds an add/sub; exact
    products (masks, 12-bit split halves) give the same answer fused or
    not and stay pin-free for fusion."""
    xi = jax.lax.bitcast_convert_type(x, jnp.int32) ^ z
    return jax.lax.bitcast_convert_type(xi, jnp.float32)


def _hsv_to_rgb_u8(h, s, v, z):
    """cv2-shaped HSV2RGB u8: f32 sector math with plain TWO-ROUNDING
    1-s*f terms and truncating output — bit-equal to the host recipe
    (data/augment.py:hsv_to_rgb_u8; every inexact product feeding an
    add/sub is pinned with ``z``).  Returns float-held u8 (S,S,3)."""
    ft = jnp.float32
    # hf feeds a subtract and the s-products feed (1 - .): pin them
    hf = _rounded(h.astype(ft) * ft(6.0 / 180.0), z)
    sf = _rounded(s.astype(ft) * ft(1.0 / 255.0), z)
    vf = v.astype(ft) * ft(1.0 / 255.0)   # feeds only muls: safe
    sector = jnp.floor(hf).astype(jnp.int32)
    f = hf - sector.astype(ft)
    sector = sector % 6
    one = ft(1.0)
    tabs = [vf, vf * (one - sf),
            vf * (one - _rounded(sf * f, z)),
            vf * (one - _rounded(sf * (one - f), z))]
    rsel = [0, 2, 1, 1, 3, 0]
    gsel = [3, 0, 0, 2, 1, 1]
    bsel = [1, 1, 3, 0, 0, 2]
    # branch by SELECTS, not gathers: six compare-masks per channel are
    # pure VPU work where a per-pixel take_along_axis is a TPU gather
    out = jnp.stack([
        sum(jnp.where(sector == k, tabs[sel[k]], ft(0.0)) for k in range(6))
        for sel in (rsel, gsel, bsel)], axis=-1) * ft(255.0)
    return jnp.floor(out)


def _trunc_u8(x):
    """float -> uint8 value range the way numpy's .astype(np.uint8) does
    after a clip: truncation, NOT rounding (the cv2 oracle's conversions,
    data/augment.py:_apply_jitter)."""
    return jnp.clip(jnp.floor(x), 0.0, 255.0)


def _cv2_gray_u8(x_u8):
    """cv2 RGB2GRAY on uint8: IPP's shift-15 fixed point
    (9798, 19235, 3735)/32768 with round-half-up descale — the recipe
    exhaustively verified bit-equal to this cv2 build over all 16.7M RGB
    triples (data/augment.py:gray_u8; it replaced the classic 4899/9617/
    1868 shift-14 formula, which this build's IPP path does NOT use —
    ~0.3% of pixels sat one level off).  Integer ops in int32: every
    partial product <= 255*19235 < 2^23."""
    xi = x_u8.astype(jnp.int32)
    return ((xi[..., 0] * 9798 + xi[..., 1] * 19235 + xi[..., 2] * 3735
             + 16384) >> 15).astype(jnp.float32)


def _jitter(img, p):
    """ColorJitter, BIT-EXACT vs the host oracle (data/augment.py
    _apply_jitter, round 4): every op is the same single-rounded f32 op
    (XLA does not contract independent mul/add HLOs to fma) or exact
    integer arithmetic — brightness scale, contrast toward the exact
    integer-split mean gray, saturation toward the per-pixel fx15 gray,
    hue through cv2's integer RGB2HSV and two-rounding f32 HSV2RGB;
    clip after each op, uint8 conversions truncate.  Asserted bit-equal
    in tests/test_device_augment.py."""
    on = p[13] > 0.5
    order = p[14:18].astype(jnp.int32)
    b, c, s_, hshift = p[18], p[19], p[20], p[21]
    one = jnp.float32(1.0)
    z = _opaque_zero(p)   # runtime zero for the rounding pins

    def op_brightness(x):
        return x * b

    def op_contrast(x):
        # integer-exact mean, split q + fl32(r/n): the int32 gray sum is
        # exact (<= 480*480*255 < 2^31) and both addends are exactly
        # representable in f32 — identical to the oracle's divmod split
        g = _cv2_gray_u8(_trunc_u8(x)).astype(jnp.int32)
        n = g.size
        q, r = jnp.divmod(jnp.sum(g), n)
        gray = q.astype(jnp.float32) + (r.astype(jnp.float32)
                                        / jnp.float32(n))
        # both products are pinned: the blend is mul, ROUND, add —
        # numpy's (uncontracted) semantics
        add = _rounded(gray * (one - c), z)
        return _rounded(x * c, z) + add

    def op_saturation(x):
        gray = _cv2_gray_u8(_trunc_u8(x))
        gy = _rounded(gray * (one - s_), z)
        return _rounded(x * s_, z) + gy[..., None]

    def op_hue(x):
        h, sat, v = _rgb_to_hsv_u8(_trunc_u8(x))
        shift = jnp.round(hshift * jnp.float32(180.0)).astype(jnp.int32)
        h = jnp.mod(h + shift, 180)
        return _hsv_to_rgb_u8(h, sat, v, z)

    # unrolled (vs lax.scan): the scan boundary blocks XLA from fusing the
    # elementwise chains between steps
    jittered = img
    for step in range(4):
        jittered = jax.lax.switch(order[step],
                                  [op_brightness, op_contrast,
                                   op_saturation, op_hue], jittered)
        jittered = jnp.clip(jittered, 0.0, 255.0)
    return jnp.where(on, _trunc_u8(jittered), img)


def _blur(img, p):
    """GaussianBlur(k, sigmaX=0) with cv2's actual taps (small-kernel
    tables / fixed-point / formula ladder — see ``_gaussian_taps``) and
    reflect-101 borders; the (20, MAX_BLUR) taps table is baked into the
    program as a constant and the drawn k selects its row, so every kernel
    size matches the oracle's taps exactly (zeros beyond the drawn k).

    Each pass is a banded (S, S+2pad) matmul built from the 41 taps — MXU
    work — instead of gathering (S, 41, S, C) tap windows (HBM-bound); the
    matmul form runs this stage at ~0.13 ms/batch16
    (PERF.md "Device-side augmentation")."""
    s = img.shape[0]
    on = p[22] > 0.5
    k = jnp.clip(p[23], 3.0, MAX_BLUR)
    row = jnp.round((k - 3.0) / 2.0).astype(jnp.int32)
    w = jnp.asarray(_blur_taps_table())[row]  # (MAX_BLUR,) exact cv2 taps
    pad = (MAX_BLUR - 1) // 2
    # band[i, p] = w[p - i] for p-i in [0, MAX_BLUR): built with a tiny-table
    # take + compare mask (a scatter here measured ~5.7 ms/batch16 on TPU)
    delta = (jnp.arange(s + 2 * pad)[None, :]
             - jnp.arange(s)[:, None])                      # (S, S+2pad)
    band = jnp.where((delta >= 0) & (delta < MAX_BLUR),
                     jnp.take(w, jnp.clip(delta, 0, MAX_BLUR - 1)), 0.0)
    # numpy/jnp 'reflect' == cv2 BORDER_REFLECT_101 (edge not repeated)
    xp = jnp.pad(img, ((pad, pad), (0, 0), (0, 0)), mode="reflect")
    x = jnp.einsum("ip,phc->ihc", band, xp,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="reflect")
    x = jnp.einsum("jp,hpc->hjc", band, xp,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)
    return jnp.where(on, _round_u8(x), img)


def _augment_one(img_u8, p):
    # no _affine here: the loader pre-applies crop+warp on the HOST (the
    # exact-f32 warp recipe, bit-identical across every backend — round 5)
    # for the 25% of samples whose affine fires
    # and clears their flags (data/augment.py:prepare_device_batch) — the
    # warp's per-pixel gather is the one op TPUs run poorly, ~10x the rest
    # of this program combined (PERF.md "Device-side augmentation")
    x = img_u8.astype(jnp.float32)
    x = _crop_resize(x, p)
    flip = p[12] > 0.5
    x = jnp.where(flip, x[:, ::-1], x)
    x = _jitter(x, p)
    x = _blur(x, p)
    return x.astype(jnp.uint8)


@functools.lru_cache(maxsize=None)
def _augment_fn(size: int):
    @jax.jit
    def run(imgs, params):
        return jax.vmap(_augment_one)(imgs, params)
    return run


def device_augment_batch(imgs_u8, packed_params):
    """(B,S,S,3) u8 + (B,24) packed params -> (B,S,S,3) u8 device array.

    Images only: one compiled program per (S, B), output stays on device
    (the train step consumes it without a host roundtrip).  Masks do NOT
    ride the device path — nearest-of-nearest composes exactly, so the
    token-grid labels come from :func:`augment_grid_mask` on the host at
    negligible cost, and the host->device transfer is just the uint8
    frames (full-res int masks would triple the bytes on the wire).

    PRECONDITION: the batch must come through
    data.augment.prepare_device_batch, which applies the affine warps on
    the host (the exact-f32 warp recipe) and clears their flags — this
    program contains no warp
    (per-pixel gathers are the one op TPUs run poorly).  A packed row with
    its affine flag still set is rejected loudly: silently skipping the
    warp while augment_grid_mask applies it to the labels would
    geometrically misalign pixels and labels.
    """
    packed_params = np.asarray(packed_params, np.float32)
    if packed_params.ndim != 2 or packed_params.shape[1] != 24:
        raise ValueError(f"packed params must be (B, 24); got "
                         f"{packed_params.shape}")
    if np.any(packed_params[:, 5] > 0.5):
        raise ValueError(
            "packed params carry a live affine flag; stage the batch "
            "through data.augment.prepare_device_batch first (the device "
            "program applies no warp)")
    size = int(imgs_u8.shape[1])
    fn = _augment_fn(size)
    return fn(jnp.asarray(imgs_u8), jnp.asarray(packed_params))


# ---------------------------------------------------------------------------
# host-side grid-mask transform (exact composition of the nearest samplings)
# ---------------------------------------------------------------------------

def _reflect101_np(idx, n: int):
    period = 2 * (n - 1)
    idx = np.abs(idx) % period
    return np.where(idx >= n, period - idx, idx)


def augment_grid_mask(mask, p: dict, size: int, grid: int) -> np.ndarray:
    """Token-grid labels for one augmented sample, by composing the nearest
    samplings (grid downsample <- flip <- affine <- crop-resize) into ONE
    gather on the pre-augmentation full-res mask — the affine stage
    composes the exact-f32 warp recipe's index map, so affine samples'
    grid labels are bit-equal to the full-res host pipeline (round 5).

    Nearest-of-nearest is exact: downsampling the device-transformed
    full-res mask to the grid reads transformed[gi, gj], and each transform
    stage is itself an integer-coordinate lookup, so chaining the index
    maps reproduces the full-res pipeline's grid labels bit-for-bit
    (tested against the staged device path).  mask: (size, size) int (the
    resized full-res mask); returns (grid*grid,) int32.
    """
    g = nearest_resize_indices(size, grid)            # grid -> final coords
    ys = np.broadcast_to(g[:, None], (grid, grid)).astype(np.int64)
    xs = np.broadcast_to(g[None, :], (grid, grid)).astype(np.int64)
    if p["flip"]:                                     # final <- pre-flip
        xs = size - 1 - xs
    if p["affine"] is not None:                       # pre-flip <- pre-affine
        # EXACTLY the nearest-warp recipe's index map (round 5): the f32
        # per-op coordinate arithmetic of data/augment.py:warp_affine_mask
        # — so composing it here reproduces the full-res pipeline's grid
        # labels bit-for-bit (tests/test_device_augment.py asserts
        # equality, not agreement)
        from dino_tpu.data.augment import _invert_affine
        f = np.float32
        inv = _invert_affine(np.asarray(p["affine"], np.float32
                                        ).astype(np.float64))
        bx = (f(inv[0, 1]) * ys.astype(f)) + f(inv[0, 2])
        by = (f(inv[1, 1]) * ys.astype(f)) + f(inv[1, 2])
        fx = (f(inv[0, 0]) * xs.astype(f)) + bx
        fy = (f(inv[1, 0]) * xs.astype(f)) + by
        xs = _reflect101_np(np.floor(fx.astype(np.float64) + 0.5
                                     ).astype(np.int64), size)
        ys = _reflect101_np(np.floor(fy.astype(np.float64) + 0.5
                                     ).astype(np.int64), size)
    if p["crop"] is not None:                         # pre-affine <- source
        x0, y0, cw, ch = p["crop"]
        xs = np.clip(np.floor(xs * (cw / size)), 0, max(cw - 1, 0)
                     ).astype(np.int64) + x0
        ys = np.clip(np.floor(ys * (ch / size)), 0, max(ch - 1, 0)
                     ).astype(np.int64) + y0
    return np.asarray(mask)[np.clip(ys, 0, size - 1),
                            np.clip(xs, 0, size - 1)
                            ].reshape(-1).astype(np.int32)
