"""Ablate the device-augment jitter chain on the real chip (round 5).

PERF.md's device-augment table ends at 0.51 ms/sample: the round-4
bit-exact jitter chain cost +0.08 ms over the approximate round-3 one and
was accepted without the per-stage closure every other kernel got.  This
tool measures, inside the same chained-scan harness (data dependency
between iterations so XLA cannot hoist; scalar fetch so the tunnel does
not swamp the number), the full program and surgical ablations of the
exact-HSV hue op — the round-4 addition the 0.08 ms was attributed to:

  * full            — the shipped program, every jitter op firing
  * hue->identity   — op_hue replaced by identity (isolates the whole
                      HSV round-trip)
  * no-int-div      — the two arithmetic round-half-up integer divisions
                      (sdiv/hdiv) replaced by a float division with an
                      exact branchless integer fixup (same values — the
                      candidate optimization if int div dominates)
  * rgb2hsv-only    — hue op stops after the integer RGB2HSV
  * no-pins         — the fma-rounding pins (_rounded xor/bitcast)
                      removed (bounds their cost; NOT exact on CPU)

Usage: python tools/ablate_device_jitter.py [--batch 16] [--size 480]
"""
import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def chained_ms_per_sample(fn, imgs, params, n_iter=30, reps=5):
    """Median ms/sample of fn(imgs, params) chained n_iter times with a
    data dependency (the output u8 image feeds the next iteration)."""
    @jax.jit
    def run(x, p):
        def body(c, _):
            return fn(c, p), None
        out, _ = jax.lax.scan(body, x, None, length=n_iter)
        return out[0, 0, 0, 0]  # scalar fetch only

    x = jnp.asarray(imgs)
    p = jnp.asarray(params)
    # NOTE: fetch with np.asarray — on the tunneled backend
    # block_until_ready can return before execution completes (the same
    # gotcha bench.py documents)
    np.asarray(run(x, p))  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(run(x, p))
        ts.append((time.perf_counter() - t0) / n_iter / imgs.shape[0] * 1e3)
    return float(np.median(ts))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--size", type=int, default=480)
    args = ap.parse_args(argv)

    from dino_tpu.ops import device_augment as da

    rs = np.random.RandomState(0)
    imgs = rs.randint(0, 256, (args.batch, args.size, args.size, 3),
                      np.uint8)
    # params: crop + flip + jitter (hue in the order) + blur k=9 on every
    # sample — the full pipeline with the jitter chain always firing
    from dino_tpu.data.augment import pack_params
    params = np.stack([pack_params({
        "crop": (10, 10, 400, 380), "affine": None, "flip": True,
        "jitter": (np.array([0, 1, 2, 3]), (1.2, 0.9, 1.1, 0.15)),
        "blur": 9}) for _ in range(args.batch)])

    def full(x, p):
        return jax.vmap(da._augment_one)(x, p)

    results = {}
    results["full"] = chained_ms_per_sample(full, imgs, params)

    # --- ablation: hue -> identity -------------------------------------
    orig_hsv_fwd = da._rgb_to_hsv_u8
    orig_hsv_bwd = da._hsv_to_rgb_u8

    def patched(name, fwd=None, bwd=None):
        da._rgb_to_hsv_u8 = fwd or orig_hsv_fwd
        da._hsv_to_rgb_u8 = bwd or orig_hsv_bwd
        try:
            return chained_ms_per_sample(full, imgs, params)
        finally:
            da._rgb_to_hsv_u8 = orig_hsv_fwd
            da._hsv_to_rgb_u8 = orig_hsv_bwd

    results["hue_identity"] = patched(
        "hue_identity",
        fwd=lambda x: (jnp.zeros_like(x[..., 0], jnp.int32),
                       jnp.zeros_like(x[..., 0], jnp.int32),
                       jnp.zeros_like(x[..., 0], jnp.int32)),
        bwd=lambda h, s, v, z: jnp.zeros(h.shape + (3,), jnp.float32))

    # --- ablation: rgb2hsv only (skip the sector-select back-convert) --
    results["rgb2hsv_only"] = patched(
        "rgb2hsv_only",
        bwd=lambda h, s, v, z: (h + s + v).astype(jnp.float32)[..., None]
        * jnp.ones((3,), jnp.float32))

    # --- ablation: integer divisions via f32 division + exact fixup ----
    def fdiv_exact(num, den):
        """floor(num/den) exactly, via f32 divide + branchless fixup."""
        q = jnp.floor(num.astype(jnp.float32)
                      / den.astype(jnp.float32)).astype(jnp.int32)
        r = num - q * den
        q = q + (r >= den).astype(jnp.int32)
        q = q - (r < 0).astype(jnp.int32)
        return q

    def hsv_fwd_fdiv(x_u8f):
        xi = x_u8f.astype(jnp.int32)
        r, g, b = xi[..., 0], xi[..., 1], xi[..., 2]
        v = jnp.max(xi, axis=-1)
        diff = v - jnp.min(xi, axis=-1)
        vs = jnp.maximum(v, 1)
        sdiv = jnp.where(v == 0, 0, fdiv_exact(2 * 1044480 + vs, 2 * vs))
        s = (diff * sdiv + (1 << 11)) >> 12
        ds = jnp.maximum(diff, 1)
        hdiv = jnp.where(diff == 0, 0, fdiv_exact(2 * 122880 + ds, 2 * ds))
        h = jnp.where(v == r, g - b,
                      jnp.where(v == g, b - r + 2 * diff, r - g + 4 * diff))
        h = (h * hdiv + (1 << 11)) >> 12
        return jnp.where(h < 0, h + 180, h), s, v

    # equality check before timing (the fixup must be exact)
    probe = jnp.asarray(rs.randint(0, 256, (64, 64, 3)).astype(np.float32))
    for a, b in zip(orig_hsv_fwd(probe), hsv_fwd_fdiv(probe)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    results["int_div_as_f32div"] = patched("fdiv", fwd=hsv_fwd_fdiv)

    # --- ablation: rounding pins removed (cost bound; exactness waived) -
    orig_rounded = da._rounded
    da._rounded = lambda x, z: x
    try:
        results["no_fma_pins"] = chained_ms_per_sample(full, imgs, params)
    finally:
        da._rounded = orig_rounded

    results["backend"] = jax.default_backend()
    results["batch"], results["size"] = args.batch, args.size
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
