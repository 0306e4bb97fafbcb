#!/usr/bin/env python
"""Weight-porting parity harness: prove a converted torch checkpoint is
numerically faithful.

Given a PL .ckpt / DINO .pth, converts it and checks, stage by stage:
  1. parameter-level roundtrip (shapes, exact values after layout transforms)
  2. forward-activation closeness vs the torch implementation (per block),
     when torch + a reference implementation are importable
  3. BIT-IDENTICAL argmax label maps at the requested resolutions (fp32)

Without torch/reference available it still runs stage 1 + a JAX
self-consistency pass and says exactly what was skipped.

Usage:
    dt-verify-port ckpt.ckpt --resolutions 240 480 [--image frame.jpg]
    (reference impl discovered via $DINO_REFERENCE_PATH or /root/reference)
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def _load_reference_vit():
    """Import the reference torch VisionTransformer if a checkout exists."""
    import importlib.util
    import types
    root = os.environ.get("DINO_REFERENCE_PATH", "/root/reference")
    src = os.path.join(root, "dt_segmentation", "src")
    if not os.path.isdir(src):
        return None
    pkg = types.ModuleType("dtrefsrc")
    pkg.__path__ = [src]
    sys.modules["dtrefsrc"] = pkg
    for name in ["utils", "vision_transformer"]:
        spec = importlib.util.spec_from_file_location(
            f"dtrefsrc.{name}", os.path.join(src, f"{name}.py"))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"dtrefsrc.{name}"] = mod
        spec.loader.exec_module(mod)
    return sys.modules["dtrefsrc.vision_transformer"]


def verify_port(checkpoint_path: str, resolutions=(240, 480),
                image: str | None = None) -> bool:
    import jax
    from dino_tpu.api import DINOSeg
    from dino_tpu.checkpointing.torch_convert import (load_torch_file,
                                                      state_dict_to_numpy)
    from dino_tpu.models.vit import ViTConfig, vit_forward

    ok = True
    print(f"== weight-port verification: {checkpoint_path}")

    model = DINOSeg.load_from_checkpoint(checkpoint_path, precision="fp32")
    n_params = sum(np.asarray(x).size for x in jax.tree.leaves(
        model.vit_params))
    print(f"[1] conversion: backbone={model.backbone} "
          f"n_blocks={model.n_blocks} params={n_params:,} head={model.head}")

    # stage 1: layout roundtrip — re-derive a torch-layout tensor and compare
    raw = state_dict_to_numpy(load_torch_file(checkpoint_path).get(
        "state_dict", {})) if checkpoint_path.endswith((".ckpt", ".pth")) \
        else None
    if raw:
        qkv_t = raw.get("dino.blocks.0.attn.qkv.weight")
        if qkv_t is not None:
            ours = np.asarray(model.vit_params["blocks"][0]["attn"]["qkv"]
                              ["kernel"])
            same = np.array_equal(ours.T, np.asarray(qkv_t, np.float32))
            print(f"[1] qkv layout roundtrip exact: {same}")
            ok &= same

    # torch-side oracle
    vt = None
    try:
        import torch
        vt = _load_reference_vit()
    except ImportError:
        torch = None
    if vt is None or model.backbone != "vit":
        print("[2,3] torch reference not importable (or cnn backbone) — "
              "running JAX self-consistency only")
        for res in resolutions:
            model.set_resolution(res)
            x = (np.asarray(_read_image(image)) if image else
                 np.random.RandomState(0).randint(0, 255, (480, 640, 3),
                                                  np.uint8))
            p1, p2 = model.predict(x), model.predict(x)
            same = np.array_equal(p1, p2)
            print(f"[3*] {res}px deterministic predict: {same}")
            ok &= same
        return ok

    tm = vt.vit_small(patch_size=8, num_classes=0)
    tm.blocks = tm.blocks[:model.n_blocks]
    sd = {k[len("dino."):]: torch.from_numpy(np.asarray(v)) for k, v in
          raw.items() if k.startswith("dino.")}
    tm.load_state_dict(sd, strict=True)
    tm.eval()
    cfg = ViTConfig(patch_size=8)

    with jax.default_matmul_precision("highest"):
        for res in resolutions:
            rs = np.random.RandomState(res)
            xin = rs.randn(1, 3, res, res).astype(np.float32)
            with torch.no_grad():
                ref_tokens = tm(torch.from_numpy(xin)).numpy()
            our_tokens = np.asarray(vit_forward(
                model.vit_params, xin.transpose(0, 2, 3, 1), cfg))
            err = np.abs(our_tokens - ref_tokens).max()
            print(f"[2] {res}px token max|err| = {err:.2e}")
            ok &= err < 1e-3

            # argmax maps through the converted head
            from dino_tpu.models.heads import head_apply
            logp = head_apply(model.head, model.head_params,
                              our_tokens[:, 1:].reshape(-1, 384))
            our_map = np.asarray(logp).argmax(-1)
            tt = torch.from_numpy(ref_tokens[:, 1:]).reshape(-1, 384)
            w = model.head_params
            h = tt
            layers = ["layer_1"] if model.head == "linear" else \
                ["layer_1", "layer_2", "layer_3"]
            for i, name in enumerate(layers):
                h = h @ torch.from_numpy(np.asarray(w[name]["kernel"])) + \
                    torch.from_numpy(np.asarray(w[name]["bias"]))
                if i < len(layers) - 1:
                    h = torch.relu(h)
            ref_map = h.argmax(-1).numpy()
            mism = int((our_map != ref_map).sum())
            print(f"[3] {res}px argmax label map: "
                  f"{'BIT-IDENTICAL' if mism == 0 else f'{mism} mismatches'}")
            ok &= mism == 0
    return ok


def _read_image(path):
    from PIL import Image
    return np.array(Image.open(path).convert("RGB"))


def main():
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("checkpoint", help="torch .ckpt/.pth or native .npz")
    parser.add_argument("--resolutions", nargs="+", type=int,
                        default=[240, 480])
    parser.add_argument("--image", default=None,
                        help="optional real frame for the predict checks")
    args = parser.parse_args()
    ok = verify_port(args.checkpoint, tuple(args.resolutions), args.image)
    print("PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
