#!/usr/bin/env python
"""Weight-porting parity harness: prove a converted torch checkpoint is
numerically faithful.

Given a PL .ckpt / DINO .pth / native .npz (or nothing — the pretrained
artifact is auto-discovered via $DINO_TPU_PRETRAINED, the torch-hub cache, or
the converted-npz cache), converts it and checks, stage by stage:
  1. parameter-level roundtrip (shapes, exact values after layout transforms)
  2. forward-activation closeness vs the torch implementation (per
     resolution), when torch + a reference implementation are importable
  3. BIT-IDENTICAL argmax label maps at the requested resolutions (fp32)

Without torch/reference available it still runs stage 1 + a JAX
self-consistency pass and says exactly what was skipped.  The final line is
a machine-readable JSON verdict (also written to --json when given), so the
moment real pretrained weights land (reference dt_utils.py:23-27 artifact),
running `dt-verify-port` unattended produces the full parity record.

Usage:
    dt-verify-port [ckpt.ckpt] [--resolutions 240 480 960] [--image f.jpg]
    (reference impl discovered via $DINO_REFERENCE_PATH or /root/reference)
"""
from __future__ import annotations

import argparse
import json
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


def discover_artifact():
    """Find a pretrained artifact the way the runtime ladder does
    (explicit env -> converted npz cache -> torch-hub cache)."""
    from dino_tpu.checkpointing.pretrained import (DINO_S8_NAME, _cache_dir,
                                                   _hub_cache)
    candidates = [os.environ.get("DINO_TPU_PRETRAINED"),
                  os.path.join(_cache_dir(), f"{DINO_S8_NAME}.npz"),
                  _hub_cache(DINO_S8_NAME)]
    for cand in candidates:
        if cand and os.path.exists(cand):
            return cand
    return None


def _load_model(checkpoint_path):
    """DINOSeg (fp32) + the raw torch-layout state dict (None for npz).

    Accepts full task checkpoints (PL .ckpt / native .npz with hparams) and
    bare backbone artifacts (the dino_deitsmall8 .pth): the latter get a
    seeded head so stage-3 argmax parity is still checkable.
    """
    from dino_tpu.api import DINOSeg
    from dino_tpu.checkpointing.torch_convert import (load_torch_file,
                                                      state_dict_to_numpy)
    n_blocks = 3
    raw = None
    if checkpoint_path.endswith((".ckpt", ".pth")):
        ckpt = load_torch_file(checkpoint_path)
        if "state_dict" in ckpt:        # PL task checkpoint
            raw = state_dict_to_numpy(ckpt["state_dict"])
            return DINOSeg.load_from_checkpoint(
                checkpoint_path, precision="fp32"), raw, "task"
        # bare backbone artifact — possibly full-depth and/or a DINO
        # pretraining checkpoint ('teacher' sub-dict with head.* keys);
        # keep only the first n_blocks backbone blocks so the truncated
        # torch oracle can load it strict=True
        raw = state_dict_to_numpy(ckpt.get("teacher", ckpt))
        raw = {k.replace("module.", "").replace("backbone.", ""): v
               for k, v in raw.items() if not k.replace(
                   "module.", "").startswith("head.")}

        def keep(key: str) -> bool:
            if key.startswith("blocks."):
                return int(key.split(".")[1]) < n_blocks
            return True

        raw = {"dino." + k: v for k, v in raw.items() if keep(k)}
        if "teacher" in ckpt:  # full DINO pretraining checkpoint
            from dino_tpu.checkpointing.pretrained import \
                load_pretrained_weights
            from dino_tpu.models.vit import truncate_blocks
            full = load_pretrained_weights(checkpoint_path,
                                           checkpoint_key="teacher")
            model = DINOSeg(head="mlp", n_blocks=n_blocks, seed=0,
                            precision="fp32", random_init=True)
            model.vit_params = truncate_blocks(full, n_blocks)
        else:
            model = DINOSeg(head="mlp", n_blocks=n_blocks, seed=0,
                            precision="fp32",
                            pretrained_path=checkpoint_path)
        return model, raw, "backbone"
    # .npz: a native task checkpoint (carries hparams) or a converted
    # backbone from the acquisition cache / dt-pretrain-dino
    import numpy as np_
    with np_.load(checkpoint_path, allow_pickle=False) as z:
        is_task = "__hparams_json__" in z.files
    if is_task:
        return DINOSeg.load_from_checkpoint(
            checkpoint_path, precision="fp32"), None, "task"
    model = DINOSeg(head="mlp", n_blocks=n_blocks, seed=0, precision="fp32",
                    pretrained_path=checkpoint_path)
    return model, None, "backbone-npz"


def verify_port(checkpoint_path: str, resolutions=(240, 480, 960),
                image: str | None = None):
    """Returns (ok, report dict)."""
    import jax
    from dino_tpu.models.vit import ViTConfig, vit_forward

    report = {"checkpoint": checkpoint_path, "resolutions": list(resolutions),
              "stages": [], "ok": True}

    def record(stage, ok, **kw):
        report["stages"].append({"stage": stage, "ok": bool(ok), **kw})
        report["ok"] &= bool(ok)

    print(f"== weight-port verification: {checkpoint_path}")
    model, raw, kind = _load_model(checkpoint_path)
    n_params = sum(np.asarray(x).size for x in jax.tree.leaves(
        model.vit_params))
    print(f"[1] conversion: kind={kind} backbone={model.backbone} "
          f"n_blocks={model.n_blocks} params={n_params:,} head={model.head}")
    record("conversion", True, kind=kind, n_params=int(n_params),
           n_blocks=model.n_blocks)

    # stage 1: layout roundtrip — re-derive a torch-layout tensor and compare
    if raw:
        qkv_t = raw.get("dino.blocks.0.attn.qkv.weight")
        if qkv_t is not None:
            ours = np.asarray(model.vit_params["blocks"][0]["attn"]["qkv"]
                              ["kernel"])
            same = np.array_equal(ours.T, np.asarray(qkv_t, np.float32))
            print(f"[1] qkv layout roundtrip exact: {same}")
            record("layout_roundtrip", same)

    # stage 2b: the production Pallas flash kernel vs the XLA attention.
    # The f32 torch oracle below deliberately runs use_flash=False (the
    # kernel pins its own MXU precision and is not an f32 oracle), so this
    # stage is what exercises the real serving kernel on the chip: bf16
    # MXU rounding puts the expected deviation at ~1e-2 on O(5) tokens
    # (measured); 0.1 is a 10x-margin gate that still catches any real
    # kernel regression (wrong rescale, masking, block handling).
    cfg = ViTConfig(patch_size=8)
    if jax.default_backend() == "tpu" and model.backbone == "vit":
        for res in [r for r in resolutions if r <= 480]:
            rs = np.random.RandomState(res + 1)
            xin = rs.randn(1, res, res, 3).astype(np.float32)
            t_flash = np.asarray(vit_forward(model.vit_params, xin, cfg,
                                             use_flash=True))
            t_xla = np.asarray(vit_forward(model.vit_params, xin, cfg,
                                           use_flash=False))
            err = float(np.abs(t_flash - t_xla).max())
            print(f"[2b] {res}px flash-kernel vs XLA token max|err| = "
                  f"{err:.2e}")
            record("flash_kernel_consistency", err < 0.1, resolution=res,
                   max_abs_err=err)

    # stage 2c: O(N) CLS-row attention extraction vs the full probs path.
    # visualize_attention consumes only the CLS row (reference
    # visualize_attention.py:50); the cls_only mode computes exactly that
    # row without the (N, N) matrix.  The CLS query is projected by a
    # separate sliced einsum (different contraction order than the full
    # qkv), so the gate is a tight tolerance on the probabilities (softmax
    # outputs in [0, 1]) rather than bit-equality; at resolutions where the
    # full matrix doesn't fit, the O(N) extraction must at least run finite
    # (the whole point of the mode).
    if model.backbone == "vit":
        from dino_tpu.models.vit import get_last_selfattention as _gls
        # both programs are f32 but tiled differently (sliced-CLS einsum vs
        # dense qkv); pin 'highest' so the 1e-5 probability gate measures
        # the math, not default-precision MXU accumulation-order noise
        with jax.default_matmul_precision("highest"):
            for res in resolutions:
                rs = np.random.RandomState(res + 2)
                xin = rs.randn(1, res, res, 3).astype(np.float32)
                row = np.asarray(_gls(model.vit_params, xin, cfg,
                                      cls_only=True))
                finite = bool(np.isfinite(row).all())
                if res <= 480:
                    full = np.asarray(_gls(model.vit_params, xin, cfg))
                    err = float(np.abs(row - full[:, :, :1, :]).max())
                    print(f"[2c] {res}px cls_only row vs full path row 0 "
                          f"max|err| = {err:.2e}")
                    record("cls_row_consistency", err < 1e-5 and finite,
                           resolution=res, max_abs_err=err)
                else:
                    n_exp = (res // cfg.patch_size) ** 2 + 1
                    ok_shape = row.shape == (1, cfg.num_heads, 1, n_exp)
                    print(f"[2c] {res}px cls_only O(N) extraction: shape="
                          f"{row.shape} finite={finite}")
                    record("cls_row_consistency", ok_shape and finite,
                           resolution=res, n_tokens=n_exp)

    # torch-side oracle
    vt = None
    try:
        import torch
        vt = _load_reference_vit()
    except ImportError:
        torch = None
    if vt is None or model.backbone != "vit" or raw is None:
        print("[2,3] torch reference not importable (or cnn backbone / npz "
              "input) — running JAX self-consistency only")
        for res in resolutions:
            model.set_resolution(res)
            x = (np.asarray(_read_image(image)) if image else
                 np.random.RandomState(0).randint(0, 255, (480, 640, 3),
                                                  np.uint8))
            p1, p2 = model.predict(x), model.predict(x)
            same = np.array_equal(p1, p2) and p1.shape == (480, 480)
            print(f"[3*] {res}px deterministic 480x480 predict: {same}")
            record("self_consistency", same, resolution=res)
        return report["ok"], report

    tm = vt.vit_small(patch_size=8, num_classes=0)
    tm.blocks = tm.blocks[:model.n_blocks]
    sd = {k[len("dino."):]: torch.from_numpy(np.asarray(v)) for k, v in
          raw.items() if k.startswith("dino.")}
    tm.load_state_dict(sd, strict=True)
    tm.eval()

    with jax.default_matmul_precision("highest"):
        for res in resolutions:
            # the torch oracle materializes (1, 6, N, N) f32 probabilities
            # per block (vanilla attention); guard hosts without the RAM
            n_tok = (res // 8) ** 2 + 1
            need = 2.5 * 6 * n_tok * n_tok * 4  # probs + softmax temporaries
            avail = _available_ram_bytes()
            if avail is not None and need > avail:
                print(f"[2,3] {res}px skipped: torch oracle needs "
                      f"~{need/2**30:.1f} GiB host RAM, {avail/2**30:.1f} "
                      f"available")
                record("activation_parity", True, resolution=res,
                       skipped="insufficient host RAM for the torch oracle")
                continue
            rs = np.random.RandomState(res)
            xin = rs.randn(1, 3, res, res).astype(np.float32)
            with torch.no_grad():
                ref_tokens = tm(torch.from_numpy(xin)).numpy()
            # use_flash=False: the parity oracle needs true-f32 attention
            # (the ambient 'highest' applies to XLA dots; the flash kernel
            # pins its own MXU precision and is not an f32 oracle)
            our_tokens = np.asarray(vit_forward(
                model.vit_params, xin.transpose(0, 2, 3, 1), cfg,
                use_flash=False))
            err = float(np.abs(our_tokens - ref_tokens).max())
            print(f"[2] {res}px token max|err| = {err:.2e}")
            record("activation_parity", err < 1e-3, resolution=res,
                   max_abs_err=err)

            # argmax maps through the converted head (the torch-side oracle
            # below replays only the reference's mlp/linear head shapes;
            # the MoE head has no reference counterpart to compare against)
            if model.head not in ("linear", "mlp"):
                print(f"[3] {res}px argmax parity skipped: head="
                      f"{model.head!r} has no torch reference counterpart")
                record("argmax_parity", True, resolution=res,
                       skipped=f"no torch oracle for head={model.head!r}")
                continue
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
            record("argmax_parity", mism == 0, resolution=res,
                   mismatches=mism, patches=int(our_map.size))
    return report["ok"], report


def _read_image(path):
    from PIL import Image
    return np.array(Image.open(path).convert("RGB"))


def _available_ram_bytes():
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemAvailable:"):
                    return int(line.split()[1]) * 1024
    except Exception:
        pass
    return None


def main():
    parser = argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("checkpoint", nargs="?", default=None,
                        help="torch .ckpt/.pth or native .npz; omitted = "
                             "auto-discover the pretrained artifact")
    parser.add_argument("--resolutions", nargs="+", type=int,
                        default=[240, 480, 960])
    parser.add_argument("--image", default=None,
                        help="optional real frame for the predict checks")
    parser.add_argument("--json", default=None,
                        help="write the JSON verdict to this path")
    args = parser.parse_args()
    ckpt = args.checkpoint or discover_artifact()
    if ckpt is None:
        verdict = {"checkpoint": None, "ok": False,
                   "error": "no checkpoint given and no pretrained artifact "
                            "found (set $DINO_TPU_PRETRAINED)"}
        print(json.dumps(verdict))
        sys.exit(2)
    ok, report = verify_port(ckpt, tuple(args.resolutions), args.image)
    line = json.dumps(report, sort_keys=True)
    if args.json:
        with open(args.json, "w") as f:
            f.write(line + "\n")
    print("PASS" if ok else "FAIL")
    print(line)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
