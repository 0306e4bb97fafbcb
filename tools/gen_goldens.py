#!/usr/bin/env python
"""Generate golden parity fixtures from the torch reference implementation.

Dev-only tool: imports the reference ViT (read-only mount at /root/reference)
as a numerical oracle, runs a seeded random-weight model, and saves weights +
inputs + outputs to tests/goldens/*.npz.  Tests consume only the .npz files.

Run: python tools/gen_goldens.py
"""
import importlib.util
import os
import sys
import types

import numpy as np
import torch

REF_SRC = "/root/reference/dt_segmentation/src"
OUT_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")


def load_reference_vit():
    pkg = types.ModuleType("refsrc")
    pkg.__path__ = [REF_SRC]
    sys.modules["refsrc"] = pkg
    for name in ["utils", "vision_transformer"]:
        spec = importlib.util.spec_from_file_location(
            f"refsrc.{name}", os.path.join(REF_SRC, f"{name}.py"))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refsrc.{name}"] = mod
        spec.loader.exec_module(mod)
    return sys.modules["refsrc.vision_transformer"]


def main():
    os.makedirs(OUT_DIR, exist_ok=True)
    torch.manual_seed(0)
    np.random.seed(0)
    vt = load_reference_vit()

    # Small but structurally complete model: 2 blocks, ViT-tiny width, patch 8.
    from functools import partial
    model = vt.VisionTransformer(
        img_size=[224], patch_size=8, embed_dim=192, depth=2, num_heads=3,
        mlp_ratio=4, qkv_bias=True, num_classes=0,
        norm_layer=partial(torch.nn.LayerNorm, eps=1e-6))
    model.eval()

    x240 = torch.randn(2, 3, 240, 240)
    x120 = torch.randn(1, 3, 120, 120)
    cls_mask = (torch.rand(4, 15, 15) > 0.5).float()

    with torch.no_grad():
        out240 = model(x240)
        out240_int1 = model(x240, intermediate=1)
        cls240 = model(x240, all=False)
        # full attn at 240px is 19MB; the pipeline only consumes the CLS row
        # (visualize_attention.py:50), so golden just that at 240.
        attn240_cls = model.get_last_selfattention(x240)[:, :, 0, :]
        attn120 = model.get_last_selfattention(x120)
        inter240 = model.get_intermediate_layers(x240, n=2)
        out120 = model(x120)
        fm120 = model.forward_mask(x120, cls_mask)
        attn_masked = model.get_last_selfattention(x120, cls_mask=cls_mask)

    arrays = {
        "x240": x240.numpy(), "x120": x120.numpy(),
        "cls_mask": cls_mask.numpy(),
        "out240": out240.numpy(), "out240_int1": out240_int1.numpy(),
        "cls240": cls240.numpy(), "attn240_cls": attn240_cls.numpy(),
        "attn120": attn120.numpy(),
        "inter240_0": inter240[0].numpy(), "inter240_1": inter240[1].numpy(),
        "out120": out120.numpy(), "fm120": fm120.numpy(),
        "attn_masked": attn_masked.numpy(),
    }
    for k, v in model.state_dict().items():
        arrays["sd::" + k] = v.numpy()
    np.savez_compressed(os.path.join(OUT_DIR, "vit_d2_w192_p8.npz"), **arrays)
    print("wrote vit_d2_w192_p8.npz:",
          {k: tuple(v.shape) for k, v in arrays.items() if not k.startswith("sd::")})

    # MLP / Linear head goldens (spec: pl_torch_modules.py:108-138).
    torch.manual_seed(1)
    feats = torch.randn(32, 192)
    l1, l2, l3 = (torch.nn.Linear(192, 200), torch.nn.Linear(200, 100),
                  torch.nn.Linear(100, 7))
    with torch.no_grad():
        h = torch.nn.functional.relu(l1(feats))
        h = torch.nn.functional.relu(l2(h))
        mlp_out = torch.nn.functional.log_softmax(l3(h), dim=1)
    lin = torch.nn.Linear(192, 7)
    with torch.no_grad():
        lin_out = torch.nn.functional.log_softmax(lin(feats), dim=1)
    head_arrays = {
        "feats": feats.numpy(),
        "mlp_out": mlp_out.numpy(), "lin_out": lin_out.numpy(),
        "sd::layer_1.weight": l1.weight.detach().numpy(), "sd::layer_1.bias": l1.bias.detach().numpy(),
        "sd::layer_2.weight": l2.weight.detach().numpy(), "sd::layer_2.bias": l2.bias.detach().numpy(),
        "sd::layer_3.weight": l3.weight.detach().numpy(), "sd::layer_3.bias": l3.bias.detach().numpy(),
        "sd_lin::layer_1.weight": lin.weight.detach().numpy(),
        "sd_lin::layer_1.bias": lin.bias.detach().numpy(),
    }
    np.savez_compressed(os.path.join(OUT_DIR, "heads.npz"), **head_arrays)
    print("wrote heads.npz")


def gen_960_golden():
    """Cache the torch oracle's 960px leg (N = 14,401 tokens, full ViT-S/8
    scale) as a COMPACT golden so the default suite asserts the 960px
    parity without running live torch (~15 min + ~10 GB per run; the live
    variant stays behind DINO_TPU_SLOW=1 in
    tests/test_live_reference_parity.py).

    Stored: 1024 sampled token rows (f32, seeded sample — numeric
    closeness evidence) + the FULL 120x120 argmax label map through the
    seeded MLP head (the BASELINE bit-identity criterion) + the CLS
    token.  ~1.6 MB instead of the 22 MB full token tensor.
    """
    os.makedirs(OUT_DIR, exist_ok=True)
    vt = load_reference_vit()
    torch.manual_seed(7)                    # PARITY.md §2.3 recipe
    model = vt.vit_small(patch_size=8, num_classes=0)
    model.blocks = model.blocks[:3]
    model.eval()
    rs = np.random.RandomState(960)
    x = rs.randn(1, 3, 960, 960).astype(np.float32)
    with torch.no_grad():
        tokens = model(torch.from_numpy(x)).numpy()      # (1, 14401, 384)
    n_tok = tokens.shape[1]
    idx = np.sort(np.random.RandomState(123).choice(n_tok, 1024,
                                                    replace=False))
    # seeded MLP head (same recipe as the live test's _seeded_head)
    torch.manual_seed(1)
    l1 = torch.nn.Linear(384, 200)
    l2 = torch.nn.Linear(200, 100)
    l3 = torch.nn.Linear(100, 7)
    with torch.no_grad():
        h = torch.relu(l1(torch.from_numpy(tokens[:, 1:]).reshape(-1, 384)))
        h = torch.relu(l2(h))
        amap = l3(h).argmax(-1).numpy().astype(np.int8)
    np.savez_compressed(
        os.path.join(OUT_DIR, "live960.npz"),
        token_idx=idx.astype(np.int32),
        token_rows=tokens[0, idx].astype(np.float32),
        cls=tokens[0, 0].astype(np.float32),
        argmax_map=amap)
    print("wrote live960.npz:", len(idx), "token rows +",
          amap.size, "argmax entries")


if __name__ == "__main__":
    if "--960" in sys.argv:
        gen_960_golden()
    else:
        main()
