"""Pos-embed bicubic resampling must match torch F.interpolate bit-for-bit
(up to fp32 matmul error), including the reference's +0.1 scale hack
(vision_transformer.py:212-219)."""
import math

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from dino_tpu.ops.bicubic import bicubic_resize_matrix


@pytest.mark.parametrize("n_in,out_px", [
    (28, 240), (28, 480), (28, 960), (28, 120), (28, 64), (16, 480),
])
def test_matches_torch_bicubic(n_in, out_px):
    g_out = out_px // 8
    scale = (g_out + 0.1) / n_in  # reference's w0+0.1 hack
    x = torch.randn(1, 5, n_in, n_in)
    ref = torch.nn.functional.interpolate(
        x, scale_factor=(scale, scale), mode="bicubic").numpy()
    assert ref.shape[-1] == g_out

    w = bicubic_resize_matrix(n_in, scale)
    xn = x.numpy().astype(np.float64)
    ours = np.einsum("oh,bchw->bcow", w.astype(np.float64), xn)
    ours = np.einsum("ow,bchw->bcho", w.astype(np.float64), ours)
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=0)


def test_identity_when_same_grid():
    # npatch == N and w == h short-circuits in the model; the matrix for
    # scale (n+0.1)/n still has output size n and should be near-identity.
    w = bicubic_resize_matrix(28, (28 + 0.1) / 28)
    assert w.shape == (28, 28)
