"""Coverage for the last utility corners: multi_scale, PIL augs, dt_frames,
raw-pretrain conversion."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image


def test_multi_scale_features():
    from dino_tpu.utils.retrieval import multi_scale
    calls = []

    def forward(batch):
        calls.append(batch.shape)
        return jnp.ones((batch.shape[0], 16)) * batch.shape[1]

    x = jnp.zeros((2, 64, 64, 3))
    v = multi_scale(x, forward)
    # three scales, bilinear-resized to patch multiples, L2-normalized output
    assert [c[1] for c in calls] == [64, 40, 32]
    np.testing.assert_allclose(np.linalg.norm(np.asarray(v), axis=-1), 1.0,
                               rtol=1e-5)


def test_pil_augs():
    import random
    from dino_tpu.data.pil_augs import GaussianBlur, Solarization
    img = Image.fromarray(
        np.random.RandomState(0).randint(0, 255, (32, 32, 3), np.uint8))
    random.seed(0)
    blur = GaussianBlur(p=1.0, radius_min=1.0, radius_max=1.0)
    out = np.array(blur(img))
    assert out.shape == (32, 32, 3)
    assert not np.array_equal(out, np.array(img))  # actually blurred
    noop = GaussianBlur(p=0.0)
    np.testing.assert_array_equal(np.array(noop(img)), np.array(img))

    sol = Solarization(p=1.0)
    out = np.array(sol(img))
    src = np.array(img)
    mask = src >= 128
    np.testing.assert_array_equal(out[mask], 255 - src[mask])
    np.testing.assert_array_equal(out[~mask], src[~mask])


def test_dt_frames(tmp_path):
    from dino_tpu.utils.frames import dt_frames
    rs = np.random.RandomState(0)
    for i in range(4):
        Image.fromarray(rs.randint(0, 255, (16, 16, 3), np.uint8)).save(
            tmp_path / f"f{i}.png")
    frames = list(dt_frames(path=str(tmp_path)))
    assert len(frames) == 4
    i0, img0 = frames[0]
    assert i0 == 0 and img0.size == (16, 16)
    limited = list(dt_frames(path=str(tmp_path), max=2))
    assert len(limited) == 2
    subset = list(dt_frames(subset=[1, 3], path=str(tmp_path)))
    assert [i for i, _ in subset] == [1, 3]


def test_convert_dino_pretrain(tmp_path):
    torch = pytest.importorskip("torch")
    from dino_tpu.checkpointing import convert_dino_pretrain
    from tests.test_pretrained import _tiny_vit_sd
    path = str(tmp_path / "w.pth")
    torch.save(_tiny_vit_sd(np.random.RandomState(0)), path)
    params = convert_dino_pretrain(path)
    assert len(params["blocks"]) == 1
    assert params["pos_embed"].shape == (1, 785, 384)
