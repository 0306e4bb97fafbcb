"""Async checkpoint writer + step-granular preemption-safe pretrain resume.

The reference checkpoints synchronously via PL (pl_torch_modules.py:378-384)
and its dormant restart_from_checkpoint is epoch-granular (utils.py:152-184);
here serialization runs off the critical path and long epochs resume at the
exact step a preemption hit.
"""
import os

import numpy as np
import pytest

from dino_tpu.checkpointing.async_writer import AsyncCheckpointer
from dino_tpu.checkpointing.io import load_checkpoint, save_checkpoint
from dino_tpu.checkpointing.resume import (restart_from_checkpoint,
                                           save_train_state)


def _tree(seed):
    rs = np.random.RandomState(seed)
    return {"a": rs.randn(4, 3).astype(np.float32),
            "nested": {"b": rs.randn(7).astype(np.float32)},
            "ls": [rs.randn(2).astype(np.float32) for _ in range(2)]}


def test_async_train_state_matches_sync(tmp_path):
    state = {"params": _tree(0), "opt": _tree(1)}
    sync_p = str(tmp_path / "sync.npz")
    async_p = str(tmp_path / "async.npz")
    save_train_state(sync_p, state, run_variables={"epoch": 3, "step": 7})

    w = AsyncCheckpointer()
    w.save_train_state(async_p, state, run_variables={"epoch": 3, "step": 7})
    w.wait()

    with np.load(sync_p) as a, np.load(async_p) as b:
        assert sorted(a.files) == sorted(b.files)
        for k in a.files:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)
    w.close()


def test_async_model_checkpoint_matches_sync(tmp_path):
    params = {"vit": _tree(2), "head": _tree(3)}
    hparams = {"head": "mlp", "n_blocks": 1, "lr": 1e-3}
    sync_p = str(tmp_path / "m_sync.npz")
    async_p = str(tmp_path / "m_async.npz")
    save_checkpoint(sync_p, params, hparams)
    w = AsyncCheckpointer()
    w.save_checkpoint(async_p, params, hparams)
    w.wait()
    pa, ha = load_checkpoint(sync_p)
    pb, hb = load_checkpoint(async_p)
    assert ha == hb
    import jax
    for x, y in zip(jax.tree.leaves(pa), jax.tree.leaves(pb)):
        np.testing.assert_array_equal(x, y)
    w.close()


def test_async_last_write_wins(tmp_path):
    """Rapid overwrites of one path serialize FIFO on the single worker —
    the file always ends at the final submission."""
    path = str(tmp_path / "s.npz")
    w = AsyncCheckpointer()
    for i in range(6):
        w.save_train_state(path, {"x": np.full((3,), float(i), np.float32)},
                           run_variables={"epoch": i})
    w.wait()
    run_vars = {"epoch": -1}
    restored = restart_from_checkpoint(path, run_vars,
                                       x=np.zeros((3,), np.float32))
    assert run_vars["epoch"] == 5
    np.testing.assert_array_equal(restored["x"],
                                  np.full((3,), 5.0, np.float32))
    w.close()


def test_async_write_failure_raises(tmp_path):
    """A failed background write fails LOUDLY on the next wait/save."""
    blocker = tmp_path / "not_a_dir"
    blocker.write_text("file, not dir")
    w = AsyncCheckpointer()
    w.save_train_state(str(blocker / "x.npz"), {"x": np.zeros(2)})
    with pytest.raises(RuntimeError, match="async checkpoint write failed"):
        w.wait()
    # error is cleared after surfacing; the writer keeps working
    ok = str(tmp_path / "ok.npz")
    w.save_train_state(ok, {"x": np.ones(2, np.float32)})
    w.wait()
    assert os.path.exists(ok)
    w.close()


def test_closed_writer_refuses_saves(tmp_path):
    w = AsyncCheckpointer()
    w.close()
    with pytest.raises(RuntimeError, match="closed"):
        w.save_train_state(str(tmp_path / "y.npz"), {"x": np.zeros(1)})


def test_snapshot_isolates_from_donation(tmp_path):
    """save_train_state's device snapshot happens at submission time: the
    caller may immediately donate/overwrite its arrays without corrupting
    the pending write."""
    import jax
    import jax.numpy as jnp
    x = jnp.arange(8, dtype=jnp.float32)
    w = AsyncCheckpointer()
    path = str(tmp_path / "d.npz")
    w.save_train_state(path, {"x": x})
    # donate x into a new computation (its buffer may be reused)
    y = jax.jit(lambda v: v * 0 - 1, donate_argnums=0)(x)
    jax.block_until_ready(y)
    w.wait()
    restored = restart_from_checkpoint(path, None,
                                       x=np.zeros(8, np.float32))
    np.testing.assert_array_equal(np.asarray(restored["x"]),
                                  np.arange(8, dtype=np.float32))
    w.close()


def test_pretrain_step_resume_matches_uninterrupted(tmp_path):
    """Preemption mid-epoch (--stop_after_steps, the SIGTERM code path) +
    --resume reproduces the uninterrupted run exactly: the restart replays
    from the exact next step (per-(seed,epoch,image) crop rngs + schedule
    indexing by global it)."""
    from PIL import Image

    from dino_tpu.cli.pretrain_dino import main as pretrain_main

    data = tmp_path / "imgs"
    data.mkdir()
    rs = np.random.RandomState(1)
    for i in range(4):
        Image.fromarray(rs.randint(0, 255, (64, 80, 3), np.uint8)).save(
            data / f"{i}.jpg")
    common = ["--data_path", str(data), "--arch", "vit_small", "--depth",
              "1", "--out_dim", "16", "--warmup_epochs", "0",
              "--batch_size", "2", "--n_local_crops", "2",
              "--global_size", "32", "--local_size", "16", "--epochs", "1"]

    w_full = str(tmp_path / "full")
    pretrain_main(common + ["--write_path", w_full])

    # interrupted leg: 2 steps/epoch; stop after step 0, mid-epoch
    w_resume = str(tmp_path / "resume")
    out = pretrain_main(common + ["--write_path", w_resume,
                                  "--save_every_steps", "1",
                                  "--stop_after_steps", "1"])
    assert out is None  # graceful stop: no final backbone yet
    assert os.path.exists(os.path.join(w_resume, "pretrain_resume.npz"))
    assert not os.path.exists(
        os.path.join(w_resume, "dino_pretrained_backbone.npz"))

    pretrain_main(common + ["--write_path", w_resume, "--resume"])

    a = np.load(os.path.join(w_full, "dino_pretrained_backbone.npz"))
    b = np.load(os.path.join(w_resume, "dino_pretrained_backbone.npz"))
    for k in a.files:
        np.testing.assert_allclose(b[k], a[k], rtol=1e-6, atol=1e-7,
                                   err_msg=k)


def test_nan_guard_rolls_back_and_completes(tmp_path, monkeypatch, capsys):
    """Fault injection: poison one step's crops with NaN; --nan_guard
    detects the non-finite loss, rolls back to the last step checkpoint,
    skips the batch, and the run completes with finite weights."""
    from PIL import Image

    from dino_tpu.cli.pretrain_dino import main as pretrain_main

    data = tmp_path / "imgs"
    data.mkdir()
    rs = np.random.RandomState(2)
    for i in range(4):
        Image.fromarray(rs.randint(0, 255, (64, 80, 3), np.uint8)).save(
            data / f"{i}.jpg")
    write = str(tmp_path / "out")
    monkeypatch.setenv("DINO_TPU_FAULT_NAN_STEP", "2")  # epoch 1, step 0
    pretrain_main(["--data_path", str(data), "--write_path", write,
                   "--arch", "vit_small", "--depth", "1", "--out_dim", "16",
                   "--warmup_epochs", "0", "--batch_size", "2",
                   "--n_local_crops", "2", "--global_size", "32",
                   "--local_size", "16", "--epochs", "2",
                   "--save_every_steps", "1", "--nan_guard"])
    assert "nan_guard: non-finite loss at epoch 1 step 0" in (
        capsys.readouterr().out)
    ckpt = np.load(os.path.join(write, "dino_pretrained_backbone.npz"))
    for k in ckpt.files:
        assert np.isfinite(ckpt[k]).all(), k


def test_nan_guard_raises_on_persistent_divergence(tmp_path, monkeypatch):
    """A fault at step 0 (before any checkpoint exists) fails fast."""
    from PIL import Image

    from dino_tpu.cli.pretrain_dino import main as pretrain_main

    data = tmp_path / "imgs"
    data.mkdir()
    rs = np.random.RandomState(3)
    for i in range(2):
        Image.fromarray(rs.randint(0, 255, (64, 80, 3), np.uint8)).save(
            data / f"{i}.jpg")
    monkeypatch.setenv("DINO_TPU_FAULT_NAN_STEP", "0")
    with pytest.raises(RuntimeError, match="nothing to roll back"):
        pretrain_main(["--data_path", str(data),
                       "--write_path", str(tmp_path / "out2"),
                       "--arch", "vit_small", "--depth", "1",
                       "--out_dim", "16", "--warmup_epochs", "0",
                       "--batch_size", "2", "--n_local_crops", "2",
                       "--global_size", "32", "--local_size", "16",
                       "--epochs", "1", "--nan_guard"])
