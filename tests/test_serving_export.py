"""AOT serving artifacts: export -> deserialize -> run matches live predict.

The exported StableHLO program bakes the weights in, so the artifact runs
with no model code or checkpoint — the deployment contract is uint8 frames
in, int32 480x480 label maps out (reference invariant,
pl_torch_modules.py:294-298).
"""
import numpy as np
import pytest

from dino_tpu import DINOSeg, export_predict, load_exported_predict


@pytest.fixture(scope="module")
def model():
    m = DINOSeg(head="mlp", n_blocks=1, n_classes=5, random_init=True,
                seed=0, precision="fp32")
    m.set_resolution(64)
    return m


def test_export_roundtrip(model, tmp_path):
    path = str(tmp_path / "predict.shlo")
    out_path = export_predict(model, path, batch_size=3, in_shape=(100, 120))
    assert out_path == path

    rs = np.random.RandomState(0)
    frames = rs.randint(0, 255, (3, 100, 120, 3), np.uint8)
    served = load_exported_predict(path)
    out = served(frames)
    assert out.shape == (3, 480, 480) and out.dtype == np.int32
    np.testing.assert_array_equal(out, model.predict_batch(frames))

    # the contract sidecar records the I/O binding
    assert served.contract["input"]["shape"] == [3, 100, 120, 3]
    assert served.contract["resolution"] == 64
    assert served.contract["precision"] == "fp32"


def test_export_shape_bound(model, tmp_path):
    path = str(tmp_path / "predict.shlo")
    export_predict(model, path, batch_size=2, in_shape=(100, 120))
    served = load_exported_predict(path)
    bad = np.zeros((4, 100, 120, 3), np.uint8)
    with pytest.raises(ValueError, match="shape-bound"):
        served(bad)


def test_export_contract_nondivisible_resolution(tmp_path):
    """Resolutions whose patch grid doesn't divide 480 floor the kron factor
    (reference semantics, pl_torch_modules.py:297-298); the contract sidecar
    must record the true output shape, not assume 480."""
    m = DINOSeg(head="linear", n_blocks=1, n_classes=3, random_init=True,
                seed=2, precision="fp32")
    m.set_resolution(72)          # out 9x9, kron factor 53 -> 477x477
    path = str(tmp_path / "odd.shlo")
    export_predict(m, path, batch_size=1, in_shape=(72, 72))
    served = load_exported_predict(path)
    assert served.contract["output"]["shape"] == [1, 477, 477]
    frames = np.random.RandomState(5).randint(0, 255, (1, 72, 72, 3),
                                              np.uint8)
    out = served(frames)
    assert out.shape == (1, 477, 477)
    np.testing.assert_array_equal(out, m.predict_batch(frames))


def test_export_cli(model, tmp_path):
    """dt-export: checkpoint in -> artifact + JSON contract line out."""
    import io
    import json
    from contextlib import redirect_stdout

    from dino_tpu.cli.export import main as export_main

    ckpt = str(tmp_path / "m.ckpt.npz")
    model.save(ckpt)
    out = str(tmp_path / "cli.shlo")
    buf = io.StringIO()
    with redirect_stdout(buf):
        export_main([ckpt, out, "--resolution", "64", "--batch-size", "2",
                     "--in-height", "100", "--in-width", "120",
                     "--precision", "fp32"])
    line = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert line["artifact"] == out
    assert line["input"]["shape"] == [2, 100, 120, 3]
    assert line["precision"] == "fp32"

    frames = np.random.RandomState(3).randint(0, 255, (2, 100, 120, 3),
                                              np.uint8)
    served = load_exported_predict(out)
    np.testing.assert_array_equal(served(frames),
                                  model.predict_batch(frames))

    # --parallelism sp exports the ring-attention program from the CLI too
    import jax
    sp_out = str(tmp_path / "cli_sp.shlo")
    buf = io.StringIO()
    with redirect_stdout(buf):
        export_main([ckpt, sp_out, "--resolution", "64", "--batch-size",
                     "2", "--in-height", "100", "--in-width", "120",
                     "--precision", "fp32",
                     "--n-devices", str(jax.device_count()),
                     "--parallelism", "sp"])
    line = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert line["parallelism"] == "sp"
    np.testing.assert_array_equal(load_exported_predict(sp_out)(frames),
                                  model.predict_batch(frames))


def test_export_dp_sharded(model, tmp_path):
    """n_devices exports the program DP-sharded over the mesh; the loaded
    artifact shards inputs over all chips and matches the single-device
    program exactly (fp32)."""
    import jax

    n = jax.device_count()
    assert n == 8  # conftest forces the virtual 8-device CPU mesh
    path = str(tmp_path / "dp.shlo")
    export_predict(model, path, batch_size=n, in_shape=(100, 120),
                   n_devices=n)
    served = load_exported_predict(path)
    assert served.contract["nr_devices"] == n
    frames = np.random.RandomState(1).randint(0, 255, (n, 100, 120, 3),
                                              np.uint8)
    out = served(frames)
    np.testing.assert_array_equal(out, model.predict_batch(frames))

    with pytest.raises(ValueError, match="divide"):
        export_predict(model, str(tmp_path / "bad.shlo"), batch_size=3,
                       in_shape=(100, 120), n_devices=n)


def test_export_sp_sharded(model, tmp_path):
    """parallelism='sp' exports the ring-attention program: tokens shard
    over the chips inside the program, inputs/outputs replicate, and the
    output matches the single-device program exactly (fp32)."""
    import jax

    n = jax.device_count()
    path = str(tmp_path / "sp.shlo")
    export_predict(model, path, batch_size=2, in_shape=(100, 120),
                   n_devices=n, parallelism="sp")
    served = load_exported_predict(path)
    assert served.contract["nr_devices"] == n
    assert served.contract["parallelism"] == "sp"
    frames = np.random.RandomState(7).randint(0, 255, (2, 100, 120, 3),
                                              np.uint8)
    out = served(frames)
    np.testing.assert_array_equal(out, model.predict_batch(frames))

    # sidecar-less load: the SP-vs-DP decision comes from the program's own
    # input sharding (replicated => SP), not the .json
    import os
    os.remove(path + ".json")
    served2 = load_exported_predict(path)
    assert served2.contract is None
    np.testing.assert_array_equal(served2(frames),
                                  model.predict_batch(frames))

    with pytest.raises(ValueError, match="parallelism"):
        export_predict(model, str(tmp_path / "bad_p.shlo"), batch_size=1,
                       in_shape=(100, 120), n_devices=n, parallelism="pp")
    with pytest.raises(ValueError, match="n_devices"):
        export_predict(model, str(tmp_path / "bad_n.shlo"), batch_size=1,
                       in_shape=(100, 120), parallelism="sp")
    m_int8 = DINOSeg(head="mlp", n_blocks=1, n_classes=5, random_init=True,
                     seed=0, precision="int8")
    m_int8.set_resolution(64)
    with pytest.raises(ValueError, match="int8"):
        export_predict(m_int8, str(tmp_path / "bad_i.shlo"), batch_size=2,
                       in_shape=(100, 120), n_devices=n, parallelism="sp")


def test_export_moe_head(tmp_path):
    """The MoE head exports too (routing compiles into the program)."""
    m = DINOSeg(head="moe", n_experts=2, n_blocks=1, n_classes=4,
                random_init=True, seed=1, precision="fp32")
    m.set_resolution(64)
    path = str(tmp_path / "moe.shlo")
    export_predict(m, path, batch_size=1, in_shape=(64, 64))
    frames = np.random.RandomState(0).randint(0, 255, (1, 64, 64, 3),
                                              np.uint8)
    out = load_exported_predict(path)(frames)
    np.testing.assert_array_equal(out, m.predict_batch(frames))
