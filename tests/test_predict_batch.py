"""Batched + streaming predict: parity with single-frame predict, ordering,
ragged tails."""
import numpy as np
import pytest

from dino_tpu import DINOSeg


@pytest.fixture(scope="module")
def model():
    m = DINOSeg(head="mlp", n_blocks=1, n_classes=5, random_init=True, seed=0,
                precision="fp32")
    m.set_resolution(64)
    return m


@pytest.fixture(scope="module")
def frames():
    rs = np.random.RandomState(0)
    return rs.randint(0, 255, (11, 100, 120, 3), np.uint8)


def test_predict_batch_matches_single(model, frames):
    batch = model.predict_batch(frames[:4])
    assert batch.shape == (4, 480, 480)
    # public contract: int maps — even though the label maps ride the
    # device->host wire as uint8 (4x less D2H, api.py wire_u8) the caller
    # always sees int32, and values are untouched by the round-trip
    assert batch.dtype == np.int32
    for i in range(4):
        single = model.predict(frames[i])
        assert single.dtype == np.int32
        np.testing.assert_array_equal(batch[i], single)


def test_predict_stream_order_and_ragged(model, frames):
    outs = list(model.predict_stream(iter(frames), batch_size=4))
    assert len(outs) == 11  # 2 full batches + ragged tail of 3
    for i, out in enumerate(outs):
        np.testing.assert_array_equal(out, model.predict(frames[i]))


def test_predict_stream_one_program_with_options(model, frames):
    """A stream with a ragged tail compiles exactly ONE batched program
    (pad-and-mask, no per-shape fallback) and honors precision= like
    predict_batch (VERDICT r2 item 6)."""
    before = set(model._jit_cache)
    outs = list(model.predict_stream(iter(frames[:6]), batch_size=4,
                                     precision="fp32"))
    new = [k for k in set(model._jit_cache) - before
           if k[0] == "predict_batch"]
    assert len(new) <= 1  # tail reuses the batch-4 program
    assert all(k[1][0] == 4 and k[3] == "fp32" for k in new)
    assert len(outs) == 6
    for i, out in enumerate(outs):
        np.testing.assert_array_equal(
            out, model.predict(frames[i], precision="fp32"))


def test_predict_batch_dp_sharded_matches_single(model, frames):
    """Batch divisible by the device count -> the batch shards over the data
    mesh (one frame per device on the 8-dev CPU mesh); per-frame outputs are
    unchanged."""
    import jax
    if jax.device_count() < 2:
        pytest.skip("needs a multi-device mesh")
    n = jax.device_count()
    batch = np.concatenate([frames, frames])[:n]
    out = model.predict_batch(batch)
    assert out.shape == (n, 480, 480)
    for i in range(n):
        np.testing.assert_array_equal(out[i], model.predict(batch[i]))


def test_predict_sp_serving_matches_plain(model, frames):
    """parallelism='sp': the ring-attention sequence-parallel predict
    program (token axis over all 8 virtual devices) == the plain program,
    in fp32 exactly at argmax level."""
    out_sp = model.predict_batch(frames[:2], precision="fp32",
                                 parallelism="sp")
    out = model.predict_batch(frames[:2], precision="fp32")
    np.testing.assert_array_equal(out_sp, out)
    one = model.predict(frames[0], precision="fp32", parallelism="sp")
    np.testing.assert_array_equal(one, out[0])


def test_predict_batch_accepts_pil_list(model, frames):
    from PIL import Image
    pils = [Image.fromarray(f) for f in frames[:2]]
    out = model.predict_batch(pils)
    np.testing.assert_array_equal(out, model.predict_batch(frames[:2]))
