"""Head parity vs torch goldens + init sanity."""
import jax
import numpy as np

from dino_tpu.checkpointing.torch_convert import convert_head_state_dict
from dino_tpu.models.heads import (init_head, linear_head_apply,
                                   mlp_head_apply)


def test_mlp_head_parity(heads_golden):
    sd = {k[len("sd::"):]: v for k, v in heads_golden.items()
          if k.startswith("sd::")}
    p = convert_head_state_dict(sd, "mlp", prefix="")
    out = mlp_head_apply(p, heads_golden["feats"])
    np.testing.assert_allclose(out, heads_golden["mlp_out"], atol=1e-5, rtol=1e-5)


def test_linear_head_parity(heads_golden):
    sd = {k[len("sd_lin::"):]: v for k, v in heads_golden.items()
          if k.startswith("sd_lin::")}
    p = convert_head_state_dict(sd, "linear", prefix="")
    out = linear_head_apply(p, heads_golden["feats"])
    np.testing.assert_allclose(out, heads_golden["lin_out"], atol=1e-5, rtol=1e-5)


def test_init_shapes_and_logprobs():
    p = init_head(jax.random.PRNGKey(0), "mlp", n_classes=7, input_dim=384)
    x = np.random.RandomState(0).randn(10, 384).astype(np.float32)
    out = np.asarray(mlp_head_apply(p, x))
    assert out.shape == (10, 7)
    np.testing.assert_allclose(np.exp(out).sum(-1), 1.0, atol=1e-5)
