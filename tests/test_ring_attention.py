"""Ring attention / sequence parallelism vs the single-device forward."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from dino_tpu.models.vit import ViTConfig, init_vit_params, vit_forward
from dino_tpu.parallel.mesh import make_mesh
from dino_tpu.parallel.ring_attention import vit_forward_seq_parallel

CFG = ViTConfig(patch_size=8, embed_dim=192, depth=2, num_heads=3)


def test_seq_parallel_matches_single_device():
    params = init_vit_params(jax.random.PRNGKey(0), CFG, depth=2)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 56, 56, 3))  # N+1 = 50
    ref = vit_forward(params, x, CFG)

    mesh = make_mesh(8, model_axis=1)
    out = vit_forward_seq_parallel(params, x, CFG, mesh, seq_axis="data")
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_seq_parallel_no_padding_case():
    # N+1 = 1 + 7*7 = 50 pads to 56 over 8 devices; also hit an exact split:
    # 31*31+1 = 962 ... use 8*8 grid => 65 -> pad 72. Just exercise a second
    # resolution for shape coverage.
    params = init_vit_params(jax.random.PRNGKey(2), CFG, depth=2)
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 64, 64, 3))
    mesh = make_mesh(8, model_axis=1)
    out = vit_forward_seq_parallel(params, x, CFG, mesh)
    ref = vit_forward(params, x, CFG)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_ring_flash_matches_replicated():
    """Ring attention with the Pallas flash kernel per hop (dynamic valid-K
    bound, interpret mode off-TPU) == replicated forward."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from dino_tpu.models.vit import ViTConfig, init_vit_params, vit_forward
    from dino_tpu.parallel.mesh import make_mesh
    from dino_tpu.parallel.ring_attention import vit_forward_seq_parallel

    cfg = ViTConfig(patch_size=8, embed_dim=64, num_heads=2)
    p = init_vit_params(jax.random.PRNGKey(0), cfg, depth=2)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 48, 48, 3), jnp.float32)
    mesh = make_mesh(8, model_axis=1)
    ref = vit_forward(p, x, cfg, use_flash=False)
    out = vit_forward_seq_parallel(p, x, cfg, mesh, seq_axis="data",
                                   flash="force")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-4, rtol=1e-4)


def test_sp_tp_composition_matches_replicated():
    """Ring attention over 'data' composed with Megatron-sharded block
    params over 'model' (the SCALING.md composition row): (data=4, model=2)
    mesh == replicated forward."""
    from dino_tpu.parallel.ring_attention import vit_forward_sp_tp

    cfg = ViTConfig(patch_size=8, embed_dim=64, depth=2, num_heads=2)
    params = init_vit_params(jax.random.PRNGKey(4), cfg, depth=2)
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 48, 48, 3), jnp.float32)
    mesh = make_mesh(8, model_axis=2)  # (data=4, model=2)
    out = vit_forward_sp_tp(params, x, cfg, mesh)
    ref = vit_forward(params, x, cfg, use_flash=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-5, rtol=1e-4)


def test_sp_tp_train_step_matches_replicated():
    """Training THROUGH the SPxTP composition on the (data=4, model=2)
    mesh: one Adam step == the replicated make_train_step (shard_map AD
    transposes the ring VJP, the Megatron psums, and the TP weight
    packing)."""
    from dino_tpu.models.heads import init_head
    from dino_tpu.parallel.ring_attention import make_sp_tp_train_step
    from dino_tpu.train.loop import (init_opt_state, make_optimizer,
                                     make_train_step)

    cfg = ViTConfig(patch_size=8, embed_dim=64, depth=2, num_heads=2)
    n_classes = 5
    vit_p = init_vit_params(jax.random.PRNGKey(6), cfg, depth=2)
    head_p = init_head(jax.random.PRNGKey(7), "mlp", n_classes, cfg.embed_dim)
    rs = np.random.RandomState(3)
    images = rs.randint(0, 255, (2, 48, 48, 3)).astype(np.uint8)
    labels = rs.randint(0, n_classes, (2, 36)).astype(np.int32)

    opt = make_optimizer("adam", 1e-3)
    ref_vit, ref_head, _, ref_loss, ref_cm = make_train_step(
        cfg, "mlp", n_classes, opt, freeze_backbone=False, donate=False)(
        vit_p, head_p, init_opt_state(opt, vit_p, head_p, False),
        images, labels)

    mesh = make_mesh(8, model_axis=2)
    sptp_step = make_sp_tp_train_step(cfg, "mlp", n_classes, opt, mesh)
    got_vit, got_head, _, got_loss, got_cm = sptp_step(
        vit_p, head_p, init_opt_state(opt, vit_p, head_p, False),
        images, labels)

    np.testing.assert_allclose(float(got_loss), float(ref_loss), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(got_cm), np.asarray(ref_cm))
    for a, b in zip(jax.tree.leaves(got_vit), jax.tree.leaves(ref_vit)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-3)
    for a, b in zip(jax.tree.leaves(got_head), jax.tree.leaves(ref_head)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-3)


def test_sp_train_step_matches_replicated():
    """Training THROUGH the ring (custom VJP): one unfrozen Adam step under
    sequence parallelism == the replicated make_train_step, params matching
    to fp32 reduction-order tolerance."""
    from dino_tpu.models.heads import init_head
    from dino_tpu.parallel.ring_attention import make_sp_train_step
    from dino_tpu.train.loop import (init_opt_state, make_optimizer,
                                     make_train_step)

    cfg = ViTConfig(patch_size=8, embed_dim=64, depth=2, num_heads=2)
    n_classes = 5
    vit_p = init_vit_params(jax.random.PRNGKey(0), cfg, depth=2)
    head_p = init_head(jax.random.PRNGKey(1), "mlp", n_classes, cfg.embed_dim)
    rs = np.random.RandomState(0)
    images = rs.randint(0, 255, (2, 48, 48, 3)).astype(np.uint8)
    labels = rs.randint(0, n_classes, (2, 36)).astype(np.int32)

    opt = make_optimizer("adam", 1e-3)
    ref_step = make_train_step(cfg, "mlp", n_classes, opt,
                               freeze_backbone=False, donate=False)
    ref_out = ref_step(vit_p, head_p,
                       init_opt_state(opt, vit_p, head_p, False),
                       images, labels)
    ref_vit, ref_head, _, ref_loss, _ = ref_out

    mesh = make_mesh(8, model_axis=1)
    sp_step = make_sp_train_step(cfg, "mlp", n_classes, opt, mesh,
                                 seq_axis="data")
    sp_vit, sp_head, _, sp_loss, sp_cm = sp_step(
        vit_p, head_p, init_opt_state(opt, vit_p, head_p, False),
        images, labels)
    assert int(np.asarray(sp_cm).sum()) == 2 * 36  # every patch counted once

    np.testing.assert_allclose(float(sp_loss), float(ref_loss), rtol=1e-5)
    for ref_t, sp_t in zip(jax.tree.leaves(ref_vit), jax.tree.leaves(sp_vit)):
        np.testing.assert_allclose(np.asarray(sp_t), np.asarray(ref_t),
                                   atol=2e-4, rtol=1e-3)
    for ref_t, sp_t in zip(jax.tree.leaves(ref_head),
                           jax.tree.leaves(sp_head)):
        np.testing.assert_allclose(np.asarray(sp_t), np.asarray(ref_t),
                                   atol=2e-4, rtol=1e-3)


def test_sp_zero_matches_sp():
    """zero=True under SP: the Adam moments come back sharded over the
    token axis, numerics identical to the plain SP step, and a second step
    consumes the sharded state (the fit epoch loop's access pattern)."""
    from dino_tpu.models.heads import init_head
    from dino_tpu.parallel.ring_attention import make_sp_train_step
    from dino_tpu.train.loop import init_opt_state, make_optimizer

    cfg = ViTConfig(patch_size=8, embed_dim=64, depth=2, num_heads=2)
    n_classes = 5
    vit_p = init_vit_params(jax.random.PRNGKey(0), cfg, depth=2)
    head_p = init_head(jax.random.PRNGKey(1), "mlp", n_classes, cfg.embed_dim)
    rs = np.random.RandomState(0)
    images = rs.randint(0, 255, (2, 48, 48, 3)).astype(np.uint8)
    labels = rs.randint(0, n_classes, (2, 36)).astype(np.int32)

    opt = make_optimizer("adam", 1e-3)
    mesh = make_mesh(8, model_axis=1)
    ref = make_sp_train_step(cfg, "mlp", n_classes, opt, mesh)(
        vit_p, head_p, init_opt_state(opt, vit_p, head_p, False),
        images, labels)

    z_step = make_sp_train_step(cfg, "mlp", n_classes, opt, mesh, zero=True)
    z_vit, z_head, z_opt, z_loss, z_cm = z_step(
        vit_p, head_p, init_opt_state(opt, vit_p, head_p, False),
        images, labels)

    np.testing.assert_allclose(float(z_loss), float(ref[3]), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(z_cm), np.asarray(ref[4]))
    for a, b in zip(jax.tree.leaves(z_vit), jax.tree.leaves(ref[0])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-4)
    for a, b in zip(jax.tree.leaves(z_head), jax.tree.leaves(ref[1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-4)

    n_dev = jax.device_count()
    n_sharded = 0
    for leaf in jax.tree.leaves(z_opt):
        if hasattr(leaf, "sharding") and leaf.ndim > 0:
            if any(s >= n_dev and s % n_dev == 0 for s in leaf.shape):
                assert not leaf.sharding.is_fully_replicated, leaf.shape
                n_sharded += 1
    assert n_sharded > 0
    # params stay replicated: eval/checkpointing np.asarray them per-host
    for leaf in jax.tree.leaves(z_vit):
        assert leaf.sharding.is_fully_replicated

    z_step(z_vit, z_head, z_opt, images, labels)


def test_sp_train_step_flash_kernels_match_xla():
    """The Pallas per-hop forward+backward kernels (dynamic valid-K bound,
    interpret mode on CPU) give the same SP training step as the XLA hops."""
    from dino_tpu.models.heads import init_head
    from dino_tpu.parallel.ring_attention import make_sp_train_step
    from dino_tpu.train.loop import init_opt_state, make_optimizer

    cfg = ViTConfig(patch_size=8, embed_dim=64, depth=1, num_heads=2)
    n_classes = 4
    vit_p = init_vit_params(jax.random.PRNGKey(2), cfg, depth=1)
    head_p = init_head(jax.random.PRNGKey(3), "mlp", n_classes, cfg.embed_dim)
    rs = np.random.RandomState(1)
    images = rs.randint(0, 255, (1, 48, 48, 3)).astype(np.uint8)
    labels = rs.randint(0, n_classes, (1, 36)).astype(np.int32)

    opt = make_optimizer("adam", 1e-3)
    mesh = make_mesh(8, model_axis=1)
    outs = {}
    for mode in ("off", "force"):
        step = make_sp_train_step(cfg, "mlp", n_classes, opt, mesh,
                                  seq_axis="data", flash=mode)
        outs[mode] = step(vit_p, head_p,
                          init_opt_state(opt, vit_p, head_p, False),
                          images, labels)
    np.testing.assert_allclose(float(outs["force"][3]), float(outs["off"][3]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(outs["force"][0]),
                    jax.tree.leaves(outs["off"][0])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-3)


def test_dyn_bwd_flash_kernel():
    """flash_attention_bwd_dyn == jax.grad of XLA attention restricted to
    the valid-K prefix, given the global lse/D — the kernel the ring
    backward runs per hop, checked directly for several traced bounds
    through one compiled program."""
    from dino_tpu.ops.attention import (attention_xla,
                                        flash_attention_bwd_dyn)
    b, nh, n, nk, hd = 1, 2, 64, 96, 32
    key = jax.random.PRNGKey(7)
    kq, kk, kv, kg = jax.random.split(key, 4)
    q = jax.random.normal(kq, (b, nh, n, hd), jnp.float32)
    k = jax.random.normal(kk, (b, nh, nk, hd), jnp.float32)
    v = jax.random.normal(kv, (b, nh, nk, hd), jnp.float32)
    g = jax.random.normal(kg, (b, nh, n, hd), jnp.float32)
    scale = hd ** -0.5

    fn = jax.jit(lambda q, k, v, g, lse, dsum, vd: flash_attention_bwd_dyn(
        q, g, lse, dsum, k, v, scale, vd, interpret=True))
    for valid in (96, 40, 1):
        kv_valid = k[:, :, :valid], v[:, :, :valid]

        def ref_fn(q, kk_, vv_):
            out, _ = attention_xla(q, kk_, vv_, scale)
            return jnp.sum(out * g)

        dq_ref, dk_ref, dv_ref = jax.grad(ref_fn, argnums=(0, 1, 2))(
            q, *kv_valid)
        # global lse/D over the valid prefix (what the ring fwd merges to)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, kv_valid[0]) * scale
        lse = jax.scipy.special.logsumexp(s, axis=-1, keepdims=True)
        out, _ = attention_xla(q, *kv_valid, scale)
        dsum = jnp.sum(g * out, axis=-1, keepdims=True)
        dq, dk, dv = fn(q, k, v, g, lse, dsum, jnp.int32(valid))
        np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_ref),
                                   atol=2e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(dk[:, :, :valid]),
                                   np.asarray(dk_ref), atol=2e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(dv[:, :, :valid]),
                                   np.asarray(dv_ref), atol=2e-4, rtol=1e-4)
        if valid < nk:  # masked-out tail keys get exactly zero grads
            assert float(jnp.abs(dk[:, :, valid:]).max()) == 0.0
            assert float(jnp.abs(dv[:, :, valid:]).max()) == 0.0


def test_dyn_mask_flash_kernel():
    """The dynamic-bound resident kernel == XLA attention on the valid K
    prefix, for several traced bounds through one compiled program."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from dino_tpu.ops.attention import (attention_xla,
                                        flash_attention_with_lse_dyn)
    b, nh, n, nk, hd = 1, 2, 130, 96, 64
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (b, nh, n, hd), jnp.float32)
    k = jax.random.normal(kk, (b, nh, nk, hd), jnp.float32)
    v = jax.random.normal(kv, (b, nh, nk, hd), jnp.float32)
    scale = hd ** -0.5
    fn = jax.jit(lambda q, k, v, vd: flash_attention_with_lse_dyn(
        q, k, v, scale, vd, interpret=True)[0])
    for valid in (96, 50, 1):
        out = fn(q, k, v, jnp.int32(valid))
        ref, _ = attention_xla(q, k[:, :, :valid], v[:, :, :valid], scale)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=1e-5)


def test_dyn_kernels_split_ladder(monkeypatch):
    """The dyn fwd/bwd VMEM ladder (resident -> resident-split -> masked-XLA
    fallback) is numerically invariant: shrinking the budgets so the same
    shapes take the split and fallback branches reproduces the resident
    branch's out/lse and dq/dk/dv.  This is the path a 960px ring on 1-2
    devices takes, where n_local is far beyond K/V residency (observed
    on-chip: 30M scoped-VMEM ask vs the 16M cap before the ladder)."""
    import dino_tpu.ops.attention as A

    b, nh, n, nk, hd = 1, 2, 64, 96, 64
    key = jax.random.PRNGKey(11)
    kq, kk, kv, kg = jax.random.split(key, 4)
    q = jax.random.normal(kq, (b, nh, n, hd), jnp.float32)
    k = jax.random.normal(kk, (b, nh, nk, hd), jnp.float32)
    v = jax.random.normal(kv, (b, nh, nk, hd), jnp.float32)
    g = jax.random.normal(kg, (b, nh, n, hd), jnp.float32)
    scale = hd ** -0.5
    valid = jnp.int32(50)

    def run_fwd():
        return jax.jit(lambda q, k, v, vd: A.flash_attention_with_lse_dyn(
            q, k, v, scale, vd, interpret=True))(q, k, v, valid)

    def run_bwd(lse, dsum):
        return jax.jit(
            lambda q, g, lse, dsum, k, v, vd: A.flash_attention_bwd_dyn(
                q, g, lse, dsum, k, v, scale, vd, interpret=True))(
            q, g, lse, dsum, k, v, valid)

    out_res, lse_res = run_fwd()
    dq_r, dk_r, dv_r = run_bwd(lse_res[:, :n, :].reshape(b, nh, n, 1),
                               jnp.sum(g * out_res, axis=-1, keepdims=True))

    # fwd: _kv_dbl_bytes(96,64,4)=98304 resident; 60000 -> 2 slices;
    # 10000 -> below even 8 slices -> masked-XLA fallback
    orig_fwd_budget = A._KV_VMEM_BUDGET  # restore the REAL production
    for budget, branch in ((60000, "split"), (10000, "xla")):
        assert (A._split_count(nk, hd, 4, budget) is None) == (branch == "xla")
        monkeypatch.setattr(A, "_KV_VMEM_BUDGET", budget)
        out_b, lse_b = run_fwd()
        np.testing.assert_allclose(np.asarray(out_b), np.asarray(out_res),
                                   atol=2e-5, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(lse_b[:, :n]),
                                   np.asarray(lse_res[:, :n]),
                                   atol=2e-5, rtol=1e-5)
    # value, not a re-hardcoded copy that could go stale if it's retuned
    monkeypatch.setattr(A, "_KV_VMEM_BUDGET", orig_fwd_budget)

    # bwd: score-aware per-row model — per_row = 8*block_q(64) + 4*hd*4
    # + 4*hd*4 = 2560 B/row; full 96 rows = 245760, half = 122880, the
    # 16-row floor (64 splits) = 40960 — budgets straddle those
    for budget, branch in ((130000, "split"), (20000, "xla")):
        monkeypatch.setattr(A, "_DYN_BWD_VMEM_BUDGET", budget)
        dq_b, dk_b, dv_b = run_bwd(
            lse_res[:, :n, :].reshape(b, nh, n, 1),
            jnp.sum(g * out_res, axis=-1, keepdims=True))
        np.testing.assert_allclose(np.asarray(dq_b), np.asarray(dq_r),
                                   atol=2e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(dk_b), np.asarray(dk_r),
                                   atol=2e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(dv_b), np.asarray(dv_r),
                                   atol=2e-4, rtol=1e-4)
