"""Multi-host training: a real 2-process jax.distributed cluster on CPU.

Spawns two processes (2 local devices each) that run the SAME `fit()` over a
4-device global mesh — each host loads only its slab of every global batch
(api.py:_fit_phase multi-host branch) and gradients aggregate inside the
SPMD program — plus one single-process 4-device reference run.  The trained
parameters and metrics must agree: multi-host DP is a pure execution-layout
change, not a numerics change.

This is the live replacement for the reference's dormant NCCL scaffolding
(reference utils.py:467-499) exercised as an actual multi-process cluster.
"""
import json
import os
import subprocess
import sys
import textwrap

import numpy as np
import pytest

from tests import free_port

from tests.test_train_smoke import N_CLASSES, RES, _make_split

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_RUNNER = textwrap.dedent("""
    import json, os, sys
    cfg = json.loads(sys.argv[1])
    os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count="
                               + str(cfg["local_devices"]))
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    if cfg["num_processes"] > 1:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(coordinator_address=cfg["coordinator"],
                                   num_processes=cfg["num_processes"],
                                   process_id=cfg["process_id"])
    assert jax.device_count() == 4, jax.devices()

    import numpy as np
    from dino_tpu import DINOSeg

    model = DINOSeg(data_path=cfg["data"], write_path=cfg["write"],
                    head="linear", n_blocks=1, n_classes=cfg["n_classes"],
                    batch_size=4, lr=1e-2, optimizer="adam",
                    freeze_backbone=True, max_epochs=2, random_init=True,
                    augmented=False, train_resolution=cfg["res"],
                    precision="fp32", seed=0)
    metrics = model.fit(samples_per_epoch=8, cache_features=False)
    if jax.process_index() == 0:
        head = {k: np.asarray(v) for k, v in
                {"k1": model.head_params["layer_1"]["kernel"],
                 "b1": model.head_params["layer_1"]["bias"]}.items()}
        np.savez(os.path.join(cfg["write"], "result.npz"),
                 test_acc=metrics["test_acc"], **head)
""")


def _run(cfgs, timeout=600, runner=None, _retried=False):
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = REPO
    procs = [subprocess.Popen(
        [sys.executable, "-c", runner or _RUNNER, json.dumps(c)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        cwd=REPO) for c in cfgs]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    finally:
        for p in procs:  # a hung rank must not orphan its peers
            if p.poll() is None:
                p.kill()
                p.communicate()
    if (not _retried
            and any(p.returncode != 0 for p in procs)
            and any("Gloo context initialization failed" in o for o in outs)):
        # gloo's 30s key-exchange window at cluster START is a fixed
        # deadline that a loaded CI box can blow while ranks are still
        # compiling; that is infrastructure timing, not product behavior —
        # retry the whole cluster once before failing
        return _run(cfgs, timeout=timeout, runner=runner, _retried=True)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
    return outs


@pytest.fixture(scope="module")
def voc_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("voc_mh"))
    _make_split(root, "train", 8, 0)
    _make_split(root, "val", 4, 1)
    _make_split(root, "test", 4, 2)
    return root


_PRETRAIN_RUNNER = textwrap.dedent("""
    import json, os, sys
    cfg = json.loads(sys.argv[1])
    os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count="
                               + str(cfg["local_devices"]))
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    if cfg["num_processes"] > 1:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(coordinator_address=cfg["coordinator"],
                                   num_processes=cfg["num_processes"],
                                   process_id=cfg["process_id"])
    from dino_tpu.cli.pretrain_dino import main as pretrain_main
    pretrain_main(["--data_path", cfg["data"], "--write_path", cfg["write"],
                   "--arch", "vit_small", "--depth", "1", "--out_dim", "16",
                   "--epochs", "1", "--warmup_epochs", "0",
                   "--batch_size", "4", "--n_local_crops", "2",
                   "--global_size", "32", "--local_size", "16"])
""")


def test_two_process_pretrain_matches_single_process(tmp_path):
    """dt-pretrain-dino under a 2-process cluster: crop randomness is keyed
    per (seed, epoch, image), so both topologies see the same pixels and
    the trained teacher backbones must agree."""
    from PIL import Image

    data = tmp_path / "imgs"
    data.mkdir()
    rs = np.random.RandomState(0)
    for i in range(8):
        Image.fromarray(rs.randint(0, 255, (64, 80, 3), np.uint8)).save(
            data / f"{i}.jpg")
    base = dict(data=str(data))

    w_ref = str(tmp_path / "ref")
    _run([dict(base, write=w_ref, local_devices=4, num_processes=1,
               process_id=0, coordinator="")], runner=_PRETRAIN_RUNNER)

    w_mh = str(tmp_path / "mh")
    port = free_port()
    _run([dict(base, write=w_mh, local_devices=2, num_processes=2,
               process_id=i, coordinator=f"127.0.0.1:{port}")
          for i in range(2)], runner=_PRETRAIN_RUNNER)

    ref = np.load(os.path.join(w_ref, "dino_pretrained_backbone.npz"))
    mh = np.load(os.path.join(w_mh, "dino_pretrained_backbone.npz"))
    assert set(ref.files) == set(mh.files)
    for k in ref.files:
        np.testing.assert_allclose(mh[k], ref[k], rtol=1e-4, atol=1e-5,
                                   err_msg=k)


_SP_RUNNER = textwrap.dedent("""
    import json, os, sys
    cfg = json.loads(sys.argv[1])
    os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count="
                               + str(cfg["local_devices"]))
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    if cfg["num_processes"] > 1:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(coordinator_address=cfg["coordinator"],
                                   num_processes=cfg["num_processes"],
                                   process_id=cfg["process_id"])
    assert jax.device_count() == 4, jax.devices()

    import numpy as np
    from dino_tpu import DINOSeg

    model = DINOSeg(data_path=cfg["data"], write_path=cfg["write"],
                    head="mlp", n_blocks=1, n_classes=cfg["n_classes"],
                    batch_size=2, lr=1e-3, optimizer="adam",
                    freeze_backbone=False, max_epochs=1, random_init=True,
                    augmented=False, train_resolution=cfg["res"],
                    precision="fp32", seed=0)
    metrics = model.fit(samples_per_epoch=6, parallelism="sp")
    if jax.process_index() == 0:
        np.savez(os.path.join(cfg["write"], "result.npz"),
                 test_acc=metrics["test_acc"],
                 k1=np.asarray(model.head_params["layer_1"]["kernel"]),
                 qkv=np.asarray(
                     model.vit_params["blocks"][0]["attn"]["qkv"]["kernel"]))
""")


def test_two_process_sp_fit_matches_single_process(voc_root, tmp_path):
    """fit(parallelism='sp') with ONE ring spanning both processes' devices
    (2x2 = 4-device ring): trained params match the single-process 4-device
    SP run — multi-host SP is a pure execution-layout change."""
    base = dict(data=voc_root, n_classes=N_CLASSES, res=RES)

    w_ref = str(tmp_path / "sp_ref")
    _run([dict(base, write=w_ref, local_devices=4, num_processes=1,
               process_id=0, coordinator="")], runner=_SP_RUNNER)

    w_mh = str(tmp_path / "sp_mh")
    port = free_port()
    _run([dict(base, write=w_mh, local_devices=2, num_processes=2,
               process_id=i, coordinator=f"127.0.0.1:{port}")
          for i in range(2)], runner=_SP_RUNNER)

    ref = np.load(os.path.join(w_ref, "result.npz"))
    mh = np.load(os.path.join(w_mh, "result.npz"))
    np.testing.assert_allclose(mh["k1"], ref["k1"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(mh["qkv"], ref["qkv"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(mh["test_acc"]),
                               float(ref["test_acc"]), atol=1e-6)


def test_two_process_fit_matches_single_process(voc_root, tmp_path):
    base = dict(data=voc_root, n_classes=N_CLASSES, res=RES)

    w_ref = str(tmp_path / "ref")
    _run([dict(base, write=w_ref, local_devices=4, num_processes=1,
               process_id=0, coordinator="")])

    w_mh = str(tmp_path / "mh")
    port = free_port()
    _run([dict(base, write=w_mh, local_devices=2, num_processes=2,
               process_id=i, coordinator=f"127.0.0.1:{port}")
          for i in range(2)])

    ref = np.load(os.path.join(w_ref, "result.npz"))
    mh = np.load(os.path.join(w_mh, "result.npz"))
    # same global batches, same math — only the psum layout differs
    np.testing.assert_allclose(mh["k1"], ref["k1"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(mh["b1"], ref["b1"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(mh["test_acc"]),
                               float(ref["test_acc"]), atol=1e-6)


_ZERO_RESUME_RUNNER = textwrap.dedent("""
    import json, os, sys
    cfg = json.loads(sys.argv[1])
    os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count="
                               + str(cfg["local_devices"]))
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    if cfg["num_processes"] > 1:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(coordinator_address=cfg["coordinator"],
                                   num_processes=cfg["num_processes"],
                                   process_id=cfg["process_id"])
    assert jax.device_count() == 4, jax.devices()

    import numpy as np
    from dino_tpu import DINOSeg

    kw = dict(data_path=cfg["data"], write_path=cfg["write"],
              head="linear", n_blocks=1, n_classes=cfg["n_classes"],
              batch_size=4, lr=1e-2, optimizer="adam",
              freeze_backbone=False, random_init=True,
              augmented=False, train_resolution=cfg["res"],
              precision="fp32", seed=0)
    # epoch-end save with ZeRO-sharded moments: the moments span BOTH
    # processes' devices, so host 0 alone cannot materialize them — the
    # save path must gather collectively (api.py resume_state allgather)
    model = DINOSeg(max_epochs=1, **kw)
    model.fit(samples_per_epoch=8, ck_file_name="zr", zero=True,
              resume=True)
    # resume leg: a fresh model continues from the saved state
    model2 = DINOSeg(max_epochs=2, **kw)
    metrics = model2.fit(samples_per_epoch=8, ck_file_name="zr", zero=True,
                         resume=True)
    if jax.process_index() == 0:
        np.savez(os.path.join(cfg["write"], "result.npz"),
                 test_acc=metrics["test_acc"],
                 k1=np.asarray(model2.head_params["layer_1"]["kernel"]))
""")


def test_two_process_zero_resume(voc_root, tmp_path):
    """fit(zero=True, resume=True) on the 2-process cluster: the epoch-end
    resume save must gather the cross-host ZeRO-sharded Adam moments
    (host 0 alone cannot np.asarray them), and the resumed run matches the
    single-process one."""
    base = dict(data=voc_root, n_classes=N_CLASSES, res=RES)

    w_ref = str(tmp_path / "zr_ref")
    _run([dict(base, write=w_ref, local_devices=4, num_processes=1,
               process_id=0, coordinator="")], runner=_ZERO_RESUME_RUNNER)

    w_mh = str(tmp_path / "zr_mh")
    port = free_port()
    _run([dict(base, write=w_mh, local_devices=2, num_processes=2,
               process_id=i, coordinator=f"127.0.0.1:{port}")
          for i in range(2)], runner=_ZERO_RESUME_RUNNER)

    ref = np.load(os.path.join(w_ref, "result.npz"))
    mh = np.load(os.path.join(w_mh, "result.npz"))
    np.testing.assert_allclose(mh["k1"], ref["k1"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(mh["test_acc"]),
                               float(ref["test_acc"]), atol=1e-6)


_FSDP_RESUME_RUNNER = textwrap.dedent("""
    import json, os, sys
    cfg = json.loads(sys.argv[1])
    os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count="
                               + str(cfg["local_devices"]))
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    if cfg["num_processes"] > 1:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(coordinator_address=cfg["coordinator"],
                                   num_processes=cfg["num_processes"],
                                   process_id=cfg["process_id"])
    assert jax.device_count() == 4, jax.devices()

    import numpy as np
    from dino_tpu import DINOSeg

    kw = dict(data_path=cfg["data"], write_path=cfg["write"],
              head="linear", n_blocks=1, n_classes=cfg["n_classes"],
              batch_size=4, lr=1e-2, optimizer="adam",
              freeze_backbone=False, random_init=True,
              augmented=False, train_resolution=cfg["res"],
              precision="fp32", seed=0)
    # FSDP: params AND moments shard over BOTH processes' devices and stay
    # sharded across steps; the epoch-end best-ckpt/resume saves and the
    # per-epoch eval must gather collectively (host 0 alone cannot
    # np.asarray shards living on the other host's devices)
    model = DINOSeg(max_epochs=1, **kw)
    model.fit(samples_per_epoch=8, ck_file_name="fr", fsdp=True,
              resume=True)
    # resume leg: a fresh model continues from the gathered state
    model2 = DINOSeg(max_epochs=2, **kw)
    metrics = model2.fit(samples_per_epoch=8, ck_file_name="fr", fsdp=True,
                         resume=True)
    # fit() ends by reloading the best checkpoint, so head_params are
    # host-local npz-backed arrays on every rank here
    if jax.process_index() == 0:
        np.savez(os.path.join(cfg["write"], "result.npz"),
                 test_acc=metrics["test_acc"],
                 k1=np.asarray(model2.head_params["layer_1"]["kernel"]))
""")


def test_two_process_fsdp_fit_resume_matches_single_process(voc_root,
                                                            tmp_path):
    """fit(fsdp=True, resume=True) on the 2-process cluster: the train
    state shards across BOTH hosts' devices, epoch-end saves and evals
    gather collectively, and the resumed run matches the single-process
    FSDP run (the api.py:815 single-host raise is gone)."""
    base = dict(data=voc_root, n_classes=N_CLASSES, res=RES)

    w_ref = str(tmp_path / "fr_ref")
    _run([dict(base, write=w_ref, local_devices=4, num_processes=1,
               process_id=0, coordinator="")], runner=_FSDP_RESUME_RUNNER)

    w_mh = str(tmp_path / "fr_mh")
    port = free_port()
    _run([dict(base, write=w_mh, local_devices=2, num_processes=2,
               process_id=i, coordinator=f"127.0.0.1:{port}")
          for i in range(2)], runner=_FSDP_RESUME_RUNNER)

    ref = np.load(os.path.join(w_ref, "result.npz"))
    mh = np.load(os.path.join(w_mh, "result.npz"))
    np.testing.assert_allclose(mh["k1"], ref["k1"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(mh["test_acc"]),
                               float(ref["test_acc"]), atol=1e-6)


_AGREE_RUNNER = textwrap.dedent("""
    import json, os, sys
    cfg = json.loads(sys.argv[1])
    os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count="
                               + str(cfg["local_devices"]))
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=cfg["coordinator"],
                               num_processes=cfg["num_processes"],
                               process_id=cfg["process_id"])
    from dino_tpu.parallel.dist import agree_across_hosts

    # agreement returns host 0's value everywhere
    v = agree_across_hosts("same", 7.0)
    assert float(v[0]) == 7.0, v

    # disagreement must raise on EVERY rank — the writing host (rank 0)
    # included, or it sails into the epoch loop and hangs at the first
    # collective while the others have already died
    try:
        agree_across_hosts("resume epoch", float(jax.process_index()))
    except RuntimeError as e:
        assert "disagree" in str(e), e
    else:
        raise SystemExit(f"rank {jax.process_index()} did not raise")
""")


def test_agree_across_hosts_raises_on_every_rank(tmp_path):
    """On divergent values, agree_across_hosts raises on all ranks (rank 0
    too): allgather-and-compare, not broadcast-and-check-locally."""
    port = free_port()
    _run([dict(local_devices=2, num_processes=2, process_id=i,
               coordinator=f"127.0.0.1:{port}") for i in range(2)],
         runner=_AGREE_RUNNER, timeout=300)


_SP_ZERO_RESUME_RUNNER = textwrap.dedent("""
    import json, os, sys
    cfg = json.loads(sys.argv[1])
    os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count="
                               + str(cfg["local_devices"]))
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    if cfg["num_processes"] > 1:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(coordinator_address=cfg["coordinator"],
                                   num_processes=cfg["num_processes"],
                                   process_id=cfg["process_id"])
    assert jax.device_count() == 4, jax.devices()

    import numpy as np
    from dino_tpu import DINOSeg

    kw = dict(data_path=cfg["data"], write_path=cfg["write"],
              head="mlp", n_blocks=1, n_classes=cfg["n_classes"],
              batch_size=2, lr=1e-3, optimizer="adam",
              freeze_backbone=False, random_init=True,
              augmented=False, train_resolution=cfg["res"],
              precision="fp32", seed=0)
    # SP+ZeRO: the Adam moments shard over the TOKEN axis (one ring spans
    # both processes' devices), so the epoch-end resume save must gather
    # collectively even though batch sharding (and with it zero_mesh /
    # multi_host) never engages — the regression this pins crashed host 0
    # with 'spans non-addressable devices' and hung the other rank at the
    # epoch barrier.
    model = DINOSeg(max_epochs=1, **kw)
    model.fit(samples_per_epoch=6, ck_file_name="spzr", parallelism="sp",
              zero=True, resume=True)
    model2 = DINOSeg(max_epochs=2, **kw)
    metrics = model2.fit(samples_per_epoch=6, ck_file_name="spzr",
                         parallelism="sp", zero=True, resume=True)
    if jax.process_index() == 0:
        np.savez(os.path.join(cfg["write"], "result.npz"),
                 test_acc=metrics["test_acc"],
                 k1=np.asarray(model2.head_params["layer_1"]["kernel"]))
""")


def test_two_process_sp_zero_resume(voc_root, tmp_path):
    """fit(parallelism='sp', zero=True, resume=True) on the 2-process
    cluster: token-axis ZeRO moments span non-addressable devices, so the
    epoch-end save must allgather (api.py sp_zero gate); the resumed run
    matches the single-process 4-device one."""
    base = dict(data=voc_root, n_classes=N_CLASSES, res=RES)

    w_ref = str(tmp_path / "spzr_ref")
    _run([dict(base, write=w_ref, local_devices=4, num_processes=1,
               process_id=0, coordinator="")], runner=_SP_ZERO_RESUME_RUNNER)

    w_mh = str(tmp_path / "spzr_mh")
    port = free_port()
    _run([dict(base, write=w_mh, local_devices=2, num_processes=2,
               process_id=i, coordinator=f"127.0.0.1:{port}")
          for i in range(2)], runner=_SP_ZERO_RESUME_RUNNER)

    ref = np.load(os.path.join(w_ref, "result.npz"))
    mh = np.load(os.path.join(w_mh, "result.npz"))
    np.testing.assert_allclose(mh["k1"], ref["k1"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(mh["test_acc"]),
                               float(ref["test_acc"]), atol=1e-6)


_ANY_RUNNER = textwrap.dedent("""
    import json, os, sys
    cfg = json.loads(sys.argv[1])
    os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count="
                               + str(cfg["local_devices"]))
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=cfg["coordinator"],
                               num_processes=cfg["num_processes"],
                               process_id=cfg["process_id"])
    from dino_tpu.parallel.dist import any_across_hosts

    # a flag set on ONE rank is seen by every rank (preemption agreement:
    # SIGTERM lands on each host at a different moment, all must stop at
    # the same step)
    assert any_across_hosts(jax.process_index() == 1) is True
    # and no rank fabricates a stop
    assert any_across_hosts(False) is False
""")


def test_any_across_hosts(tmp_path):
    """any_across_hosts: one rank's flag is every rank's decision."""
    port = free_port()
    _run([dict(local_devices=2, num_processes=2, process_id=i,
               coordinator=f"127.0.0.1:{port}") for i in range(2)],
         runner=_ANY_RUNNER, timeout=300)


_PP_RESUME_RUNNER = textwrap.dedent("""
    import json, os, sys
    cfg = json.loads(sys.argv[1])
    os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count="
                               + str(cfg["local_devices"]))
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    if cfg["num_processes"] > 1:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(coordinator_address=cfg["coordinator"],
                                   num_processes=cfg["num_processes"],
                                   process_id=cfg["process_id"])
    assert jax.device_count() == 4, jax.devices()

    import numpy as np
    from dino_tpu import DINOSeg

    kw = dict(data_path=cfg["data"], write_path=cfg["write"],
              head="mlp", n_blocks=4, n_classes=cfg["n_classes"],
              batch_size=4, lr=1e-3, optimizer="adam",
              freeze_backbone=False, random_init=True,
              augmented=False, train_resolution=cfg["res"],
              precision="fp32", seed=0)
    # PP: the 4-stage ring spans BOTH processes' devices; block weights and
    # Adam moments live 1/S per device across hosts, so the epoch-end
    # unstack, best-ckpt save, and resume save must all gather
    # collectively.  samples_per_epoch=6 also exercises the ragged tail
    # through the pipelined step under multi-host.
    pp = dict(parallelism="pp", pp_microbatches=2,
              cache_features=False, samples_per_epoch=6,
              ck_file_name="ppmh", resume=True)
    model = DINOSeg(max_epochs=1, **kw)
    model.fit(**pp)
    model2 = DINOSeg(max_epochs=2, **kw)
    metrics = model2.fit(**pp)
    if jax.process_index() == 0:
        np.savez(os.path.join(cfg["write"], "result.npz"),
                 test_acc=metrics["test_acc"],
                 k1=np.asarray(model2.head_params["layer_1"]["kernel"]),
                 qkv=np.asarray(
                     model2.vit_params["blocks"][2]["attn"]["qkv"]["kernel"]))
""")


def test_two_process_pp_fit_resume_matches_single_process(voc_root,
                                                          tmp_path):
    """fit(parallelism='pp', resume=True) on the 2-process cluster: one
    4-stage pipeline ring spans both hosts' devices (stage-sharded
    weights + moments), epoch-end unstack/saves gather collectively, and
    the resumed run matches the single-process 4-device PP run (the
    api.py single-host raise is gone — round 5)."""
    base = dict(data=voc_root, n_classes=N_CLASSES, res=RES)

    w_ref = str(tmp_path / "ppmh_ref")
    _run([dict(base, write=w_ref, local_devices=4, num_processes=1,
               process_id=0, coordinator="")], runner=_PP_RESUME_RUNNER,
         timeout=1200)

    w_mh = str(tmp_path / "ppmh_mh")
    port = free_port()
    _run([dict(base, write=w_mh, local_devices=2, num_processes=2,
               process_id=i, coordinator=f"127.0.0.1:{port}")
          for i in range(2)], runner=_PP_RESUME_RUNNER, timeout=1200)

    ref = np.load(os.path.join(w_ref, "result.npz"))
    mh = np.load(os.path.join(w_mh, "result.npz"))
    np.testing.assert_allclose(mh["k1"], ref["k1"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(mh["qkv"], ref["qkv"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(mh["test_acc"]),
                               float(ref["test_acc"]), atol=1e-6)
