"""dt-serve HTTP daemon: predict over the wire matches in-process predict."""
import io
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from tests import free_port
from PIL import Image

from dino_tpu import DINOSeg, export_predict
from dino_tpu.cli.serve import make_server


def _post(url, img):
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    req = urllib.request.Request(url, data=buf.getvalue(), method="POST")
    with urllib.request.urlopen(req, timeout=120) as resp:
        return resp.read(), resp.headers.get("Content-Type")


@pytest.fixture(scope="module")
def model(tmp_path_factory):
    m = DINOSeg(head="linear", n_blocks=1, n_classes=4, random_init=True,
                seed=0, precision="fp32")
    m.set_resolution(64)
    return m


def _serve(server):
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    return t


def test_serve_checkpoint(model, tmp_path):
    ckpt = str(tmp_path / "m.ckpt.npz")
    model.save(ckpt)
    port = free_port()
    server = make_server(ckpt, port=port, resolution=64, precision="fp32")
    _serve(server)
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            health = r.read().decode()
        assert '"ok": true' in health and '"backend": "model"' in health

        img = np.random.RandomState(0).randint(0, 255, (100, 120, 3),
                                               np.uint8)
        body, ctype = _post(f"http://127.0.0.1:{port}/predict", img)
        assert ctype == "application/octet-stream"
        labels = np.load(io.BytesIO(body))
        np.testing.assert_array_equal(labels, model.predict(img))

        body, ctype = _post(f"http://127.0.0.1:{port}/predict?format=png",
                            img)
        assert ctype == "image/png"
        assert Image.open(io.BytesIO(body)).size == (480, 480)

        # JPEG request body: decodes through the native C++ loader when
        # available (GIL-free, the round-4 serving-decode fix) and must
        # produce exactly what predict() gives on the same decoded pixels
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="JPEG", quality=92)
        jb = buf.getvalue()
        from dino_tpu.data.native_loader import decode_bytes
        decoded = decode_bytes(jb)
        if decoded is None:  # no native toolchain: PIL decodes the body
            decoded = np.asarray(Image.open(io.BytesIO(jb)).convert("RGB"))
        req = urllib.request.Request(f"http://127.0.0.1:{port}/predict",
                                     data=jb, method="POST")
        with urllib.request.urlopen(req, timeout=120) as resp:
            labels_j = np.load(io.BytesIO(resp.read()))
        np.testing.assert_array_equal(labels_j, model.predict(decoded))
    finally:
        server.shutdown()


def test_serve_artifact(model, tmp_path):
    """Artifact backend: requests resize to the contract's input shape."""
    art = str(tmp_path / "p.shlo")
    export_predict(model, art, batch_size=1, in_shape=(100, 120))
    port = free_port()
    server = make_server(art, port=port)
    _serve(server)
    try:
        img = np.random.RandomState(1).randint(0, 255, (100, 120, 3),
                                               np.uint8)
        body, _ = _post(f"http://127.0.0.1:{port}/predict", img)
        labels = np.load(io.BytesIO(body))
        np.testing.assert_array_equal(labels,
                                      model.predict_batch(img[None])[0])
        # a differently-sized frame is resized to the contract shape
        img2 = np.random.RandomState(2).randint(0, 255, (64, 64, 3),
                                                np.uint8)
        body2, _ = _post(f"http://127.0.0.1:{port}/predict", img2)
        assert np.load(io.BytesIO(body2)).shape == (480, 480)
        # cold-start telemetry: artifact load + first-inference time is
        # measured at startup and published on /healthz (round 4)
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            health = json.loads(r.read())
        cold = health["cold_start"]
        assert set(cold) == {"artifact_load_s", "first_infer_s",
                             "total_cold_start_s"}
        assert cold["total_cold_start_s"] > 0
    finally:
        server.shutdown()


def test_serve_batched_artifact(model, tmp_path):
    """A throughput (batch>1) artifact still serves single frames: the
    request tiles to the contract batch and returns the first map."""
    art = str(tmp_path / "b3.shlo")
    export_predict(model, art, batch_size=3, in_shape=(100, 120))
    port = free_port()
    server = make_server(art, port=port)
    _serve(server)
    try:
        img = np.random.RandomState(3).randint(0, 255, (100, 120, 3),
                                               np.uint8)
        body, _ = _post(f"http://127.0.0.1:{port}/predict", img)
        labels = np.load(io.BytesIO(body))
        np.testing.assert_array_equal(
            labels, model.predict_batch(np.stack([img] * 3))[0])
    finally:
        server.shutdown()


def test_serve_dynamic_batching(model, tmp_path):
    """--max_batch: concurrent requests coalesce server-side; every client
    gets the same labels the single-flight server would return (fp32 ->
    batch-N and batch-1 programs are bit-identical, PERF.md)."""
    ckpt = str(tmp_path / "m.ckpt.npz")
    model.save(ckpt)
    port = free_port()
    server = make_server(ckpt, port=port, resolution=64, precision="fp32",
                         max_batch=4, batch_timeout_ms=200.0)
    _serve(server)
    try:
        rs = np.random.RandomState(4)
        imgs = [rs.randint(0, 255, (100, 120, 3), np.uint8)
                for _ in range(6)]
        want = [model.predict(im, precision="fp32") for im in imgs]

        results = [None] * len(imgs)

        def req(i):
            body, _ = _post(f"http://127.0.0.1:{port}/predict", imgs[i])
            results[i] = np.load(io.BytesIO(body))

        threads = [threading.Thread(target=req, args=(i,))
                   for i in range(len(imgs))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        for got, exp in zip(results, want):
            np.testing.assert_array_equal(got, exp)

        # health reports the batching contract
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
            assert '"max_batch": 4' in r.read().decode()
    finally:
        server.shutdown()


def test_serve_dynamic_batching_mixed_shapes(model, tmp_path):
    """Frames of different shapes land in the same batching window but run
    in per-shape groups — both shapes answer correctly."""
    ckpt = str(tmp_path / "m2.ckpt.npz")
    model.save(ckpt)
    port = free_port()
    server = make_server(ckpt, port=port, resolution=64, precision="fp32",
                         max_batch=4, batch_timeout_ms=200.0)
    _serve(server)
    try:
        rs = np.random.RandomState(5)
        a = rs.randint(0, 255, (100, 120, 3), np.uint8)
        b = rs.randint(0, 255, (64, 64, 3), np.uint8)
        want = {0: model.predict(a, precision="fp32"),
                1: model.predict(b, precision="fp32")}
        results = {}

        def req(i, im):
            body, _ = _post(f"http://127.0.0.1:{port}/predict", im)
            results[i] = np.load(io.BytesIO(body))

        threads = [threading.Thread(target=req, args=(0, a)),
                   threading.Thread(target=req, args=(1, b))]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        np.testing.assert_array_equal(results[0], want[0])
        np.testing.assert_array_equal(results[1], want[1])
    finally:
        server.shutdown()


def test_bucket_caps_at_max_batch():
    """A full --max_batch round runs the exact max_batch program; partial
    rounds pad to powers of two below it."""
    from dino_tpu.cli.serve import _bucket
    assert [_bucket(n, 3) for n in (1, 2, 3)] == [1, 2, 3]
    assert [_bucket(n, 8) for n in (1, 2, 3, 5, 8)] == [1, 2, 4, 8, 8]
    assert _bucket(3) == 4  # no cap configured


def test_serve_stats_endpoint(model, tmp_path):
    import json
    ckpt = str(tmp_path / "m.ckpt.npz")
    model.save(ckpt)
    port = free_port()
    server = make_server(ckpt, port=port, resolution=64, precision="fp32",
                         max_batch=2, batch_timeout_ms=20.0)
    _serve(server)
    try:
        def get_stats():
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/stats", timeout=30) as r:
                return json.loads(r.read().decode())

        s0 = get_stats()
        assert s0["requests"] == 0 and s0["errors"] == 0
        assert "latency_ms" not in s0  # no window yet

        img = np.random.RandomState(0).randint(0, 255, (64, 64, 3), np.uint8)
        # two concurrent requests -> should coalesce into one batch-2 round
        results = [None, None]

        def hit(i):
            results[i] = _post(f"http://127.0.0.1:{port}/predict", img)

        ts = [threading.Thread(target=hit, args=(i,)) for i in range(2)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        # a bad request increments errors
        req = urllib.request.Request(f"http://127.0.0.1:{port}/predict",
                                     data=b"not an image", method="POST")
        with pytest.raises(urllib.error.HTTPError):
            urllib.request.urlopen(req, timeout=30)

        s = get_stats()
        assert s["requests"] == 3 and s["errors"] == 1
        assert s["latency_ms"]["window"] == 2
        assert s["latency_ms"]["p50"] > 0
        rounds = {int(k): v for k, v in s["batch_rounds"].items()}
        assert sum(k * v for k, v in rounds.items()) == 2  # both frames ran
        assert s["uptime_s"] >= 0
    finally:
        server.shutdown()


def test_batcher_exception_nets():
    """_Batcher survives BOTH failure domains without hanging waiters:
    (a) predict_many raising fails exactly that group's requests (inner
    net); (b) a raise OUTSIDE the per-group try — e.g. stats.record_round
    — fails the drained requests and the dispatcher keeps serving (outer
    net).  Either way the loop stays alive for subsequent requests."""
    from dino_tpu.cli.serve import _Batcher

    calls = {"n": 0}

    def predict_many(imgs):
        calls["n"] += 1
        if calls["n"] == 1:
            raise ValueError("backend poisoned for this group")
        return [im.sum() for im in imgs]

    class BadStats:
        def __init__(self):
            self.raised = False

        def record_round(self, n):
            if not self.raised:
                self.raised = True
                raise RuntimeError("stats bug")

    img = np.arange(12, dtype=np.uint8).reshape(2, 2, 3)

    # (a) inner net: group failure surfaces to the caller, loop survives
    b = _Batcher(predict_many, max_batch=2, timeout_s=0.01)
    with pytest.raises(ValueError, match="poisoned"):
        b(img)
    assert b(img) == img.sum()  # dispatcher still alive

    # (b) outer net: a stats raise (outside the per-group try) fails the
    # drained request visibly instead of killing the dispatcher thread
    bad = BadStats()
    b2 = _Batcher(predict_many, max_batch=2, timeout_s=0.01, stats=bad)
    with pytest.raises(RuntimeError, match="stats bug"):
        b2(img)
    assert bad.raised
    assert b2(img) == img.sum()  # loop alive after the round-level failure

    # (c) short return: a backend that silently returns fewer results than
    # the group must fail the group visibly — zip() skipping the unmatched
    # request would leave its waiter blocked forever on done.wait()
    def predict_short(imgs):
        return [im.sum() for im in imgs][:-1] if len(imgs) else []

    b3 = _Batcher(predict_short, max_batch=2, timeout_s=0.01)
    with pytest.raises(RuntimeError, match="returned 0 results"):
        b3(img)
    assert b3.__call__ is not None  # dispatcher thread still alive
    with pytest.raises(RuntimeError, match="returned 0 results"):
        b3(img)  # and still answering (with the visible error)


def test_serve_wire_formats(model, tmp_path):
    """Content negotiation on /predict: ?format=npy8 (and the
    Accept: application/x-npy-uint8 header) answer uint8 .npy — byte-equal
    labels at 1/4 the response bytes (the round-4-measured bandwidth
    regime); ?format=pngl answers a lossless grayscale PNG the client
    reads class ids straight out of.  The bare route keeps the int32
    compatibility contract."""
    ckpt = str(tmp_path / "m.ckpt.npz")
    model.save(ckpt)
    port = free_port()
    server = make_server(ckpt, port=port, resolution=64, precision="fp32")
    _serve(server)
    try:
        img = np.random.RandomState(7).randint(0, 255, (100, 120, 3),
                                               np.uint8)
        want = model.predict(img)

        body32, ctype32 = _post(f"http://127.0.0.1:{port}/predict", img)
        assert ctype32 == "application/octet-stream"
        lab32 = np.load(io.BytesIO(body32))
        assert lab32.dtype == np.int32
        np.testing.assert_array_equal(lab32, want)

        body8, ctype8 = _post(
            f"http://127.0.0.1:{port}/predict?format=npy8", img)
        assert ctype8 == "application/x-npy-uint8"
        lab8 = np.load(io.BytesIO(body8))
        assert lab8.dtype == np.uint8
        np.testing.assert_array_equal(lab8, want)
        # the headline claim: payload bytes drop ~4x (npy header excepted)
        assert len(body8) < len(body32) / 3.9

        # Accept-header negotiation selects the same representation
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="PNG")
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=buf.getvalue(),
            method="POST", headers={"Accept": "application/x-npy-uint8"})
        with urllib.request.urlopen(req, timeout=120) as resp:
            assert resp.headers.get("Content-Type") == \
                "application/x-npy-uint8"
            np.testing.assert_array_equal(
                np.load(io.BytesIO(resp.read())), want)

        # lossless label PNG: smallest wire format, exact class ids back
        bodyp, ctypep = _post(
            f"http://127.0.0.1:{port}/predict?format=pngl", img)
        assert ctypep == "image/png"
        labp = np.asarray(Image.open(io.BytesIO(bodyp)))
        np.testing.assert_array_equal(labp, want)
        assert len(bodyp) < len(body8)
    finally:
        server.shutdown()


def test_serve_compile_cache(model, tmp_path):
    """--compile_cache: the first server run persists the predict
    executable; a second cold start reads it back (healthz warm_hit=True,
    no new cache entries) and serves identical labels."""
    import jax

    ckpt = str(tmp_path / "m.ckpt.npz")
    model.save(ckpt)
    cache = str(tmp_path / "xla_cache")
    img = np.random.RandomState(9).randint(0, 255, (64, 64, 3), np.uint8)

    def one_run():
        port = free_port()
        server = make_server(ckpt, port=port, resolution=64,
                             precision="fp32", compile_cache=cache)
        _serve(server)
        try:
            with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/healthz", timeout=30) as r:
                health = json.loads(r.read())
            body, _ = _post(f"http://127.0.0.1:{port}/predict", img)
            return health, np.load(io.BytesIO(body))
        finally:
            server.shutdown()

    try:
        h1, lab1 = one_run()
        cc1 = h1["compile_cache"]
        assert cc1["dir"] == cache
        assert cc1["entries_after"] > cc1["entries_before"]  # compiled+wrote
        assert not cc1["warm_hit"]
        assert h1["cold_start"]["first_infer_s"] > 0

        h2, lab2 = one_run()
        cc2 = h2["compile_cache"]
        assert cc2["entries_before"] == cc1["entries_after"]
        assert cc2["warm_hit"], cc2  # no recompile: read back from disk
        np.testing.assert_array_equal(lab1, lab2)
    finally:
        # the cache dir is process-global jax config: restore for the suite
        jax.config.update("jax_compilation_cache_dir", None)
