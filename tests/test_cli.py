"""CLI parity: dataset build tools + experiment driver + visualization, run
end-to-end on synthetic data (CPU, tiny resolution)."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_cli(mod, *args):
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    return subprocess.run([sys.executable, "-m", f"dino_tpu.cli.{mod}",
                           *map(str, args)], capture_output=True, text=True,
                          env=env, cwd=REPO, timeout=600)


@pytest.fixture(scope="module")
def labels_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("labels") / "labels.txt"
    p.write_text("__ignore__\n_background_\nyellow-lane\nwhite-lane\n")
    return str(p)


def test_sim2voc_and_split(tmp_path, labels_file):
    # synthetic sim data: raw frames + rendering masks
    rs = np.random.RandomState(0)
    (tmp_path / "sim" / "images").mkdir(parents=True)
    (tmp_path / "sim" / "labels").mkdir(parents=True)
    for i in range(6):
        raw = np.full((64, 64, 3), 30, np.uint8)
        render = np.zeros((64, 64, 3), np.uint8)
        render[10:20, 10:20] = [255, 255, 0]    # yellow-lane render color
        raw[10:20, 10:20] = [255, 230, 40]      # yellowish raw pixels
        render[40:50, 40:50] = [255, 255, 255]  # white-lane
        raw[40:50, 40:50] = [250, 250, 250]
        render[55:60, 0:5] = [0, 0, 153]        # barrier: NOT in labels file
        Image.fromarray(raw).save(tmp_path / "sim" / "images" / f"{i}.png")
        Image.fromarray(render).save(tmp_path / "sim" / "labels" / f"{i}.png")

    out = tmp_path / "voc"
    r = run_cli("sim2voc", tmp_path / "sim", out, "--labels", labels_file)
    assert r.returncode == 0, r.stderr
    masks = sorted((out / "SegmentationClass").glob("*.npy"))
    assert len(masks) == 6
    m = np.load(masks[0])
    assert set(np.unique(m)) <= {0, 1, 2}
    assert (m[12, 12] == 1) and (m[45, 45] == 2)
    assert m[57, 2] == 0  # barrier zeroed (class not in labels file)
    assert (out / "class_names.txt").exists()
    assert (out / "SegmentationClassPNG" / "0.png").exists()
    assert (out / "SegmentationClassVisualization" / "0.jpg").exists()

    r = run_cli("split_dataset", out, "--n_test", 2, "--n_val", 1)
    assert r.returncode == 0, r.stderr
    assert len(list((tmp_path / "voc_test" / "JPEGImages").glob("*.jpg"))) == 2
    assert len(list((tmp_path / "voc_val" / "JPEGImages").glob("*.jpg"))) == 1
    assert len(list((tmp_path / "voc_train" / "JPEGImages").glob("*.jpg"))) == 3


def test_labelme2voc(tmp_path, labels_file):
    import base64, io
    img = np.full((48, 48, 3), 40, np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG")
    ann = {
        "shapes": [
            {"label": "yellow-lane", "shape_type": "polygon",
             "points": [[5, 5], [20, 5], [20, 20], [5, 20]]},
            {"label": "white-lane", "shape_type": "rectangle",
             "points": [[30, 30], [40, 40]]},
        ],
        "imageData": base64.b64encode(buf.getvalue()).decode(),
        "imageHeight": 48, "imageWidth": 48,
    }
    (tmp_path / "ann").mkdir()
    (tmp_path / "ann" / "f0.json").write_text(json.dumps(ann))

    out = tmp_path / "voc"
    r = run_cli("labelme2voc", tmp_path / "ann", out, "--labels", labels_file)
    assert r.returncode == 0, r.stderr
    m = np.load(out / "SegmentationClass" / "f0.npy")
    assert m[10, 10] == 1 and m[35, 35] == 2 and m[0, 0] == 0


def test_run_experiment_and_visualize(tmp_path, labels_file):
    # tiny VOC dataset in the run_experiment layout
    from tests.test_train_smoke import _make_split
    root = tmp_path / "data"
    root.mkdir()
    _make_split(str(root), "train", 8, 0)
    _make_split(str(root), "val", 3, 1)
    _make_split(str(root), "test", 3, 2)
    (root / "labels.txt").write_text(
        "__ignore__\n_background_\nred\ngreen\n")  # 3 classes = smoke classes

    write = tmp_path / "results"
    r = run_cli("run_experiment", "-d", root, "-w", write, "-e", 2,
                "-lr", 1e-3, "--random_init", "--train_resolution", 64,
                "--n_blocks", 1, "--random_state", 7, "-b", 4)
    assert r.returncode == 0, r.stderr
    ckpts = list(write.glob("*.ckpt.npz"))
    assert ckpts, r.stdout + r.stderr
    assert (write / "metrics.jsonl").exists()

    # visualize on the test images
    viz_out = tmp_path / "viz"
    r = run_cli("visualize", ckpts[0],
                root / "dt_real_voc_test" / "JPEGImages", viz_out,
                "--labels_path", root / "labels.txt", "--resolution", 64)
    assert r.returncode == 0, r.stderr
    assert len(list(viz_out.glob("*.jpg"))) == 3
    img = np.array(Image.open(sorted(viz_out.glob("*.jpg"))[0]))
    assert img.shape == (480, 480, 3)

    # attention maps
    attn_out = tmp_path / "attn"
    some_img = sorted((root / "dt_real_voc_test" / "JPEGImages").glob("*.jpg"))[0]
    r = run_cli("visualize_attention", ckpts[0], some_img, attn_out,
                "--resolution", 64)
    assert r.returncode == 0, r.stderr
    heads = list(attn_out.glob("attn-head-dino*.png"))
    assert len(heads) == 6  # ViT-S has 6 heads
    assert (attn_out / "img.png").exists()


def test_run_job_csv(tmp_path, labels_file):
    from tests.test_train_smoke import _make_split
    root = tmp_path / "data"
    root.mkdir()
    _make_split(str(root), "train", 6, 0)
    _make_split(str(root), "val", 2, 1)
    _make_split(str(root), "test", 2, 2)
    (root / "labels.txt").write_text("__ignore__\n_background_\nred\ngreen\n")

    import pandas as pd
    sched = tmp_path / "sched.csv"
    pd.DataFrame([
        {"job": 0, "epochs": 1, "learning_rate": 1e-3, "n_blocks": 1,
         "batch_size": 4, "random_init": True, "train_resolution": 64,
         "finetune": False},
    ]).to_csv(sched, index=False)

    write = tmp_path / "results"
    write.mkdir()
    r = run_cli("run_job", "-j", 1, "-c", sched, "-d", root, "-w", write)
    assert r.returncode == 0, r.stderr
    # seed cycling: job 1 with 1 row -> seed 1 -> random_state 2468
    assert "2468" in r.stdout
    assert list(write.glob("*.ckpt.npz")), r.stdout + r.stderr
