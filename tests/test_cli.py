"""CLI integration: dataset build + 1-epoch training + detection on a
synthetic corpus with a tiny model."""

import os

import numpy as np
import pytest

from oriented_object_detection_tpu import cli
from oriented_object_detection_tpu.data import labels as L

cv2 = pytest.importorskip("cv2")


@pytest.fixture
def data_root(tmp_path):
    rng = np.random.RandomState(0)
    for split in ("train", "val"):
        (tmp_path / "images" / split).mkdir(parents=True)
        (tmp_path / "labels" / split).mkdir(parents=True)
        for k in range(2):
            h, w = 160, 200
            img = rng.randint(0, 255, (h, w, 3)).astype(np.uint8)
            cv2.imwrite(str(tmp_path / "images" / split /
                            f"m{k}.png"), img)
            rows = []
            for cls, cx, cy in [(0, 40, 40), (1, 120, 90)]:
                bw, bh = 22, 16
                c8 = np.array([cx - bw / 2, cy - bh / 2, cx + bw / 2,
                               cy - bh / 2, cx + bw / 2, cy + bh / 2,
                               cx - bw / 2, cy + bh / 2], np.float64)
                c8[0::2] /= w
                c8[1::2] /= h
                rows.append([cls] + list(c8))
            L.write_labels(str(tmp_path / "labels" / split /
                               f"m{k}.txt"), np.asarray(rows))
    return tmp_path


def test_train_then_detect(data_root, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    ckpt_dir = str(tmp_path / "run")
    cli.main([
        "train", "--data-root", str(data_root), "--tile-size", "64",
        "--overlap", "16", "--epochs", "1", "--batch-size", "4",
        "--scale", "n", "--ckpt-dir", ckpt_dir,
    ])
    assert os.path.exists(os.path.join(ckpt_dir, "last.ckpt"))
    assert os.path.exists(os.path.join(ckpt_dir, "best.ckpt"))

    out_dir = str(tmp_path / "out")
    cli.main([
        "detect", "--input", str(data_root / "images" / "val"),
        "--output", out_dir, "--ckpt416",
        os.path.join(ckpt_dir, "best.ckpt"), "--scale", "n",
    ])
    outs = os.listdir(out_dir)
    assert any(f.endswith("_detected.jpg") for f in outs)
    assert any(f.endswith(".xlsx") for f in outs)


def test_detect_batch_mode(data_root, tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    out_dir = str(tmp_path / "outb")
    cli.main([
        "detect", "--input", str(data_root / "images" / "val"),
        "--output", out_dir, "--ckpt416", "missing.ckpt",
        "--scale", "n", "--batch", "--allow-random",
    ])
    outs = os.listdir(out_dir)
    assert sum(f.endswith("_detected.jpg") for f in outs) == 2
    assert sum(f.endswith(".xlsx") for f in outs) == 2


def test_detect_chunked_stream_mode(data_root, tmp_path, monkeypatch):
    """--chunk N drives the pipelined chunked stream over MIXED-SIZE
    inputs: images are grouped by shape (one compiled program per
    shape), short tails are padded with a repeat, and every real input
    still gets its jpg + xlsx (padded results discarded)."""
    rng = np.random.RandomState(9)
    in_dir = tmp_path / "mixed"
    in_dir.mkdir()
    for name, (h, w) in [("a0.png", (160, 200)), ("a1.png", (160, 200)),
                         ("a2.png", (160, 200)), ("b0.png", (120, 150))]:
        cv2.imwrite(str(in_dir / name),
                    rng.randint(0, 255, (h, w, 3)).astype(np.uint8))
    monkeypatch.chdir(tmp_path)
    out_dir = str(tmp_path / "outc")
    cli.main([
        "detect", "--input", str(in_dir),
        "--output", out_dir, "--ckpt416", "missing.ckpt",
        "--scale", "n", "--chunk", "2", "--allow-random",
    ])
    outs = os.listdir(out_dir)
    assert sum(f.endswith("_detected.jpg") for f in outs) == 4
    assert sum(f.endswith(".xlsx") for f in outs) == 4


def test_detect_missing_named_checkpoint_errors(data_root, tmp_path,
                                                monkeypatch):
    """A named-but-nonexistent checkpoint must error instead of silently
    degrading to random weights (ADVICE r02); --allow-random opts out
    (previous test)."""
    monkeypatch.chdir(tmp_path)
    with pytest.raises(SystemExit):
        cli.main([
            "detect", "--input", str(data_root / "images" / "val"),
            "--output", str(tmp_path / "oute"),
            "--ckpt416", "typo.ckpt", "--scale", "n",
        ])


class TestConvert:
    def test_npz_roundtrip(self, tmp_path):
        """export_state_dict -> npz -> convert CLI -> ckpt: converted
        variables must reproduce the source model's forward exactly."""
        import jax
        import jax.numpy as jnp

        from oriented_object_detection_tpu.cli import main
        from oriented_object_detection_tpu.models import YOLO11OBB
        from oriented_object_detection_tpu.models.weights import (
            export_state_dict)
        from oriented_object_detection_tpu.train.trainer import (
            variables_from_checkpoint)

        m = YOLO11OBB(nc=12, scale="n", in_channels=3)
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        sd = export_state_dict(v)
        npz = str(tmp_path / "sd.npz")
        np.savez(npz, **{k: np.asarray(x) for k, x in sd.items()})
        out = str(tmp_path / "conv.ckpt")
        main(["convert", npz, "--out", out, "--scale", "n",
              "--imgsz", "64"])
        v2 = variables_from_checkpoint(out)
        o1 = m.apply(v, jnp.ones((1, 64, 64, 3)))
        o2 = m.apply(v2, jnp.ones((1, 64, 64, 3)))
        for a, b in zip(jax.tree.leaves(o1), jax.tree.leaves(o2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5)


def test_val_reports_checkpoint_fitness(data_root, tmp_path, monkeypatch,
                                        capsys):
    """`oodt val`: engine model.val() analogue over the val tile list."""
    monkeypatch.chdir(tmp_path)
    ckpt_dir = str(tmp_path / "run")
    cli.main([
        "train", "--data-root", str(data_root), "--tile-size", "64",
        "--overlap", "16", "--epochs", "1", "--batch-size", "4",
        "--scale", "n", "--ckpt-dir", ckpt_dir,
    ])
    cli.main([
        "val", "--ckpt", os.path.join(ckpt_dir, "best.ckpt"),
        "--data-root", str(data_root), "--batch-size", "4",
    ])
    out = capsys.readouterr().out
    assert "mAP@0.5=" in out and "fitness=" in out

    # missing list errors with a hint instead of a stack trace
    with pytest.raises(SystemExit, match="val list"):
        cli.main([
            "val", "--ckpt", os.path.join(ckpt_dir, "best.ckpt"),
            "--data-root", str(tmp_path / "nowhere"),
        ])


def test_detect_arch_metadata_checks(data_root, tmp_path, monkeypatch,
                                     capsys):
    """detect validates checkpoint arch metadata: channel mismatch is a
    clear hard error; the ckpt's recorded model_scale wins over --scale
    (instead of a cryptic flax shape error deep in apply)."""
    monkeypatch.chdir(tmp_path)
    ckpt_dir = str(tmp_path / "run")
    cli.main([
        "train", "--data-root", str(data_root), "--tile-size", "64",
        "--overlap", "16", "--epochs", "1", "--batch-size", "4",
        "--scale", "n", "--ckpt-dir", ckpt_dir,
    ])
    ck = os.path.join(ckpt_dir, "best.ckpt")
    with pytest.raises(SystemExit, match="channels"):
        cli.main([
            "detect", "--input", str(data_root / "images" / "val"),
            "--output", str(tmp_path / "o4"), "--ckpt416", ck,
            "--scale", "n", "--channels", "4",
        ])
    # --scale s would build a differently-shaped graph; the recorded
    # n-scale must be adopted (run succeeds and says so)
    cli.main([
        "detect", "--input", str(data_root / "images" / "val"),
        "--output", str(tmp_path / "o5"), "--ckpt416", ck,
        "--scale", "s",
    ])
    out = capsys.readouterr().out
    assert "recorded model_scale=n" in out
    assert any(f.endswith(".xlsx")
               for f in os.listdir(tmp_path / "o5"))
