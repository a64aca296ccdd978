"""Failure-detection behavior (SURVEY §5.3): warn-and-continue on
unreadable inputs, tolerant label parsing, eval guarded."""

import os

import numpy as np
import pytest

from oriented_object_detection_tpu.data import dataset as DS
from oriented_object_detection_tpu.data import labels as L

cv2 = pytest.importorskip("cv2")


class TestUnreadableInputs:
    def test_dataset_build_skips_corrupt_image(self, tmp_path, capsys):
        (tmp_path / "images").mkdir()
        (tmp_path / "labels").mkdir()
        # one valid image + one corrupt file
        img = np.full((120, 120, 3), 128, np.uint8)
        cv2.imwrite(str(tmp_path / "images" / "good.png"), img)
        (tmp_path / "images" / "bad.png").write_bytes(b"not a png")
        L.write_labels(str(tmp_path / "labels" / "good.txt"),
                       np.array([[0, .3, .3, .5, .3, .5, .5, .3, .5]]))
        stats = DS.build_train_tiles(
            str(tmp_path / "images"), str(tmp_path / "labels"),
            str(tmp_path / "ci"), str(tmp_path / "cl"),
            str(tmp_path / "list.txt"), 100, 20)
        out = capsys.readouterr().out
        assert "[WARN] cannot read: bad.png" in out
        assert stats["P_total"] >= 1  # good image still processed

    def test_process_image_unreadable(self, tmp_path, capsys):
        from oriented_object_detection_tpu.infer import pipeline as P

        r = P.process_image(None, str(tmp_path / "missing.png"),
                            str(tmp_path))
        assert r == {}
        assert "Could not read image" in capsys.readouterr().out


class TestTolerantLabels:
    def test_malformed_lines_skipped(self, tmp_path):
        p = tmp_path / "l.txt"
        p.write_text(
            "0 .1 .1 .2 .1 .2 .2 .1 .2\n"
            "garbage line\n"
            "1 .3 .3  # short\n"
            "# comment\n"
            "2 .5 .5 .6 .5 .6 .6 .5 .6 extra_col\n")
        lab = L.read_labels(str(p))
        assert len(lab) == 2
        assert list(lab[:, 0].astype(int)) == [0, 2]

    def test_zero_byte_and_missing(self, tmp_path):
        p = tmp_path / "empty.txt"
        p.write_text("")
        assert L.read_labels(str(p)).shape == (0, 9)
        assert L.read_labels(str(tmp_path / "nope.txt")).shape == (0, 9)


class TestEvalGuard:
    def test_eval_empty_input_dir(self, tmp_path, capsys):
        from oriented_object_detection_tpu.eval.metrics import (
            run_fusion_eval)

        out = run_fusion_eval({}, str(tmp_path), str(tmp_path))
        assert out == {}
        assert "No images found" in capsys.readouterr().out


class TestPackTree:
    """utils/runtime.pack_tree / unpack_tree: single-buffer param
    transfer with in-graph rebuild."""

    def test_roundtrip_exact(self):
        import jax
        import jax.numpy as jnp

        from oriented_object_detection_tpu.utils import runtime as R

        rng = np.random.RandomState(0)
        tree = {
            "a": {"w": rng.randn(4, 3).astype(np.float32),
                  "b": rng.randn(7).astype(np.float32)},
            "c": [rng.randn(2, 2, 2).astype(np.float32),
                  rng.randint(0, 5, (3,)).astype(np.int32)],
        }
        bufs, spec = R.pack_tree(tree)
        # two dtype groups -> two buffers
        assert set(bufs) == {np.dtype(np.float32).str,
                             np.dtype(np.int32).str}

        @jax.jit
        def consume(b):
            t = R.unpack_tree(b, spec)
            return t

        out = consume(bufs)
        for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(out)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_empty_and_scalar_leaves(self):
        import jax

        from oriented_object_detection_tpu.utils import runtime as R

        tree = {"s": np.float32(3.5), "v": np.zeros((0,), np.float32)}
        bufs, spec = R.pack_tree(tree)
        out = R.unpack_tree(bufs, spec)
        assert float(np.asarray(out["s"])) == 3.5
        assert np.asarray(out["v"]).shape == (0,)
