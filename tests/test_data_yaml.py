"""YOLO data-yaml reader tests against the REAL reference config files.

The reference ships its actual ultralytics data configs at
`/root/reference/datasets/GeoMap/data{128,416,4ch}.yaml` plus the
`train.txt`/`val.txt` image lists (SURVEY C26). These are free oracles:
nc=12, the exact 12-name class table (must equal config.CLASS_NAMES),
`channels: 4` on the 4ch config, and list-file path resolution
(VERDICT r04 #6). Synthetic re-typed fixtures only cover the variants
the real files don't exercise (list-form names).
"""

import os

import pytest

from oriented_object_detection_tpu.config import CLASS_NAMES
from oriented_object_detection_tpu.data.config_yaml import load_data_yaml

REF_GEOMAP = "/root/reference/datasets/GeoMap"

# The reference uses TWO name tables over the same 12-id space: the
# data-yaml (training-side, `datasets/GeoMap/data*.yaml`) and the
# detect-side CLASS_NAMES (`Detect_OBB.py:44-57`, short names — what our
# config.CLASS_NAMES mirrors for drawing/export parity). Pin the yaml
# table verbatim so config_yaml drift against the real files fails here.
YAML_NAMES = {
    0: "Landslides T1", 1: "Strike", 2: "Spring T1", 3: "Mine_Pit T1",
    4: "Hillside debris", 5: "Feuchte gebiete", 6: "Torf", 7: "Bergsturz",
    8: "Landslide T2", 9: "Spring T2", 10: "Spring T3", 11: "Mine_Pit T2",
}

needs_reference = pytest.mark.skipif(
    not os.path.isdir(REF_GEOMAP), reason="reference dataset dir absent")


@needs_reference
@pytest.mark.parametrize("name,ts", [("data128.yaml", 128),
                                     ("data416.yaml", 416)])
def test_real_rgb_yaml(name, ts):
    cfg = load_data_yaml(os.path.join(REF_GEOMAP, name))
    assert cfg.nc == 12
    assert cfg.channels == 3  # no channels key -> engine default
    assert cfg.names == YAML_NAMES
    # correspondences that detect-side behavior depends on: same id
    # space, and "Strike" at id 1 (the strike-angle special case,
    # Detect_OBB.py:251) spelled identically in both tables
    assert set(cfg.names) == set(CLASS_NAMES) == set(range(12))
    assert cfg.names[1] == CLASS_NAMES[1] == "Strike"
    assert cfg.train.endswith(f"train_cropped{ts}.txt")
    assert cfg.val.endswith(f"val_cropped{ts}.txt")
    # `path: ../datasets/GeoMap  # dataset root dir` — inline comment
    # must not leak into the value
    assert cfg.path == "../datasets/GeoMap"
    assert cfg.train_list() == os.path.join(
        "../datasets/GeoMap", f"train_cropped{ts}.txt")


@needs_reference
def test_real_4ch_yaml():
    cfg = load_data_yaml(os.path.join(REF_GEOMAP, "data4ch.yaml"))
    assert cfg.nc == 12
    assert cfg.channels == 4
    assert cfg.names == YAML_NAMES
    assert cfg.train.endswith("train_cropped_4ch.txt")
    assert cfg.val.endswith("val_cropped_4ch.txt")


@needs_reference
def test_real_list_files():
    """train.txt/val.txt conventions: one image path per line, relative
    to the dataset-root parent (`datasets/GeoMap/images/<split>/...`),
    73 train + 9 val entries (SURVEY C27)."""
    with open(os.path.join(REF_GEOMAP, "train.txt")) as f:
        train = [ln.strip() for ln in f if ln.strip()]
    with open(os.path.join(REF_GEOMAP, "val.txt")) as f:
        val = [ln.strip() for ln in f if ln.strip()]
    assert len(train) == 73
    assert len(val) == 9
    for p in train:
        assert p.startswith("datasets/GeoMap/images/train/")
    for p in val:
        assert p.startswith("datasets/GeoMap/images/val/")
    # every listed image has a label file of the same stem in labels/
    for p, split in [(train[0], "train"), (val[0], "val")]:
        stem = os.path.splitext(os.path.basename(p))[0]
        assert os.path.exists(
            os.path.join(REF_GEOMAP, "labels", split, stem + ".txt"))


def test_list_names(tmp_path):
    y = tmp_path / "d.yaml"
    y.write_text("train: t.txt\nval: v.txt\nnames: [a, b]\n")
    cfg = load_data_yaml(str(y))
    assert cfg.names == {0: "a", 1: "b"}
    assert cfg.channels == 3
    assert cfg.train_list().endswith("t.txt")
