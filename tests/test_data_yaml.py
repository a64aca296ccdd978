"""YOLO data-yaml reader tests against the reference's config format."""

import numpy as np

from oriented_object_detection_tpu.data.config_yaml import load_data_yaml


def test_reads_reference_style_yaml(tmp_path):
    y = tmp_path / "data416.yaml"
    y.write_text(
        "path: datasets/GeoMap\n"
        "train: train_cropped416.txt\n"
        "val: val_cropped416.txt\n"
        "channels: 4\n"
        "names:\n  0: Landslide 1\n  1: Strike\n  2: Spring 1\n")
    cfg = load_data_yaml(str(y))
    assert cfg.nc == 3
    assert cfg.names[1] == "Strike"
    assert cfg.channels == 4
    assert cfg.train_list().endswith("datasets/GeoMap/train_cropped416.txt")


def test_list_names(tmp_path):
    y = tmp_path / "d.yaml"
    y.write_text("train: t.txt\nval: v.txt\nnames: [a, b]\n")
    cfg = load_data_yaml(str(y))
    assert cfg.names == {0: "a", 1: "b"}
    assert cfg.channels == 3
