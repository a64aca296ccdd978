"""Weight converter round-trip tests: flax -> ultralytics-style state dict
-> flax, with full-tree coverage and numeric equality."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from oriented_object_detection_tpu.models import YOLO11OBB
from oriented_object_detection_tpu.models import weights as W


@pytest.fixture(scope="module")
def model_and_vars():
    m = YOLO11OBB(nc=12, scale="n", in_channels=3)
    v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    return m, v


class TestRoundTrip:
    def test_export_import_identity(self, model_and_vars):
        m, v = model_and_vars
        sd = W.export_state_dict(v)
        assert len(sd) > 100
        # keys look like ultralytics names
        assert any(k.startswith("model.0.conv.weight") for k in sd)
        assert any(".bn.running_mean" in k for k in sd)
        assert any(k.startswith("model.23.cv2.0.2.weight") for k in sd)
        assert any(k.startswith("model.23.cv3.0.0.0.conv.weight")
                   for k in sd)

        back = W.convert_state_dict(sd)
        rep = W.validate_against(back, v)
        assert not rep["missing"], rep["missing"][:8]
        assert not rep["extra"], rep["extra"][:8]
        assert not rep["mismatched"], rep["mismatched"][:8]

        # numeric equality end-to-end through the network
        x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3),
                        jnp.float32)
        out1 = m.apply(v, x)
        out2 = m.apply(
            {"params": back["params"],
             "batch_stats": back["batch_stats"]}, x)
        for a, b in zip(out1["cls"], out2["cls"]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-6)

    def test_4ch_stem_reversal(self):
        m = YOLO11OBB(nc=12, scale="n", in_channels=4)
        v = m.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 4)))
        sd = W.export_state_dict(v, reverse_stem_channels=True)
        back = W.convert_state_dict(sd, reverse_stem_channels=True)
        k0 = np.asarray(v["params"]["l0"]["conv"]["kernel"])
        k1 = back["params"]["l0"]["conv"]["kernel"]
        np.testing.assert_allclose(k0, k1, atol=1e-7)
        # and without the flag the channels come back reversed
        back2 = W.convert_state_dict(sd)
        np.testing.assert_allclose(
            k0[:, :, ::-1, :], back2["params"]["l0"]["conv"]["kernel"],
            atol=1e-7)

    def test_all_scales_convert(self):
        for scale in ("n", "s"):
            m = YOLO11OBB(nc=12, scale=scale)
            v = m.init(jax.random.PRNGKey(2), jnp.zeros((1, 64, 64, 3)))
            sd = W.export_state_dict(v)
            rep = W.validate_against(W.convert_state_dict(sd), v)
            assert not rep["missing"] and not rep["mismatched"], scale
