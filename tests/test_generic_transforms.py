"""Value-level tests for the generic shape/composition transforms and the
nnUNet raw transform (reference test/transform pattern; generic.py,
nnunet_raw.py)."""

import json

import numpy as np
import pytest

from torch_em_tpu.transforms.generic import (
    Compose, PadIfNecessary, Rescale, ResizeInputs, ResizeLongestSideInputs, Tile,
)
from torch_em_tpu.transforms.nnunet_raw import nnUNetRawTransform


class TestGenericTransforms:
    def test_tile(self):
        x = np.arange(6, dtype="float32").reshape(2, 3)
        t = Tile(reps=(2, 2))
        y = t(x)
        assert y.shape == (4, 6)
        assert np.array_equal(y[:2, :3], x)
        with pytest.raises(AssertionError):
            Tile(reps=(2,))(x)  # rank mismatch with match_shape_exactly
        y = Tile(reps=(2,), match_shape_exactly=False)(x)
        assert y.shape == (2, 6)

    def test_compose(self):
        pad = PadIfNecessary(shape=(8, 8), padding_mode="constant")
        tile = Tile(reps=(1, 1))
        comp = Compose(pad, tile, is_multi_tensor=False)
        y = comp(np.ones((5, 5), dtype="float32"))
        assert y.shape == (8, 8)

    def test_rescale(self):
        x = np.random.rand(16, 16).astype("float32")
        y = Rescale(scale=0.5)(x)
        assert y.shape == (8, 8)
        # labels use nearest-neighbor: no new values appear
        lab = np.random.randint(0, 4, (16, 16)).astype("uint8")
        ylab = Rescale(scale=0.5, is_label=True)(lab)
        assert set(np.unique(ylab)) <= set(np.unique(lab))
        # multi-tensor call and channel handling
        xc = np.random.rand(3, 16, 16).astype("float32")
        yr, yl = Rescale(scale=0.5, with_channels=(True, False))(xc, lab)
        assert yr.shape == (3, 8, 8) and yl.shape == (8, 8)

    def test_resize_inputs(self):
        x = np.random.rand(20, 30).astype("float32")
        y = ResizeInputs(target_shape=(16, 16))(x)
        assert y.shape == (16, 16)
        rgb = np.random.rand(3, 20, 30).astype("float32")
        y = ResizeInputs(target_shape=(16, 16), is_rgb=True)(rgb)
        assert y.shape == (3, 16, 16)

    def test_resize_longest_side(self):
        trafo = ResizeLongestSideInputs(target_shape=(32, 32))
        x = np.random.rand(16, 32).astype("float32")
        y = trafo(x)
        assert y.shape == (32, 32)
        # the short side is centered: padding rows above and below
        assert np.allclose(y[:8], 0) and np.allclose(y[-8:], 0)
        # inverse restores the original shape
        back = trafo.convert_transformed_inputs_to_original_shape(y)
        assert back.shape == x.shape
        with pytest.raises(ValueError):
            ResizeLongestSideInputs(target_shape=(32, 64))
        with pytest.raises(RuntimeError):
            ResizeLongestSideInputs(target_shape=(32, 32)
                                    ).convert_transformed_inputs_to_original_shape(x)

    def test_pad_if_necessary(self):
        pad = PadIfNecessary(shape=(8, 8), padding_mode="constant")
        y = pad(np.ones((5, 6), dtype="float32"))
        assert y.shape == (8, 8)
        assert y[:5, :6].sum() == 30 and y.sum() == 30
        # already large enough: unchanged
        x = np.ones((8, 8), dtype="float32")
        assert pad(x) is x
        # leading channel dims are preserved, trailing dims padded
        y = pad(np.ones((2, 5, 6), dtype="float32"))
        assert y.shape == (2, 8, 8)
        # multi-tensor call
        a, b = pad(np.ones((5, 5)), np.ones((6, 7)))
        assert a.shape == b.shape == (8, 8)


class TestNnUNetRawTransform:
    def _plans(self, tmp_path, scheme="CTNormalization"):
        plans = {
            "foreground_intensity_properties_per_channel": {
                "0": {"mean": 100.0, "std": 50.0,
                      "percentile_00_5": -20.0, "percentile_99_5": 300.0},
            },
            "configurations": {"3d_fullres": {"normalization_schemes": [scheme]}},
        }
        p = tmp_path / "nnUNetPlans.json"
        p.write_text(json.dumps(plans))
        return str(p)

    def test_ct_normalization(self, tmp_path):
        trafo = nnUNetRawTransform(self._plans(tmp_path))
        raw = np.array([[[-500.0, 0.0, 100.0, 1000.0]]], dtype="float32")
        out = trafo(raw)
        assert out.shape == raw.shape
        # clipped to [-20, 300], then (x - 100) / 50
        expected = (np.clip(raw[0], -20, 300) - 100.0) / 50.0
        assert np.allclose(out[0], expected)

    def test_unknown_scheme_raises(self, tmp_path):
        trafo = nnUNetRawTransform(self._plans(tmp_path, scheme="MadeUpNormalization"))
        with pytest.raises(ValueError):
            trafo(np.zeros((1, 4, 4), dtype="float32"))

    def test_channel_mismatch_raises(self, tmp_path):
        trafo = nnUNetRawTransform(self._plans(tmp_path))
        with pytest.raises(AssertionError):
            trafo(np.zeros((2, 4, 4), dtype="float32"))
