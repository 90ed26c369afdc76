"""Tests for the EM defect augmentation (reference torch_em/transform/defect.py:40).

All defects are stochastic slice-level corruptions; the tests pin the
*semantics* of each defect (what region changes and how), not bitwise values.
"""

import h5py
import numpy as np
import pytest

from torch_em_tpu.transforms.defect import EMDefectAugmentation, get_artifact_source


def _smooth_slice(shape=(128, 128), seed=0):
    rng = np.random.default_rng(seed)
    base = rng.random((shape[0] // 8, shape[1] // 8)).astype("float32")
    return np.kron(base, np.ones((8, 8), dtype="float32")) + 0.5


class TestDefectAugmentation:
    def make_aug(self, **kwargs):
        defaults = dict(p_drop_slice=0.0, p_low_contrast=0.0, p_deform_slice=0.0)
        defaults.update(kwargs)
        return EMDefectAugmentation(**defaults)

    def test_drop_slice(self):
        aug = self.make_aug(p_drop_slice=0.999)
        raw = np.stack([_smooth_slice()] * 4)
        out = aug(raw.copy())
        assert out.shape == raw.shape
        assert np.allclose(out, 0.0)

    def test_low_contrast_preserves_mean(self):
        aug = self.make_aug(p_low_contrast=0.999, contrast_scale=0.1)
        raw = np.stack([_smooth_slice()] * 2)
        out = aug(raw.copy())
        for z in range(raw.shape[0]):
            assert np.isclose(out[z].mean(), raw[z].mean(), atol=1e-4)
            assert out[z].std() < 0.2 * raw[z].std()

    def test_compress_slice_blacks_out_a_stripe(self):
        np.random.seed(11)
        aug = self.make_aug(p_deform_slice=0.999, deformation_mode="compress",
                            deformation_strength=10.0)
        raw = np.stack([_smooth_slice(seed=z) + 1.0 for z in range(3)])
        out = aug(raw.copy())
        assert out.shape == raw.shape
        for z in range(raw.shape[0]):
            # the cut stripe is zeroed: a radius-10 band across the full slice
            n_zero = int(np.sum(out[z] == 0.0))
            assert n_zero >= 10 * min(raw.shape[1:])
            # away from the stripe the content is warped, not destroyed
            assert np.isfinite(out[z]).all()
            assert out[z].max() > 1.0

    def test_compress_slice_moves_content_towards_cut(self):
        # a slice of ones: compression pulls the zero padding in from the two
        # borders parallel to the cut, so the far-border bands lose mass
        np.random.seed(5)
        aug = self.make_aug(p_deform_slice=0.999, deformation_mode="compress",
                            deformation_strength=12.0)
        raw = np.ones((1, 128, 128), dtype="float32")
        out = aug(raw.copy())
        border = np.concatenate([out[0, :3].ravel(), out[0, -3:].ravel(),
                                 out[0, :, :3].ravel(), out[0, :, -3:].ravel()])
        assert (border < 0.5).mean() > 0.25  # padding pulled in on two borders

    def test_undirected_deformation_is_smooth_warp(self):
        np.random.seed(3)
        aug = self.make_aug(p_deform_slice=0.999, deformation_mode="undirected",
                            deformation_strength=10.0)
        raw = np.stack([_smooth_slice(seed=7)])
        out = aug(raw.copy())
        assert out.shape == raw.shape
        assert not np.allclose(out, raw)  # it moved
        # a warp resamples existing values: range stays within the input range
        # (up to cubic ringing / zero padding at the borders)
        assert out.max() <= raw.max() + 0.25
        # interior mass is preserved approximately (smooth flow, no stripe)
        inner = (slice(None), slice(20, -20), slice(20, -20))
        assert np.isclose(out[inner].mean(), raw[inner].mean(), rtol=0.1)

    def test_mode_all_mixes_modes(self):
        np.random.seed(0)
        aug = self.make_aug(p_deform_slice=0.999, deformation_mode="all")
        raw = np.stack([_smooth_slice(seed=z) + 1.0 for z in range(8)])
        out = aug(raw.copy())
        # a compress stripe zeroes a >=20-wide band (>2000 px); the undirected
        # warp only zeroes a thin constant-padding rim (a few hundred px)
        stripes = [(out[z] == 0).sum() > 2000 for z in range(8)]
        assert any(stripes) and not all(stripes)  # both modes occurred

    def test_paste_artifact(self, tmp_path):
        path = str(tmp_path / "artifacts.h5")
        rng = np.random.default_rng(1)
        with h5py.File(path, "w") as f:
            f.create_dataset("artifacts", data=rng.random((4, 96, 96)).astype("float32"))
            f.create_dataset("alpha_mask", data=(rng.random((4, 96, 96)) > 0.3).astype("float32"))
        source = get_artifact_source(path, patch_shape=(1, 64, 64), min_mask_fraction=0.3)
        aug = self.make_aug(p_paste_artifact=0.999, artifact_source=source)
        raw = np.zeros((2, 64, 64), dtype="float32")
        out = aug(raw.copy())
        assert out.shape == raw.shape
        assert (out != 0).any()  # artifact blended in

    def test_cumulative_probabilities_validated(self):
        with pytest.raises(AssertionError):
            EMDefectAugmentation(p_drop_slice=0.5, p_low_contrast=0.4, p_deform_slice=0.2)

    def test_init_kwargs_round_trip(self):
        aug = self.make_aug(p_drop_slice=0.1, deformation_strength=7.5)
        rebuilt = EMDefectAugmentation(**aug.init_kwargs)
        assert rebuilt.deformation_strength == 7.5
