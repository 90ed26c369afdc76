import numpy as np
import pytest

from torch_em_tpu.ops import host as ops
from torch_em_tpu.transforms import (
    AffinityTransform, BoundaryTransform, BoundaryTransformWithIgnoreLabel, DistanceTransform,
    NoToBackgroundBoundaryTransform, OneHotTransform, PerObjectDistanceTransform, get_augmentations,
    normalize, normalize_percentile, standardize,
)


def _toy_seg():
    seg = np.zeros((16, 16), dtype="uint32")
    seg[2:8, 2:8] = 1
    seg[8:14, 8:14] = 2
    return seg


class TestRawTransforms:
    def test_standardize(self):
        x = np.random.rand(32, 32).astype("float32") * 100
        out = standardize(x)
        assert abs(out.mean()) < 1e-4
        assert abs(out.std() - 1) < 1e-3

    def test_normalize(self):
        x = np.random.rand(32, 32).astype("float32") * 7 - 3
        out = normalize(x)
        assert out.min() >= 0 and out.max() <= 1.0 + 1e-6

    def test_normalize_percentile(self):
        x = np.random.rand(64, 64).astype("float32")
        out = normalize_percentile(x)
        assert np.isfinite(out).all()


class TestLabelTransforms:
    def test_boundary_transform(self):
        seg = _toy_seg()
        out = BoundaryTransform()(seg)
        assert out.shape == (1, 16, 16)
        assert set(np.unique(out)).issubset({0, 1})
        # boundary must exist at object borders
        assert out[0, 1:3, 2:8].any()

    def test_boundary_with_binary(self):
        out = BoundaryTransform(add_binary_target=True)(_toy_seg())
        assert out.shape == (2, 16, 16)
        np.testing.assert_array_equal(out[0], (_toy_seg() != 0))

    def test_boundary_ignore_label(self):
        seg = _toy_seg().astype("int16")
        seg[0:2, :] = -1
        out = BoundaryTransformWithIgnoreLabel(ignore_label=-1)(seg)
        assert (out == -1).any()

    def test_no_to_background_boundary(self):
        out = NoToBackgroundBoundaryTransform()(_toy_seg().astype("int16"))
        assert (out == -1).any()  # object-background boundaries masked

    def test_affinity_shapes_and_values(self):
        offsets = [[-1, 0], [0, -1], [-3, 0], [0, -3]]
        out = AffinityTransform(offsets=offsets)(_toy_seg())
        assert out.shape == (4, 16, 16)
        # disaffinity convention: transitions are 1
        assert out.max() == 1.0 and out.min() == 0.0

    def test_affinity_with_mask_channel_layout(self):
        offsets = [[-1, 0], [0, -1]]
        out = AffinityTransform(offsets=offsets, add_binary_target=True, add_mask=True)(_toy_seg())
        # (binary + 2 affs) * 2 = 6
        assert out.shape == (6, 16, 16)

    def test_one_hot(self):
        seg = _toy_seg()
        out = OneHotTransform(class_ids=[0, 1, 2])(seg)
        assert out.shape == (3, 16, 16)
        np.testing.assert_allclose(out.sum(axis=0), 1.0)

    def test_distance_transform(self):
        seg = (_toy_seg() == 1).astype("uint32")
        out = DistanceTransform()(seg)
        assert out.shape == (16, 16)
        assert out.max() <= 1.0 + 1e-6  # normalized
        assert out[4, 4] == 0.0  # inside the object

    def test_distance_transform_empty(self):
        out = DistanceTransform()(np.zeros((8, 8), dtype="uint32"))
        assert np.isfinite(out).all()

    def test_per_object_distance(self):
        out = PerObjectDistanceTransform()(_toy_seg())
        # foreground + center-distance + boundary-distance
        assert out.shape == (3, 16, 16)
        assert out.min() >= 0.0 and out.max() <= 1.0 + 1e-6


class TestHostOps:
    def test_connected_components(self):
        seg = np.zeros((16, 16), dtype="uint8")
        seg[:4, :4] = 1
        seg[8:, 8:] = 1
        out = ops.connected_components(seg)
        assert len(np.unique(out)) == 3  # bg + 2 components

    def test_find_boundaries_modes(self):
        seg = _toy_seg()
        for mode in ("thick", "inner", "outer"):
            out = ops.find_boundaries(seg, mode=mode)
            assert out.dtype == bool
            assert out.any()

    def test_vector_distance_transform_matches_distance(self):
        mask = (_toy_seg() == 1).astype("uint32")
        vec = ops.vector_distance_transform(mask)
        dist = ops.distance_transform(mask)
        np.testing.assert_allclose(np.linalg.norm(vec, axis=0), dist, atol=1e-4)

    def test_size_filter(self):
        seg = _toy_seg()
        seg[0, 0] = 5  # 1-px object
        out = ops.size_filter(seg, min_size=4)
        assert 5 not in np.unique(out) or (out == 5).sum() == 0


class TestAugmentations:
    def test_flip_pipeline_consistency(self):
        pipe = get_augmentations(ndim=2)
        raw = np.random.rand(1, 32, 32).astype("float32")
        labels = (np.random.rand(1, 32, 32) > 0.5).astype("int32")
        for _ in range(5):
            r, l = pipe(raw, labels)
            assert r.shape == raw.shape and l.shape == labels.shape
            # labels stay binary under nearest-interp geometry
            assert set(np.unique(l)).issubset({0.0, 1.0})

    def test_elastic_preserves_label_values(self):
        pipe = get_augmentations(ndim=2, transforms=["RandomElasticDeformation"])
        labels = np.random.randint(0, 5, (1, 32, 32)).astype("int32")
        raw = np.random.rand(1, 32, 32).astype("float32")
        _, l = pipe(raw, labels)
        assert set(np.unique(l)).issubset(set(np.unique(labels).astype("float32")))

    def test_3d_pipeline(self):
        pipe = get_augmentations(ndim=3)
        raw = np.random.rand(1, 8, 16, 16).astype("float32")
        labels = np.random.randint(0, 3, (1, 8, 16, 16)).astype("int32")
        r, l = pipe(raw, labels)
        assert r.shape == raw.shape and l.shape == labels.shape


class TestElasticParity:
    """Statistical parity of the elastic deformation with the reference's
    kornia-based math (SURVEY.md hard part #4): control-point uniform noise,
    cubic upsample, gaussian smooth, displacement = noise * alpha * (size-1)/2
    added to the pixel grid (kornia elastic_transform2d semantics,
    reference transform/augmentation.py:44-61 + :91)."""

    def _aug(self, **kwargs):
        from torch_em_tpu.transforms.augmentation import RandomElasticDeformation

        return RandomElasticDeformation(p=1.0, **kwargs)

    def test_resampling_matches_scipy(self):
        """Warping with a given field must match scipy map_coordinates (the
        reference-semantics resampler) in the interior."""
        import jax
        import jax.numpy as jnp
        from scipy.ndimage import map_coordinates

        aug = self._aug(control_point_spacing=8, alpha=(2.0, 2.0))
        raw = np.random.rand(1, 64, 64).astype("float32")
        params = aug.sample_params(jax.random.PRNGKey(0), raw.shape[-2:])
        params["apply"] = jnp.asarray(True)

        ours = np.asarray(aug.apply(jnp.asarray(raw), params, order=1))[0]

        disp = np.asarray(aug._displacement(raw.shape[-2:], params["noise"]))
        gy, gx = np.meshgrid(np.arange(64.), np.arange(64.), indexing="ij")
        ref = map_coordinates(raw[0], [gy + disp[0], gx + disp[1]], order=1, mode="nearest")

        interior = (slice(4, -4), slice(4, -4))
        assert np.abs(ours[interior] - ref[interior]).max() < 1e-4

    def test_displacement_statistics(self):
        """Displacements are bounded by alpha*(size-1)/2, nonzero, and scale
        linearly with alpha for the same key."""
        import jax

        size = 64
        alphas, mags = [1.0, 2.0, 4.0], []
        for alpha in alphas:
            aug = self._aug(control_point_spacing=8, alpha=(alpha, alpha))
            per_seed = []
            for seed in range(10):
                params = aug._sample(jax.random.PRNGKey(seed), (size, size))
                disp = np.asarray(aug._displacement((size, size), params["noise"]))
                bound = alpha * (size - 1) / 2.0
                assert np.abs(disp).max() <= bound + 1e-3
                per_seed.append(np.abs(disp).mean())
            mags.append(np.mean(per_seed))
        assert mags[0] > 0
        # linear scaling in alpha (same noise distribution; statistical check)
        assert 1.5 < mags[1] / mags[0] < 2.5
        assert 3.0 < mags[2] / mags[0] < 5.0

    def test_field_smoothness(self):
        """The gaussian-smoothed field must vary slowly: neighboring-pixel
        displacement differences are small relative to the amplitude."""
        import jax

        aug = self._aug(control_point_spacing=8, sigma=(16.0, 16.0), alpha=(4.0, 4.0))
        params = aug._sample(jax.random.PRNGKey(3), (64, 64))
        disp = np.asarray(aug._displacement((64, 64), params["noise"]))
        amp = np.abs(disp).max() + 1e-8
        grad = max(np.abs(np.diff(disp, axis=1)).max(), np.abs(np.diff(disp, axis=2)).max())
        assert grad / amp < 0.2, f"field not smooth: {grad / amp}"

    def test_raw_label_share_field(self):
        """Raw (linear) and labels (nearest) must be warped by the same field:
        a label rendered from thresholded raw stays consistent after warping."""
        import jax
        import jax.numpy as jnp

        aug = self._aug(control_point_spacing=8, alpha=(3.0, 3.0))
        raw = np.zeros((1, 64, 64), "float32")
        raw[0, 16:48, 16:48] = 1.0
        labels = (raw > 0.5).astype("float32")
        params = aug.sample_params(jax.random.PRNGKey(1), (64, 64))
        params["apply"] = jnp.asarray(True)
        wr = np.asarray(aug.apply(jnp.asarray(raw), params, order=1))
        wl = np.asarray(aug.apply(jnp.asarray(labels), params, order=0))
        # where the warped raw is confidently inside/outside, the warped label agrees
        inside, outside = wr > 0.9, wr < 0.1
        assert (wl[inside] == 1).mean() > 0.98
        assert (wl[outside] == 0).mean() > 0.98


@pytest.mark.slow
class TestDeviceLabelTransforms:
    """Device-side batched label transforms match the host transforms
    element-wise (ops/device.py vs transforms/label.py)."""

    def test_affinity_matches_host(self):
        from torch_em_tpu.ops.device import DeviceAffinityTransform
        from torch_em_tpu.transforms.label import AffinityTransform

        rng = np.random.default_rng(0)
        labels = rng.integers(0, 6, (2, 16, 18)).astype("uint32")
        offsets = [[-1, 0], [0, -1], [-3, 0]]
        for add_binary, add_mask, ignore in [(False, False, None), (True, True, None),
                                             (True, True, 0)]:
            host = AffinityTransform(offsets=offsets, add_binary_target=add_binary,
                                     add_mask=add_mask, ignore_label=ignore)
            expected = np.stack([host(lab) for lab in labels])
            dev = DeviceAffinityTransform(offsets=offsets, add_binary_target=add_binary,
                                          add_mask=add_mask, ignore_label=ignore)
            got = np.asarray(dev(labels[:, None]))
            np.testing.assert_allclose(got, expected, atol=1e-6,
                                       err_msg=f"bin={add_binary} mask={add_mask} ign={ignore}")

    def test_boundary_matches_host(self):
        from torch_em_tpu.ops.device import DeviceBoundaryTransform
        from torch_em_tpu.transforms.label import BoundaryTransform

        rng = np.random.default_rng(1)
        labels = rng.integers(0, 5, (2, 20, 17)).astype("uint32")
        for add_binary in (False, True):
            host = BoundaryTransform(mode="thick", add_binary_target=add_binary, ndim=2)
            expected = np.stack([host(lab) for lab in labels]).astype("float32")
            dev = DeviceBoundaryTransform(add_binary_target=add_binary, ndim=2)
            got = np.asarray(dev(labels[:, None]))
            np.testing.assert_allclose(got, expected, atol=1e-6)

    def test_trainer_integration(self, tmp_path, monkeypatch):
        import h5py

        import torch_em_tpu as tem
        from torch_em_tpu.models import UNet2d
        from torch_em_tpu.ops.device import DeviceBoundaryTransform
        from torch_em_tpu.trainer import DefaultTrainer

        monkeypatch.chdir(tmp_path)
        p = str(tmp_path / "d.h5")
        with h5py.File(p, "w") as f:
            f.create_dataset("raw", data=np.random.rand(8, 32, 32).astype("float32"))
            f.create_dataset("labels", data=np.random.randint(0, 4, (8, 32, 32)))
        # loader ships RAW labels; the device derives fg+boundary targets
        loader = tem.default_segmentation_loader(
            p, "raw", p, "labels", batch_size=2, patch_shape=(1, 32, 32), ndim=2,
            label_dtype="int32")
        model = UNet2d(in_channels=1, out_channels=2, initial_features=4, depth=2,
                       final_activation="Sigmoid")
        trainer = tem.default_segmentation_trainer(
            "device-lt", model, loader, loader, logger=None, device="cpu",
            trainer_class=lambda **kw: DefaultTrainer(
                device_label_transform=DeviceBoundaryTransform(add_binary_target=True, ndim=2),
                **kw),
        )
        trainer.fit(iterations=2)
        assert trainer.iteration == 2

        # the device transform serializes through the checkpoint manifest
        from torch_em_tpu.trainer import DefaultTrainer as DT

        restored = DT.from_checkpoint("./checkpoints/device-lt", name="latest", device="cpu")
        assert restored.device_label_transform is not None
        assert restored.device_label_transform.init_kwargs["add_binary_target"] is True

    def test_trainer_factory_kwarg(self, tmp_path, monkeypatch):
        # regression: the factory must forward device_label_transform when given
        # directly, and must NOT forward a colliding None when a custom
        # trainer_class binds it itself (the lambda path above).
        import h5py

        import torch_em_tpu as tem
        from torch_em_tpu.models import UNet2d
        from torch_em_tpu.ops.device import DeviceBoundaryTransform

        monkeypatch.chdir(tmp_path)
        p = str(tmp_path / "d.h5")
        with h5py.File(p, "w") as f:
            f.create_dataset("raw", data=np.random.rand(8, 32, 32).astype("float32"))
            f.create_dataset("labels", data=np.random.randint(0, 4, (8, 32, 32)))
        loader = tem.default_segmentation_loader(
            p, "raw", p, "labels", batch_size=2, patch_shape=(1, 32, 32), ndim=2,
            label_dtype="int32")
        model = UNet2d(in_channels=1, out_channels=2, initial_features=4, depth=2,
                       final_activation="Sigmoid")
        trainer = tem.default_segmentation_trainer(
            "device-lt-factory", model, loader, loader, logger=None, device="cpu",
            device_label_transform=DeviceBoundaryTransform(add_binary_target=True, ndim=2),
        )
        assert trainer.device_label_transform is not None
        trainer.fit(iterations=1)
        assert trainer.iteration == 1
