import os

import h5py
import numpy as np
import pytest

# real training loops / multi-minute compiles: full tier only
pytestmark = pytest.mark.slow


@pytest.fixture
def s2d_data(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    path = str(tmp_path / "data.h5")
    raw = np.random.rand(4, 64, 64).astype("float32")
    labels = (raw > 0.5).astype("uint8")
    with h5py.File(path, "w") as f:
        f.create_dataset("raw", data=raw)
        f.create_dataset("labels", data=labels)
    return path


class TestShallow2Deep:
    def test_prepare_and_dataset(self, s2d_data, tmp_path):
        from torch_em_tpu.shallow2deep import (
            ForegroundTransform, Shallow2DeepDataset, get_shallow2deep_loader,
            prepare_shallow2deep,
        )

        rf_folder = str(tmp_path / "rfs")
        filter_config = [("gaussianSmoothing", 1.6), ("laplacianOfGaussian", 1.6)]
        prepare_shallow2deep(
            s2d_data, "raw", s2d_data, "labels",
            patch_shape_min=(1, 32, 32), patch_shape_max=(1, 48, 48),
            n_forests=2, n_threads=2, output_folder=rf_folder, ndim=2,
            label_transform=ForegroundTransform(ndim=2), filter_config=filter_config,
            n_estimators=10,
        )
        rf_paths = sorted(os.path.join(rf_folder, p) for p in os.listdir(rf_folder))
        assert len(rf_paths) == 2

        loader = get_shallow2deep_loader(
            s2d_data, "raw", s2d_data, "labels", rf_paths=rf_paths,
            batch_size=2, patch_shape=(1, 32, 32), ndim=2, n_samples=4,
            filter_config=filter_config, rf_channels=(1,),
        )
        x, y = next(iter(loader))
        assert x.shape == (2, 1, 32, 32)  # rf predictions as input
        assert 0 <= x.min() and x.max() <= 1  # probabilities

    def test_prepare_advanced(self, s2d_data, tmp_path):
        from torch_em_tpu.shallow2deep import ForegroundTransform, prepare_shallow2deep_advanced

        rf_folder = str(tmp_path / "rfs_adv")
        prepare_shallow2deep_advanced(
            s2d_data, "raw", s2d_data, "labels",
            patch_shape_min=(1, 32, 32), patch_shape_max=(1, 48, 48),
            n_forests=4, n_threads=1, output_folder=rf_folder, ndim=2,
            forests_per_stage=2, sample_fraction_per_stage=0.5,
            sampling_strategy="worst_points",
            label_transform=ForegroundTransform(ndim=2),
            filter_config=[("gaussianSmoothing", 1.6)], n_estimators=10,
        )
        assert len(os.listdir(rf_folder)) == 4

    def test_rf_with_filters(self, s2d_data, tmp_path):
        from torch_em_tpu.shallow2deep import ForegroundTransform, RFWithFilters, prepare_shallow2deep

        rf_folder = str(tmp_path / "rfs2")
        filter_config = [("gaussianSmoothing", 1.6)]
        prepare_shallow2deep(
            s2d_data, "raw", s2d_data, "labels",
            patch_shape_min=(1, 32, 32), patch_shape_max=(1, 32, 32),
            n_forests=1, n_threads=1, output_folder=rf_folder, ndim=2,
            label_transform=ForegroundTransform(ndim=2), filter_config=filter_config,
            n_estimators=10,
        )
        rf = RFWithFilters(os.path.join(rf_folder, "rf_0000.pkl"), ndim=2,
                           filter_config=filter_config, output_channel=1)
        pred = rf(np.random.rand(32, 32).astype("float32"))
        assert pred.shape == (32, 32)


class TestFilters:
    def test_filter_bank(self):
        from torch_em_tpu.shallow2deep import filters

        x = np.random.rand(32, 32).astype("float32")
        assert filters.gaussianSmoothing(x, 1.6).shape == (32, 32)
        assert filters.laplacianOfGaussian(x, 1.6).shape == (32, 32)
        assert filters.gaussianGradientMagnitude(x, 1.6).shape == (32, 32)
        assert filters.hessianOfGaussianEigenvalues(x, 1.6).shape == (32, 32, 2)
        assert filters.structureTensorEigenvalues(x, 1.6).shape == (32, 32, 2)


class TestClassification:
    def test_training(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        from torch_em_tpu.classification import (
            default_classification_loader, default_classification_trainer,
        )
        from torch_em_tpu.models import resnet3d_18

        # tiny 3d classification problem
        data = [np.random.rand(1, 32, 32, 32).astype("float32") for _ in range(8)]
        target = [np.random.randint(0, 2) for _ in range(8)]
        loader = default_classification_loader(data, target, batch_size=4, image_shape=(32, 32, 32))
        model = resnet3d_18(in_channels=1, out_channels=2)
        trainer = default_classification_trainer(
            "clf-test", model, loader, loader, mixed_precision=False, device="cpu", logger=None,
        )
        trainer.fit(iterations=2)
        assert trainer.iteration == 2
