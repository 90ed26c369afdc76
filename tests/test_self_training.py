import os

import h5py
import numpy as np
import pytest

# real training loops / multi-minute compiles: full tier only
pytestmark = pytest.mark.slow

import torch_em_tpu.data as ted
from torch_em_tpu.loss import ContrastiveLoss, DiceLoss, SPOCOLoss
from torch_em_tpu.models import UNet2d
from torch_em_tpu.models.probabilistic_unet import ProbabilisticUNet
from torch_em_tpu.self_training import (
    DefaultPseudoLabeler, DefaultSelfTrainingLoss, DefaultSelfTrainingLossAndMetric,
    DefaultUnimatchLoss, DefaultUnimatchLossAndMetric, FixMatchTrainer, MeanTeacherTrainer,
    ProbabilisticUNetLoss, ProbabilisticUNetLossAndMetric, ProbabilisticUNetTrainer,
    UniMatchv2Augmenters, UniMatchv2Trainer,
)
from torch_em_tpu.trainer import OptimizerSpec
from torch_em_tpu.trainer.spoco_trainer import SPOCOTrainer
from torch_em_tpu.transforms import get_raw_transform


@pytest.fixture
def data_path(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    path = str(tmp_path / "data.h5")
    with h5py.File(path, "w") as f:
        f.create_dataset("raw", data=np.random.rand(8, 64, 64).astype("float32"))
        f.create_dataset("labels", data=np.random.randint(0, 4, (8, 64, 64)).astype("uint32"))
    return path


def _unsup_loader(path, two_views=True):
    aug = (lambda x: x, lambda x: np.clip(x + 0.05, 0, 1)) if two_views else None
    ds = ted.RawDataset(path, "raw", patch_shape=(1, 32, 32), ndim=2,
                        raw_transform=get_raw_transform(), augmentations=aug, n_samples=4)
    return ted.DataLoader(ds, batch_size=2)


def _sup_loader(path):
    import torch_em_tpu as te
    from torch_em_tpu.transforms import BoundaryTransform

    return te.default_segmentation_loader(
        path, "raw", path, "labels", batch_size=2, patch_shape=(1, 32, 32), ndim=2,
        label_transform=BoundaryTransform(add_binary_target=True), n_samples=4,
    )


def _model():
    return UNet2d(in_channels=1, out_channels=2, depth=2, initial_features=4,
                  final_activation="Sigmoid")


class TestMeanTeacher:
    def test_unsupervised_training(self, data_path):
        trainer = MeanTeacherTrainer(
            name="mt-test",
            model=_model(),
            unsupervised_train_loader=_unsup_loader(data_path),
            unsupervised_val_loader=_unsup_loader(data_path),
            unsupervised_loss=DefaultSelfTrainingLoss(),
            unsupervised_loss_and_metric=DefaultSelfTrainingLossAndMetric(),
            pseudo_labeler=DefaultPseudoLabeler(confidence_threshold=0.8),
            optimizer=OptimizerSpec("adamw", lr=1e-3),
            device="cpu", mixed_precision=False, logger=None,
        )
        trainer.fit(iterations=4)
        assert trainer.iteration == 4
        assert os.path.exists("./checkpoints/mt-test/latest.ckpt")

    def test_semisupervised_training(self, data_path):
        trainer = MeanTeacherTrainer(
            name="mt-semi-test",
            model=_model(),
            unsupervised_train_loader=_unsup_loader(data_path),
            supervised_train_loader=_sup_loader(data_path),
            supervised_val_loader=_sup_loader(data_path),
            unsupervised_loss=DefaultSelfTrainingLoss(),
            supervised_loss=DefaultSelfTrainingLoss(),
            supervised_loss_and_metric=DefaultSelfTrainingLossAndMetric(),
            pseudo_labeler=DefaultPseudoLabeler(confidence_threshold=0.8),
            optimizer=OptimizerSpec("adamw", lr=1e-3),
            device="cpu", mixed_precision=False, logger=None,
        )
        trainer.fit(iterations=4)
        assert trainer.iteration == 4


class TestFixMatch:
    def test_training(self, data_path):
        trainer = FixMatchTrainer(
            name="fm-test",
            model=_model(),
            unsupervised_train_loader=_unsup_loader(data_path),
            unsupervised_val_loader=_unsup_loader(data_path),
            unsupervised_loss=DefaultSelfTrainingLoss(),
            unsupervised_loss_and_metric=DefaultSelfTrainingLossAndMetric(),
            pseudo_labeler=DefaultPseudoLabeler(confidence_threshold=0.8),
            source_distribution=[0.5, 0.5],
            optimizer=OptimizerSpec("adamw", lr=1e-3),
            device="cpu", mixed_precision=False, logger=None,
        )
        trainer.fit(iterations=4)
        assert trainer.iteration == 4


class TestUniMatchV2:
    def test_training(self, data_path):
        trainer = UniMatchv2Trainer(
            name="um-test",
            model=_model(),
            augmenter=UniMatchv2Augmenters(ndim=2),
            unsupervised_train_loader=_unsup_loader(data_path, two_views=False),
            unsupervised_val_loader=_unsup_loader(data_path, two_views=False),
            unsupervised_loss=DefaultUnimatchLoss(),
            unsupervised_loss_and_metric=DefaultUnimatchLossAndMetric(),
            pseudo_labeler=DefaultPseudoLabeler(confidence_threshold=0.8),
            optimizer=OptimizerSpec("adamw", lr=1e-3),
            device="cpu", mixed_precision=False, logger=None,
        )
        trainer.fit(iterations=4)
        assert trainer.iteration == 4


class TestSPOCO:
    def test_training(self, data_path):
        import torch_em_tpu as te
        from torch_em_tpu.transforms.label import connected_components

        loader = te.default_segmentation_loader(
            data_path, "raw", data_path, "labels", batch_size=2, patch_shape=(1, 32, 32), ndim=2,
            label_transform=connected_components, label_dtype="int32", n_samples=4,
        )
        model = UNet2d(in_channels=1, out_channels=8, depth=2, initial_features=4)
        trainer = SPOCOTrainer(
            name="spoco-test",
            model=model,
            train_loader=loader,
            val_loader=loader,
            loss=SPOCOLoss(delta_var=0.75, delta_dist=2.0, max_anchors=3, max_instances=32),
            metric=ContrastiveLoss(delta_var=0.75, delta_dist=2.0, max_instances=32),
            optimizer=OptimizerSpec("adamw", lr=1e-3),
            device="cpu", mixed_precision=False, logger=None,
        )
        trainer.fit(iterations=4)
        assert trainer.iteration == 4
        assert os.path.exists("./checkpoints/spoco-test/latest.ckpt")


class TestProbabilisticUNet:
    def test_model_sample_and_elbo(self):
        import jax

        model = ProbabilisticUNet(input_channels=1, num_classes=1, num_filters=[4, 8], latent_dim=3)
        x = np.random.rand(1, 1, 32, 32).astype("float32")
        sample = model.sample(x)
        assert sample.shape == (1, 1, 32, 32)
        y = (np.random.rand(1, 1, 32, 32) > 0.5).astype("float32")
        elbo = model.elbo_fn(model.variables, x, y, jax.random.PRNGKey(0))
        assert np.isfinite(float(elbo))

    def test_training(self, data_path):
        import torch_em_tpu as te
        from torch_em_tpu.transforms.label import labels_to_binary

        loader = te.default_segmentation_loader(
            data_path, "raw", data_path, "labels", batch_size=2, patch_shape=(1, 32, 32), ndim=2,
            label_transform=labels_to_binary, n_samples=4,
        )
        model = ProbabilisticUNet(input_channels=1, num_classes=1, num_filters=[4, 8], latent_dim=3)
        trainer = ProbabilisticUNetTrainer(
            name="punet-test",
            model=model,
            train_loader=loader,
            val_loader=loader,
            loss=ProbabilisticUNetLoss(),
            loss_and_metric=ProbabilisticUNetLossAndMetric(prior_samples=2),
            optimizer=OptimizerSpec("adamw", lr=1e-3),
            clipping_value=1.0,
            device="cpu", mixed_precision=False, logger=None,
        )
        trainer.fit(iterations=4)
        assert trainer.iteration == 4
