import os
import shutil

import h5py
import numpy as np
import pytest

import torch_em_tpu as te
from torch_em_tpu.models import UNet2d
from torch_em_tpu.trainer import DefaultTrainer
from torch_em_tpu.transforms import BoundaryTransform


@pytest.fixture
def training_setup(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    data_path = str(tmp_path / "data.h5")
    with h5py.File(data_path, "w") as f:
        f.create_dataset("raw", data=np.random.rand(8, 64, 64).astype("float32"))
        f.create_dataset("labels", data=np.random.randint(0, 4, (8, 64, 64)).astype("uint32"))

    model = UNet2d(in_channels=1, out_channels=2, depth=2, initial_features=4,
                   final_activation="Sigmoid")
    loader = te.default_segmentation_loader(
        data_path, "raw", data_path, "labels", batch_size=2, patch_shape=(1, 32, 32), ndim=2,
        label_transform=BoundaryTransform(add_binary_target=True), n_samples=8,
    )
    yield model, loader
    shutil.rmtree("./checkpoints", ignore_errors=True)
    shutil.rmtree("./logs", ignore_errors=True)


def _make_trainer(model, loader, name="test"):
    return te.default_segmentation_trainer(
        name, model, loader, loader, learning_rate=1e-3, mixed_precision=False, device="cpu",
        logger=None,
    )


class TestDefaultTrainer:
    def test_fit_creates_checkpoints(self, training_setup):
        model, loader = training_setup
        trainer = _make_trainer(model, loader)
        trainer.fit(iterations=8)
        assert trainer.iteration == 8
        assert trainer.epoch == 2
        assert os.path.exists("./checkpoints/test/latest.ckpt")
        assert os.path.exists("./checkpoints/test/best.ckpt")

    def test_fit_with_epochs(self, training_setup):
        model, loader = training_setup
        trainer = _make_trainer(model, loader)
        trainer.fit(epochs=2)
        assert trainer.epoch == 2

    def test_resume(self, training_setup):
        model, loader = training_setup
        trainer = _make_trainer(model, loader)
        trainer.fit(iterations=4)
        trainer2 = _make_trainer(model, loader)
        trainer2.fit(iterations=4, load_from_checkpoint="latest")
        assert trainer2.iteration == 8

    def test_from_checkpoint_roundtrip(self, training_setup):
        model, loader = training_setup
        trainer = _make_trainer(model, loader)
        trainer.fit(iterations=4)
        restored = DefaultTrainer.from_checkpoint("./checkpoints/test", "latest", device="cpu")
        assert restored.iteration == 4
        assert restored.train_loader.batch_size == loader.batch_size
        # parameters restored exactly
        import jax

        for a, b in zip(
            jax.tree_util.tree_leaves(trainer.model.variables),
            jax.tree_util.tree_leaves(restored.model.variables),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        # restored trainer can continue training
        restored.fit(iterations=2)
        assert restored.iteration == 6

    def test_overwrite_training_guard(self, training_setup, capsys):
        model, loader = training_setup
        trainer = _make_trainer(model, loader)
        trainer.fit(iterations=8)
        trainer2 = _make_trainer(model, loader)
        trainer2.fit(iterations=8, overwrite_training=False)
        assert trainer2.iteration == 0  # training skipped

    def test_save_every_kth_epoch(self, training_setup):
        model, loader = training_setup
        trainer = _make_trainer(model, loader)
        trainer.fit(epochs=2, save_every_kth_epoch=1)
        assert os.path.exists("./checkpoints/test/epoch-1.ckpt")
        assert os.path.exists("./checkpoints/test/epoch-2.ckpt")

    def test_early_stopping_attr(self, training_setup):
        model, loader = training_setup
        trainer = te.default_segmentation_trainer(
            "test-es", model, loader, loader, mixed_precision=False, device="cpu",
            early_stopping=0, logger=None,
        )
        trainer.fit(epochs=3)
        assert trainer.epoch <= 3


class TestProfiling:
    def test_mfu_counters(self, tmp_path):
        from torch_em_tpu.utils.profiling import StepTimer, estimate_step_flops, mfu, peak_flops
        import jax
        import jax.numpy as jnp

        f = jax.jit(lambda a, b: a @ b)
        a = jnp.ones((128, 128)), jnp.ones((128, 128))
        flops = estimate_step_flops(f, *a)
        assert flops is None or flops > 0
        # peak lookup returns None on CPU, a number on TPU
        assert peak_flops() is None or peak_flops() > 0
        timer = StepTimer(warmup=0)
        timer.start(); timer.stop()
        assert timer.mean >= 0
        assert mfu(0, 1.0) is None or isinstance(mfu(1e9, 0.1), float)
