import os
import shutil

import h5py
import numpy as np
import pytest

# real training loops / multi-minute compiles: full tier only
pytestmark = pytest.mark.slow

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


class TestStepsPerExecution:
    """Multi-step lax.scan execution (trainer steps_per_execution kwarg)."""

    def _trainer(self, model, loader, name, k):
        return te.default_segmentation_trainer(
            name, model, loader, loader, learning_rate=1e-3, mixed_precision=False,
            device="cpu", logger=None, steps_per_execution=k,
        )

    def test_scan_execution_counts_and_tail(self, training_setup):
        # 8 iterations with k=3: two full scan chunks + a 2-step tail fallback
        model, loader = training_setup
        trainer = self._trainer(model, loader, "test-spe", 3)
        trainer.fit(iterations=8)
        assert trainer.iteration == 8
        assert os.path.exists("./checkpoints/test-spe/latest.ckpt")

    def test_scan_matches_per_step_dispatch(self, training_setup):
        # one k=4 scan chunk over fixed batches must reproduce four k=1
        # dispatches: same math, different dispatch granularity (tolerances
        # cover fusion-order float noise between the two executables)
        import copy
        import jax
        import jax.numpy as jnp

        from torch_em_tpu.loss import DiceLoss
        from torch_em_tpu.trainer.optimizers import OptimizerSpec

        model, loader = training_setup
        # SGD: parity must hold at the parameter level too; adaptive optimizers
        # (adamw eps-normalization) amplify executable-level float noise in the
        # first steps, which would force meaninglessly loose tolerances
        trainer = DefaultTrainer(
            "test-spe-eq", loader, loader, model, loss=DiceLoss(), metric=DiceLoss(),
            optimizer=OptimizerSpec("sgd", lr=1e-2), device="cpu",
            mixed_precision=False, logger=None, steps_per_execution=4,
        )
        trainer._initialize(iterations=8, load_from_checkpoint=None)

        rng = np.random.default_rng(0)
        xs = jnp.asarray(rng.random((4, 2, 1, 32, 32), dtype=np.float32))
        ys = jnp.asarray((rng.random((4, 2, 2, 32, 32)) > 0.5).astype(np.float32))
        rngs = jnp.stack([jax.random.PRNGKey(i) for i in range(4)])

        v0 = copy.deepcopy(jax.device_get(trainer.variables))
        o0 = copy.deepcopy(jax.device_get(trainer.opt_state))

        v_scan, o_scan, losses_scan, _ = trainer._scan_step(
            trainer.variables, trainer.opt_state, xs, ys, rngs)

        v, o = jax.device_put(v0), jax.device_put(o0)
        losses_seq = []
        for j in range(4):
            v, o, loss, _ = trainer._train_step(v, o, xs[j], ys[j], rngs[j])
            losses_seq.append(float(loss))

        np.testing.assert_allclose(
            np.asarray(losses_scan), np.asarray(losses_seq), rtol=1e-5, atol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(jax.device_get(v_scan)),
                        jax.tree_util.tree_leaves(jax.device_get(v))):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


class _OpaqueKwarg:
    """No init_kwargs, not importable as a factory — only pickle can carry it."""

    def __init__(self):
        self.threshold = 0.75


class TestSerializationPickleFallback:
    def test_round_trip(self):
        from torch_em_tpu.trainer.serialization import (
            deserialize_value, serialize_value, serialize_value_or_pickle,
        )

        value = _OpaqueKwarg()
        with pytest.raises(ValueError):
            serialize_value(value)
        spec = serialize_value_or_pickle(value)
        assert "__pickle__" in spec
        back = deserialize_value(spec)
        assert isinstance(back, _OpaqueKwarg) and back.threshold == 0.75

    def test_locals_still_rejected(self):
        from torch_em_tpu.trainer.serialization import serialize_value_or_pickle

        def local_fn(x):
            return x

        class Holder:
            pass

        h = Holder()
        h.fn = local_fn  # closures/locals defeat pickle too -> caller drops it
        with pytest.raises(ValueError):
            serialize_value_or_pickle(h)


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
