import h5py
import jax
import numpy as np
import pytest

import torch_em_tpu as te
from torch_em_tpu.models import UNet2d
from torch_em_tpu.parallel import DataParallelTrainer, get_mesh, halo_sharded_predict
from torch_em_tpu.transforms import BoundaryTransform


@pytest.fixture
def loader(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    path = str(tmp_path / "data.h5")
    with h5py.File(path, "w") as f:
        f.create_dataset("raw", data=np.random.rand(8, 64, 64).astype("float32"))
        f.create_dataset("labels", data=np.random.randint(0, 4, (8, 64, 64)).astype("uint32"))
    return te.default_segmentation_loader(
        path, "raw", path, "labels", batch_size=8, patch_shape=(1, 32, 32), ndim=2,
        label_transform=BoundaryTransform(add_binary_target=True), n_samples=16,
    )


class TestDataParallel:
    def test_dp_training(self, loader):
        mesh = get_mesh(n_devices=4)
        model = UNet2d(in_channels=1, out_channels=2, depth=2, initial_features=4,
                       final_activation="Sigmoid")
        trainer = te.default_segmentation_trainer(
            "dp-test", model, loader, loader, mixed_precision=False, device="cpu", logger=None,
            trainer_class=lambda **kw: DataParallelTrainer(mesh=mesh, **kw),
        )
        trainer.fit(iterations=4)
        assert trainer.iteration == 4

    def test_dp_matches_single_device(self, loader):
        # one DP step over 4 devices must equal the same step on one device
        mesh = get_mesh(n_devices=4)
        model = UNet2d(in_channels=1, out_channels=2, depth=2, initial_features=4,
                       final_activation="Sigmoid", seed=123)
        x, y = next(iter(loader))

        def run(trainer_class):
            from torch_em_tpu.loss import DiceLoss
            from torch_em_tpu.trainer import OptimizerSpec

            m = UNet2d(in_channels=1, out_channels=2, depth=2, initial_features=4,
                       final_activation="Sigmoid", seed=123)
            # sgd: the update is linear in the gradient, so cross-device float
            # noise stays tiny (adam would amplify near-zero grads to +-lr)
            tr = trainer_class(
                name="dp-eq", model=m, train_loader=loader, val_loader=loader,
                loss=DiceLoss(), metric=DiceLoss(), optimizer=OptimizerSpec("sgd", lr=1e-2),
                mixed_precision=False, device="cpu", logger=None,
            )
            tr._initialize(4, None)
            xb, yb = tr._to_device(x), tr._to_device(y)
            variables, _, loss, _ = tr._train_step(tr.variables, tr.opt_state, xb, yb, jax.random.PRNGKey(7))
            return float(loss), jax.device_get(variables)

        from torch_em_tpu.trainer import DefaultTrainer

        loss_dp, vars_dp = run(lambda **kw: DataParallelTrainer(mesh=mesh, **kw))
        loss_sd, vars_sd = run(lambda **kw: DefaultTrainer(**kw))
        assert loss_dp == pytest.approx(loss_sd, rel=1e-4)
        # cross-device reductions reorder float sums; tolerance covers that
        for a, b in zip(jax.tree_util.tree_leaves(vars_dp), jax.tree_util.tree_leaves(vars_sd)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


class TestHaloShardedInference:
    def test_matches_unsharded(self):
        mesh = get_mesh(n_devices=4, axis_names=("space",))
        model = UNet2d(in_channels=1, out_channels=2, depth=2, initial_features=4, norm=None,
                       final_activation="Sigmoid")
        volume = np.random.rand(1, 128, 64).astype("float32")
        # halo must cover the receptive field for an exact match
        sharded = halo_sharded_predict(model, volume, mesh, halo=32, axis_name="space")
        full = np.asarray(model(volume[None]))[0]
        assert sharded.shape == full.shape
        # interior matches exactly; only the volume border differs (zero halo)
        np.testing.assert_allclose(sharded[:, 36:-36, :], full[:, 36:-36, :], atol=1e-4)
