import jax
import numpy as np
import pytest

# real training loops / multi-minute compiles: full tier only
pytestmark = pytest.mark.slow

from torch_em_tpu.models import UNet2d, UNet3d
from torch_em_tpu.utils.prediction import Blocking, predict_with_halo, predict_with_padding


@pytest.fixture(scope="module")
def model2d():
    return UNet2d(in_channels=1, out_channels=2, depth=2, initial_features=4, final_activation="Sigmoid")


class TestBlocking:
    def test_grid(self):
        b = Blocking([0, 0], [50, 70], [32, 32])
        assert b.n_blocks == 2 * 3
        begin, end = b.get_block(0)
        assert begin == (0, 0) and end == (32, 32)
        begin, end = b.get_block(b.n_blocks - 1)
        assert end == (50, 70)


class TestPredictWithPadding:
    def test_non_divisible_shape(self, model2d):
        x = np.random.rand(50, 70).astype("float32")
        out = predict_with_padding(model2d, x, min_divisible=(4, 4))
        assert out.shape == (1, 2, 50, 70)

    def test_with_channels(self, model2d):
        model = UNet2d(in_channels=3, out_channels=1, depth=2, initial_features=4)
        x = np.random.rand(3, 50, 70).astype("float32")
        out = predict_with_padding(model, x, min_divisible=(4, 4), with_channels=True)
        assert out.shape == (1, 1, 50, 70)


class TestPredictWithHalo:
    def test_2d(self, model2d):
        x = np.random.rand(50, 70).astype("float32")
        out = predict_with_halo(x, model2d, gpu_ids=["cpu"], block_shape=(32, 32), halo=(8, 8),
                                disable_tqdm=True)
        assert out.shape == (2, 50, 70)

    def test_matches_full_prediction(self, model2d):
        # with InstanceNorm the blocks see different stats, so compare a
        # norm-free model where halo prediction must equal the full forward
        model = UNet2d(in_channels=1, out_channels=1, depth=1, initial_features=4, norm=None,
                       final_activation="Sigmoid")
        x = np.random.rand(64, 64).astype("float32")
        full = np.asarray(model(x[None, None]))[0]
        halo = predict_with_halo(x, model, gpu_ids=["cpu"], block_shape=(32, 32), halo=(16, 16),
                                 preprocess=None, disable_tqdm=True)
        # the volume border differs (reflect-padded halo vs the conv's zero
        # padding in the full forward — same as the reference); the interior
        # must match exactly
        interior = np.s_[:, 20:44, 20:44]
        np.testing.assert_allclose(halo[interior], full[interior], atol=1e-4)

    def test_multi_device(self, model2d):
        x = np.random.rand(50, 70).astype("float32")
        out = predict_with_halo(x, model2d, block_shape=(32, 32), halo=(8, 8),
                                devices=jax.devices(), disable_tqdm=True)
        assert out.shape == (2, 50, 70)

    def test_mask(self, model2d):
        x = np.random.rand(64, 64).astype("float32")
        mask = np.zeros(x.shape, dtype=bool)
        mask[:32] = True
        out = predict_with_halo(x, model2d, gpu_ids=["cpu"], block_shape=(32, 32), halo=(8, 8),
                                mask=mask, disable_tqdm=True)
        assert np.allclose(out[:, 32:], 0)
        assert not np.allclose(out[:, :32], 0)

    def test_multiple_outputs(self, model2d):
        x = np.random.rand(64, 64).astype("float32")
        out1 = np.zeros((64, 64), dtype="float32")
        out2 = np.zeros((64, 64), dtype="float32")
        predict_with_halo(
            x, model2d, gpu_ids=["cpu"], block_shape=(32, 32), halo=(8, 8),
            output=[(out1, np.s_[0]), (out2, np.s_[1])], disable_tqdm=True,
        )
        assert not np.allclose(out1, 0)
        assert not np.allclose(out2, 0)

    def test_3d_and_grid_shift(self):
        model = UNet3d(in_channels=1, out_channels=1, depth=1, initial_features=2)
        v = np.random.rand(16, 32, 32).astype("float32")
        out = predict_with_halo(v, model, gpu_ids=["cpu"], block_shape=(8, 16, 16), halo=(2, 4, 4),
                                disable_tqdm=True)
        assert out.shape == (1, 16, 32, 32)
        out_s = predict_with_halo(v, model, gpu_ids=["cpu"], block_shape=(8, 16, 16), halo=(2, 4, 4),
                                  grid_shift=(0, 0.25, 0), disable_tqdm=True)
        assert out_s.shape == (1, 16, 32, 32)

    def test_batched_matches_unbatched(self, model2d):
        x = np.random.rand(96, 96).astype("float32")
        out1 = predict_with_halo(x, model2d, gpu_ids=["cpu"], block_shape=(32, 32),
                                 halo=(8, 8), disable_tqdm=True)
        out4 = predict_with_halo(x, model2d, gpu_ids=["cpu"], block_shape=(32, 32),
                                 halo=(8, 8), disable_tqdm=True, batch_size=4)
        assert np.allclose(out1, out4)

    def test_device_resident_path(self, model2d):
        """Device-resident volumes take the on-device block-scan path; it must
        match the host path exactly on interior voxels (the border reflect-pad
        convention differs, see _predict_with_halo_on_device)."""
        import jax.numpy as jnp

        # block-divisible volume: both pad conventions coincide -> exact match
        x = np.random.rand(96, 96).astype("float32")
        host = predict_with_halo(x, model2d, gpu_ids=["cpu"], block_shape=(32, 32),
                                 halo=(8, 8), disable_tqdm=True)
        dev = predict_with_halo(jnp.asarray(x), model2d, gpu_ids=["cpu"],
                                block_shape=(32, 32), halo=(8, 8), disable_tqdm=True,
                                batch_size=2)
        dev = np.asarray(dev)
        assert dev.shape == host.shape
        assert np.allclose(host, dev, atol=1e-5)

        # ragged volume: interior (a receptive field away from the border) matches
        x = np.random.rand(96, 80).astype("float32")
        host = predict_with_halo(x, model2d, gpu_ids=["cpu"], block_shape=(32, 32),
                                 halo=(8, 8), disable_tqdm=True)
        dev = np.asarray(predict_with_halo(jnp.asarray(x), model2d, gpu_ids=["cpu"],
                                           block_shape=(32, 32), halo=(8, 8),
                                           disable_tqdm=True, batch_size=2))
        assert dev.shape == host.shape
        assert np.allclose(host[:, 24:-24, 24:-24], dev[:, 24:-24, 24:-24], atol=1e-5)

    def test_device_resident_multi_chunk_scan(self, model2d):
        """A non-power-of-two scan-step count decomposes into pow2 chunks
        (e.g. 28 blocks / batch 4 = 7 steps -> dispatches of 4+2+1); the
        chunked dispatch must equal the host path on interior voxels."""
        import jax.numpy as jnp

        x = np.random.rand(7 * 16, 4 * 16).astype("float32")  # 28 blocks of 16x16
        host = predict_with_halo(x, model2d, gpu_ids=["cpu"], block_shape=(16, 16),
                                 halo=(8, 8), disable_tqdm=True)
        dev = np.asarray(predict_with_halo(jnp.asarray(x), model2d, gpu_ids=["cpu"],
                                           block_shape=(16, 16), halo=(8, 8),
                                           disable_tqdm=True, batch_size=4))
        assert dev.shape == host.shape
        assert np.allclose(host, dev, atol=1e-5)
