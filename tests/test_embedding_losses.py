import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_em_tpu.loss import (
    AffinitySideLoss, CombinedLoss, ContrastiveLoss, DiceBasedDistanceLoss, DistanceLoss,
    ExtendedContrastiveLoss, SoftclDiceLoss, SPOCOConsistencyLoss, SPOCOLoss,
)


def _embedding_target(n=2, e=8, s=32, n_inst=4, seed=0):
    rng = np.random.default_rng(seed)
    target = rng.integers(0, n_inst, (n, 1, s, s)).astype("int32")
    emb = rng.normal(size=(n, e, s, s)).astype("float32")
    return jnp.asarray(emb), jnp.asarray(target)


class TestContrastive:
    def test_finite_and_jittable(self):
        emb, target = _embedding_target()
        loss = ContrastiveLoss(delta_var=0.75, delta_dist=2.0)
        val = jax.jit(loss)(emb, target)
        assert np.isfinite(float(val))

    def test_separated_embeddings_have_low_loss(self):
        # embeddings exactly at distinct means per instance -> variance term 0
        s, e = 16, 4
        target = np.zeros((1, 1, s, s), dtype="int32")
        target[0, 0, :, 8:] = 1
        emb = np.zeros((1, e, s, s), dtype="float32")
        emb[0, 0][target[0, 0] == 1] = 10.0  # far apart means
        loss = ContrastiveLoss(delta_var=0.5, delta_dist=2.0, gamma=0.0)
        val = float(loss(jnp.asarray(emb), jnp.asarray(target)))
        assert val == pytest.approx(0.0, abs=1e-4)

    def test_collapsed_embeddings_have_high_loss(self):
        s, e = 16, 4
        target = np.zeros((1, 1, s, s), dtype="int32")
        target[0, 0, :, 8:] = 1
        emb = np.zeros((1, e, s, s), dtype="float32")  # all identical
        loss = ContrastiveLoss(delta_var=0.5, delta_dist=2.0, gamma=0.0)
        val = float(loss(jnp.asarray(emb), jnp.asarray(target)))
        assert val > 1.0  # distance term fully hinged

    def test_gradients(self):
        emb, target = _embedding_target(n=1, s=16)
        loss = ContrastiveLoss(delta_var=0.75, delta_dist=2.0)
        grads = jax.grad(lambda x: loss(x, target))(emb)
        assert np.isfinite(np.asarray(grads)).all()


class TestAffinitySideLoss:
    def test_jittable_with_rng(self):
        rng = np.random.default_rng(1)
        emb = jnp.asarray(rng.normal(size=(1, 8, 32, 32)).astype("float32"))
        target = jnp.asarray(rng.integers(0, 4, (1, 1, 32, 32)).astype("float32"))
        loss = AffinitySideLoss(offset_ranges=[(-8, 8), (-8, 8)], n_samples=4, delta=2.0)
        fn = jax.jit(lambda e, t, k: loss(e, t, rng=k))
        v1 = fn(emb, target, jax.random.PRNGKey(0))
        v2 = fn(emb, target, jax.random.PRNGKey(1))
        assert np.isfinite(float(v1)) and np.isfinite(float(v2))
        # different offsets -> (almost surely) different values, same compiled fn
        assert float(v1) != float(v2)


class TestSPOCO:
    def test_extended_contrastive(self):
        emb, target = _embedding_target(n=1, s=16)
        loss = ExtendedContrastiveLoss(delta_var=0.75, delta_dist=2.0)
        val = jax.jit(lambda e, t, k: loss(e, t, rng=k))(emb, target, jax.random.PRNGKey(0))
        assert np.isfinite(float(val))

    def test_spoco_loss(self):
        emb, target = _embedding_target(n=1, s=16)
        emb2 = emb + 0.01
        loss = SPOCOLoss(delta_var=0.75, delta_dist=2.0, max_anchors=5)
        val = jax.jit(lambda a, b, t, k: loss((a, b), t, rng=k))(
            emb, emb2, target, jax.random.PRNGKey(0)
        )
        assert np.isfinite(float(val))

    def test_spoco_consistency(self):
        emb, _ = _embedding_target(n=1, s=16)
        loss = SPOCOConsistencyLoss(delta_var=0.75, pmaps_threshold=0.9, max_anchors=5)
        val = float(loss(emb, emb, rng=jax.random.PRNGKey(0)))
        assert val == pytest.approx(0.0, abs=1e-4)  # identical embeddings -> no loss


class TestDistanceLoss:
    def test_distance_loss(self):
        rng = np.random.default_rng(0)
        pred = jnp.asarray(rng.random((2, 3, 16, 16)).astype("float32"))
        target = jnp.asarray(rng.random((2, 3, 16, 16)).astype("float32"))
        assert np.isfinite(float(DistanceLoss()(pred, target)))
        assert np.isfinite(float(DiceBasedDistanceLoss(True)(pred, target)))
        assert float(DistanceLoss()(target, target)) == pytest.approx(0.0, abs=1e-4)


class TestCombinedAndClDice:
    def test_combined(self):
        from torch_em_tpu.loss import DiceLoss

        pred = jnp.asarray(np.random.rand(1, 1, 16, 16).astype("float32"))
        target = jnp.asarray((np.random.rand(1, 1, 16, 16) > 0.5).astype("float32"))
        combined = CombinedLoss(DiceLoss(), DiceLoss(), loss_weights=[0.3, 0.7])
        v = float(combined(pred, target))
        assert v == pytest.approx(float(DiceLoss()(pred, target)), abs=1e-5)

    def test_cldice(self):
        mask = np.zeros((1, 1, 32, 32), dtype="float32")
        mask[0, 0, 10:20, 5:28] = 1
        mask = jnp.asarray(mask)
        assert float(SoftclDiceLoss()(mask, mask)) == pytest.approx(0.0, abs=1e-5)


class TestNanRobustness:
    def test_single_pixel_instance_gradients_finite(self):
        """jnp.linalg.norm has a NaN gradient at exactly-zero vectors; a
        single-pixel instance makes (emb - mean) exactly zero at that pixel.
        The eps-guarded norms must keep gradients finite."""
        import jax
        import jax.numpy as jnp

        from torch_em_tpu.loss import ContrastiveLoss, SPOCOLoss

        target = np.zeros((1, 1, 16, 16), dtype="int64")
        target[0, 0, 3, 3] = 1            # single-pixel instance
        target[0, 0, 8:12, 8:12] = 2
        pred = jnp.asarray(np.random.RandomState(0).rand(1, 4, 16, 16).astype("float32"))

        loss = ContrastiveLoss(delta_var=0.75, delta_dist=2.0, max_instances=8)
        val, grad = jax.value_and_grad(lambda p: loss(p, jnp.asarray(target)))(pred)
        assert np.isfinite(float(val))
        assert np.isfinite(np.asarray(grad)).all()

        sloss = SPOCOLoss(delta_var=0.75, delta_dist=2.0, max_instances=8, max_anchors=3)
        val, grad = jax.value_and_grad(
            lambda p: sloss((p, p), jnp.asarray(target)))(pred)
        assert np.isfinite(float(val))
        assert np.isfinite(np.asarray(grad)).all()
