import jax.numpy as jnp
import numpy as np
import pytest

from torch_em_tpu.loss import (
    ApplyAndRemoveMask, ApplyMask, BCEDiceLoss, DiceLoss, DiceLossWithLogits, LossWrapper,
    MaskIgnoreLabel, dice_score,
)


class TestDice:
    def test_perfect_prediction_gives_zero_loss(self):
        pred = jnp.asarray(np.random.rand(2, 1, 32, 32) > 0.5, dtype=jnp.float32)
        loss = DiceLoss()(pred, pred)
        assert float(loss) == pytest.approx(0.0, abs=1e-5)

    def test_disjoint_prediction_gives_max_loss(self):
        a = np.zeros((1, 1, 16, 16), dtype="float32")
        b = np.zeros((1, 1, 16, 16), dtype="float32")
        a[..., :8] = 1
        b[..., 8:] = 1
        loss = DiceLoss()(jnp.asarray(a), jnp.asarray(b))
        assert float(loss) == pytest.approx(1.0, abs=1e-5)

    def test_dice_score_value(self):
        # half overlap: dice = 2*|x∩y| / (|x|+|y|)
        a = np.zeros((1, 1, 4, 4), dtype="float32")
        b = np.zeros((1, 1, 4, 4), dtype="float32")
        a[0, 0, 0, :] = 1  # 4 px
        b[0, 0, 0, :2] = 1  # 2 px, both in a
        score = dice_score(jnp.asarray(a), jnp.asarray(b), invert=False)
        assert float(score) == pytest.approx(2 * 2 / (4 + 2), abs=1e-5)

    def test_channelwise_reductions(self):
        pred = jnp.asarray(np.random.rand(2, 3, 8, 8), dtype=jnp.float32)
        target = jnp.asarray(np.random.rand(2, 3, 8, 8) > 0.5, dtype=jnp.float32)
        per_channel = dice_score(pred, target, invert=True, reduce_channel=None)
        assert per_channel.shape == (3,)
        assert float(dice_score(pred, target, invert=True, reduce_channel="sum")) == pytest.approx(
            float(jnp.sum(per_channel)), abs=1e-5
        )
        assert float(dice_score(pred, target, invert=True, reduce_channel="mean")) == pytest.approx(
            float(jnp.mean(per_channel)), abs=1e-5
        )

    def test_gradients_finite(self):
        import jax

        pred = jnp.asarray(np.random.rand(1, 2, 16, 16), dtype=jnp.float32)
        target = jnp.asarray(np.random.rand(1, 2, 16, 16) > 0.5, dtype=jnp.float32)
        grad = jax.grad(lambda p: DiceLoss()(p, target))(pred)
        assert np.all(np.isfinite(np.asarray(grad)))

    def test_with_logits(self):
        logits = jnp.asarray(np.random.randn(1, 1, 16, 16), dtype=jnp.float32)
        target = jnp.asarray(np.random.rand(1, 1, 16, 16) > 0.5, dtype=jnp.float32)
        l1 = DiceLossWithLogits()(logits, target)
        import jax

        l2 = DiceLoss()(jax.nn.sigmoid(logits), target)
        assert float(l1) == pytest.approx(float(l2), abs=1e-6)

    def test_bce_dice(self):
        pred = jnp.asarray(np.random.rand(1, 1, 16, 16), dtype=jnp.float32)
        target = jnp.asarray(np.random.rand(1, 1, 16, 16) > 0.5, dtype=jnp.float32)
        assert np.isfinite(float(BCEDiceLoss()(pred, target)))

    @pytest.mark.parametrize("channelwise,reduce_channel", [
        (True, "sum"), (True, "mean"), (False, "sum"),
    ])
    def test_shard_parts_reconstruct_global_dice(self, channelwise, reduce_channel):
        # the shard-decomposition protocol (parallel/halo.py spatial training):
        # summing per-shard sufficient statistics and forming the loss must
        # equal the direct global Dice exactly
        import jax as _jax

        loss = DiceLoss(channelwise=channelwise, reduce_channel=reduce_channel)
        rng = np.random.default_rng(5)
        pred = jnp.asarray(rng.random((1, 2, 64, 32), dtype=np.float32))
        target = jnp.asarray((rng.random((1, 2, 64, 32)) > 0.5).astype("float32"))
        direct = float(loss(pred, target))

        shards = [(pred[:, :, i * 16:(i + 1) * 16], target[:, :, i * 16:(i + 1) * 16])
                  for i in range(4)]
        parts = [loss.shard_parts(p, t) for p, t in shards]
        summed = _jax.tree_util.tree_map(lambda *xs: sum(xs), *parts)
        assert float(loss.loss_from_parts(summed)) == pytest.approx(direct, abs=1e-6)

    def test_shard_parts_with_logits(self):
        from torch_em_tpu.loss import DiceLossWithLogits

        loss = DiceLossWithLogits()
        rng = np.random.default_rng(6)
        logits = jnp.asarray(rng.normal(size=(1, 1, 32, 32)).astype("float32"))
        target = jnp.asarray((rng.random((1, 1, 32, 32)) > 0.5).astype("float32"))
        parts = loss.shard_parts(logits, target)
        assert float(loss.loss_from_parts(parts)) == pytest.approx(
            float(loss(logits, target)), abs=1e-6)


class TestLossWrapper:
    def test_apply_and_remove_mask(self):
        pred = jnp.asarray(np.random.rand(2, 2, 16, 16), dtype=jnp.float32)
        target_core = np.random.rand(2, 2, 16, 16).astype("float32")
        mask = (np.random.rand(2, 2, 16, 16) > 0.3).astype("float32")
        target = jnp.asarray(np.concatenate([target_core, mask], axis=1))
        loss = LossWrapper(DiceLoss(), ApplyAndRemoveMask(masking_method="multiply"))
        val = loss(pred, target)
        # equal to dice on masked pred/target
        ref = DiceLoss()(pred * mask, jnp.asarray(target_core * mask))
        assert float(val) == pytest.approx(float(ref), abs=1e-6)

    def test_mask_ignore_label(self):
        pred = jnp.asarray(np.random.rand(1, 1, 8, 8), dtype=jnp.float32)
        target = np.random.choice([0.0, 1.0, -1.0], size=(1, 1, 8, 8)).astype("float32")
        loss = LossWrapper(DiceLoss(), MaskIgnoreLabel(ignore_label=-1, masking_method="multiply"))
        val = loss(pred, jnp.asarray(target))
        mask = (target != -1)
        ref = DiceLoss()(pred * mask, jnp.asarray(target * mask))
        assert float(val) == pytest.approx(float(ref), abs=1e-6)
