"""Weighted combination of losses (reference torch_em/loss/combined_loss.py:6)."""

from typing import List, Optional

__all__ = ["CombinedLoss"]


class CombinedLoss:
    """Weighted sum of multiple losses."""

    def __init__(self, *losses, loss_weights: Optional[List[float]] = None):
        self.losses = list(losses)
        n_losses = len(self.losses)
        if loss_weights is None:
            self.loss_weights = [1.0 / n_losses] * n_losses if n_losses else None
        else:
            assert len(loss_weights) == n_losses
            self.loss_weights = loss_weights
        self.init_kwargs = {"losses": self.losses, "loss_weights": loss_weights}
        self.needs_rng = any(getattr(loss, "needs_rng", False) for loss in self.losses)

    def __call__(self, x, y, rng=None, **kwargs):
        assert self.loss_weights is not None
        total = 0.0
        for loss, weight in zip(self.losses, self.loss_weights):
            if getattr(loss, "needs_rng", False):
                total = total + weight * loss(x, y, rng=rng)
            else:
                total = total + weight * loss(x, y)
        return total
