"""Probabilistic U-Net (Kohl et al., arXiv:1806.05034).

Rebuild of torch_em/model/probabilistic_unet.py: prior/posterior
``AxisAlignedConvGaussian`` encoders (:106), ``Fcomb`` latent/feature
combination (:199), ``ProbabilisticUNet`` (:286) with ``sample`` (:401),
``kl_divergence`` (:429) and the beta-weighted ``elbo`` (:446) with optional
consensus masking and dice reconstruction loss (``rl_swap``).

TPU-first: the torch version holds latent distributions as mutable state
between ``forward``/``sample``/``elbo`` calls; here everything is a pure
function — ``encode`` produces the distribution parameters, sampling takes an
explicit PRNG — wrapped by :class:`ProbabilisticUNetModel` which offers the
reference-style convenience API.
"""

import math
from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .base import Model
from .unet import UNetModule

__all__ = ["ProbabilisticUNet", "ProbabilisticUNetModel", "ProbabilisticUNetModule"]


class _GaussianEncoder(nn.Module):
    """AxisAlignedConvGaussian: conv encoder -> global pool -> (mu, log_sigma)
    (reference probabilistic_unet.py:106)."""

    num_filters: Tuple[int, ...]
    no_convs_per_block: int
    latent_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = x  # channels-last
        for level, f in enumerate(self.num_filters):
            if level > 0:
                h = nn.avg_pool(h, window_shape=(2, 2), strides=(2, 2))
            for c in range(self.no_convs_per_block):
                h = nn.Conv(f, (3, 3), padding="SAME", dtype=self.dtype,
                            name=f"conv{level}_{c}")(h)
                h = nn.relu(h)
        # global spatial mean, then 1x1 conv to 2 * latent_dim
        h = jnp.mean(h, axis=(1, 2), keepdims=True)
        mu_log_sigma = nn.Conv(2 * self.latent_dim, (1, 1), dtype=self.dtype, name="mu_log_sigma")(h)
        mu_log_sigma = mu_log_sigma[:, 0, 0, :]
        mu = mu_log_sigma[:, : self.latent_dim]
        log_sigma = mu_log_sigma[:, self.latent_dim:]
        return mu, log_sigma


class _Fcomb(nn.Module):
    """Combine U-Net features with a (tiled) latent sample (reference :199)."""

    num_filters0: int
    latent_dim: int
    num_classes: int
    no_convs_fcomb: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feature_map, z):
        # feature_map: (N, H, W, F); z: (N, L) -> tile spatially
        n, h, w, _ = feature_map.shape
        z_tiled = jnp.broadcast_to(z[:, None, None, :], (n, h, w, z.shape[-1]))
        out = jnp.concatenate([feature_map, z_tiled], axis=-1)
        for i in range(self.no_convs_fcomb - 1):
            out = nn.Conv(self.num_filters0, (1, 1), dtype=self.dtype, name=f"fcomb{i}")(out)
            out = nn.relu(out)
        return nn.Conv(self.num_classes, (1, 1), dtype=self.dtype, name="last_layer")(out)


class ProbabilisticUNetModule(nn.Module):
    """Pure PUNet computation. Public arrays are channel-first."""

    input_channels: int
    num_classes: int = 1
    num_filters: Tuple[int, ...] = (32, 64, 128, 192)
    latent_dim: int = 6
    no_convs_fcomb: int = 4
    no_convs_per_block: int = 3
    beta: float = 10.0
    rl_swap: bool = False
    consensus_masking: bool = False
    dtype: Any = jnp.float32

    def setup(self):
        self.unet = UNetModule(
            dim=2,
            features_encoder=tuple(self.num_filters),
            scale_factors=(2,) * len(self.num_filters),
            in_channels=self.input_channels,
            out_channels=None,
            norm="InstanceNorm",
            check_shape=True,
            dtype=self.dtype,
        )
        self.prior = _GaussianEncoder(tuple(self.num_filters), self.no_convs_per_block,
                                      self.latent_dim, dtype=self.dtype, name="prior")
        self.posterior = _GaussianEncoder(tuple(self.num_filters), self.no_convs_per_block,
                                          self.latent_dim, dtype=self.dtype, name="posterior")
        self.fcomb = _Fcomb(self.num_filters[0], self.latent_dim, self.num_classes,
                            self.no_convs_fcomb, dtype=self.dtype, name="fcomb")

    def _to_last(self, x):
        return jnp.transpose(x, (0,) + tuple(range(2, x.ndim)) + (1,))

    def _to_first(self, x):
        return jnp.transpose(x, (0, x.ndim - 1) + tuple(range(1, x.ndim - 1)))

    def encode(self, x, y=None, train: bool = False):
        """Distribution params + unet features; y (N, C, H, W) enables the posterior."""
        features = self.unet(x, train=train)  # channel-first (out_channels=None -> feature maps)
        prior_mu, prior_log_sigma = self.prior(self._to_last(x), train=train)
        out = {
            "features": features,
            "prior": (prior_mu, prior_log_sigma),
        }
        if y is not None:
            xy = jnp.concatenate([x, y.astype(x.dtype)], axis=1)
            post_mu, post_log_sigma = self.posterior(self._to_last(xy), train=train)
            out["posterior"] = (post_mu, post_log_sigma)
        return out

    def reconstruct(self, features, z):
        """fcomb on channel-first features + latent sample -> logits (channel-first)."""
        logits = self.fcomb(self._to_last(features), z)
        return self._to_first(logits)

    def __call__(self, x, train: bool = False, y=None):
        """Init/convenience path: prior-mean reconstruction (deterministic)."""
        y_init = jnp.zeros(x.shape[:1] + (self.num_classes,) + x.shape[2:], dtype=x.dtype)
        enc = self.encode(x, y_init if y is None else y, train=train)
        mu, _ = enc["prior"]
        return self.reconstruct(enc["features"], mu)


def _kl_diag_gaussians(mu_q, log_sigma_q, mu_p, log_sigma_p):
    """Analytic KL(q || p) for diagonal Gaussians, per batch element."""
    var_q = jnp.exp(2 * log_sigma_q)
    var_p = jnp.exp(2 * log_sigma_p)
    kl = log_sigma_p - log_sigma_q + (var_q + (mu_q - mu_p) ** 2) / (2 * var_p) - 0.5
    return jnp.sum(kl, axis=-1)


def _bce_with_logits_sum(logits, target):
    return jnp.sum(jnp.maximum(logits, 0) - logits * target + jnp.log1p(jnp.exp(-jnp.abs(logits))))


class ProbabilisticUNetModel(Model):
    """Model wrapper exposing the reference-style ``sample``/``elbo`` API."""

    def sample_fn(self, variables, x, rng, train: bool = False):
        """One prior sample -> logits (pure; usable inside jit)."""
        enc = self.module.apply(variables, x, train=train, method=ProbabilisticUNetModule.encode)
        mu, log_sigma = enc["prior"]
        z = mu + jnp.exp(log_sigma) * jax.random.normal(rng, mu.shape)
        return self.module.apply(variables, enc["features"], z,
                                 method=ProbabilisticUNetModule.reconstruct)

    def elbo_fn(self, variables, x, y, rng, consm=None, train: bool = True):
        """ELBO (pure; differentiable): -(sum recon loss + beta * mean KL)."""
        enc = self.module.apply(variables, x, y=y, train=train,
                                method=ProbabilisticUNetModule.encode)
        mu_q, log_sigma_q = enc["posterior"]
        mu_p, log_sigma_p = enc["prior"]
        z_posterior = mu_q + jnp.exp(log_sigma_q) * jax.random.normal(rng, mu_q.shape)
        kl = jnp.mean(_kl_diag_gaussians(mu_q, log_sigma_q, mu_p, log_sigma_p))
        reconstruction = self.module.apply(
            variables, enc["features"], z_posterior, method=ProbabilisticUNetModule.reconstruct
        )
        if self.module.rl_swap:
            from ..loss.dice import DiceLossWithLogits

            criterion = DiceLossWithLogits()
            if self.module.consensus_masking and consm is not None:
                recon_loss = criterion(reconstruction * consm, y * consm)
            else:
                recon_loss = criterion(reconstruction, y)
        else:
            if self.module.consensus_masking and consm is not None:
                recon_loss = _bce_with_logits_sum(reconstruction * consm, y * consm)
            else:
                recon_loss = _bce_with_logits_sum(reconstruction, y)
        return -(recon_loss + self.module.beta * kl)

    def sample(self, x, rng=None, testing: bool = False):
        """Convenience host-side sampling with the current parameters."""
        if rng is None:
            self._sample_seed = getattr(self, "_sample_seed", 0) + 1
            rng = jax.random.PRNGKey(self._sample_seed)
        x = jnp.asarray(np.asarray(x), dtype=jnp.float32)
        return self.sample_fn(self.variables, x, rng)


def ProbabilisticUNet(
    input_channels: int = 1,
    num_classes: int = 1,
    num_filters: Sequence[int] = (32, 64, 128, 192),
    latent_dim: int = 6,
    no_convs_fcomb: int = 4,
    beta: float = 10.0,
    rl_swap: bool = False,
    consensus_masking: bool = False,
    device=None,  # API parity, unused
    dtype=jnp.float32,
    seed: int = 0,
) -> ProbabilisticUNetModel:
    """Build a Probabilistic U-Net (reference model/probabilistic_unet.py:286)."""
    module = ProbabilisticUNetModule(
        input_channels=input_channels, num_classes=num_classes, num_filters=tuple(num_filters),
        latent_dim=latent_dim, no_convs_fcomb=no_convs_fcomb, beta=beta, rl_swap=rl_swap,
        consensus_masking=consensus_masking, dtype=dtype,
    )
    depth = len(num_filters)
    min_spatial = (2 ** depth, 2 ** depth)
    model = ProbabilisticUNetModel(
        module,
        init_kwargs={
            "input_channels": input_channels, "num_classes": num_classes,
            "num_filters": list(num_filters), "latent_dim": latent_dim,
            "no_convs_fcomb": no_convs_fcomb, "beta": beta, "rl_swap": rl_swap,
            "consensus_masking": consensus_masking,
        },
        example_input_shape=(1, input_channels) + min_spatial,
        in_channels=input_channels,
        out_channels=num_classes,
        seed=seed,
    )
    model.factory = "torch_em_tpu.models.probabilistic_unet.ProbabilisticUNet"
    return model
