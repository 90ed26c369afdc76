"""Model wrapper: flax.linen module + parameters + serialization manifest.

The reference's models are stateful torch modules that follow the repo-wide
``init_kwargs`` convention (e.g. torch_em/model/unet.py:559) so checkpoints
can rebuild them. Here the TPU-native equivalent: a :class:`Model` couples

- a pure flax.linen ``module`` (the traced computation),
- a ``variables`` pytree (params + optional state collections like
  batch_stats), and
- ``init_kwargs`` + a registry path, the static manifest used by the trainer
  serializer (replaces pickle, SURVEY.md §5.4).

Calling conventions match the reference: inputs/outputs are channel-first
(N, C, *spatial); modules transpose to channels-last internally because that
is the layout XLA tiles best onto the MXU.
"""

from typing import Any, Callable, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Model", "get_activation", "ACTIVATIONS"]


def _softmax_c(x):
    return jax.nn.softmax(x, axis=1)


ACTIVATIONS: Dict[str, Callable] = {
    "Sigmoid": jax.nn.sigmoid,
    "Softmax": _softmax_c,
    "Tanh": jnp.tanh,
    "ReLU": jax.nn.relu,
    "LeakyReLU": jax.nn.leaky_relu,
    "GELU": jax.nn.gelu,
    "Identity": lambda x: x,
    "ELU": jax.nn.elu,
}


def get_activation(activation: Optional[Union[str, Callable]]) -> Optional[Callable]:
    """Resolve an activation given by name (torch-style, e.g. 'Sigmoid') or callable.

    Mirrors UNetBase._get_activation (reference model/unet.py:162).
    """
    if activation is None:
        return None
    if callable(activation):
        return activation
    if isinstance(activation, str) and activation in ACTIVATIONS:
        return ACTIVATIONS[activation]
    raise ValueError(f"Invalid activation: {activation}")


class Model:
    """A stateful convenience wrapper around a pure flax module.

    - ``model(x)`` runs inference with the current parameters (jitted, cached
      by input shape), accepting numpy or jax arrays (N, C, *spatial).
    - ``model.apply(variables, x, train=...)`` is the pure function the
      trainer differentiates through.
    - ``model.variables`` is the parameter pytree (checkpointed by the
      trainer); ``model.init_kwargs`` the reconstruction manifest.
    """

    def __init__(
        self,
        module,
        init_kwargs: Dict[str, Any],
        example_input_shape: Tuple[int, ...],
        in_channels: Optional[int] = None,
        out_channels=None,
        seed: int = 0,
        eager_init: bool = True,
    ):
        self.module = module
        self.init_kwargs = dict(init_kwargs)
        self.example_input_shape = tuple(example_input_shape)
        self.in_channels = in_channels
        self.out_channels = out_channels
        self._seed = seed
        self.variables = None
        self._predict_fns = {}
        self.train_mode = False
        if eager_init:
            self.initialize()

    # -- parameter management -------------------------------------------------
    def initialize(self, rng: Optional[jax.Array] = None, example: Optional[jnp.ndarray] = None):
        """Initialize parameters (on the CPU backend; the trainer moves them)."""
        if rng is None:
            rng = jax.random.PRNGKey(self._seed)
        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            if example is None:
                example = jnp.zeros(self.example_input_shape, dtype=jnp.float32)
            self.variables = self.module.init(rng, example, train=False)
        return self.variables

    @property
    def params(self):
        return None if self.variables is None else self.variables.get("params")

    @property
    def state(self):
        """Non-parameter collections (e.g. batch_stats)."""
        if self.variables is None:
            return {}
        return {k: v for k, v in self.variables.items() if k != "params"}

    def replace_variables(self, variables):
        self.variables = variables
        self._predict_fns.clear()

    @property
    def has_state(self) -> bool:
        return bool(self.state)

    # -- pure application ------------------------------------------------------
    def apply(self, variables, x, train: bool = False, rngs: Optional[Dict] = None, mutable=False):
        """Pure forward: ``module.apply`` with train-mode plumbed through."""
        return self.module.apply(variables, x, train=train, rngs=rngs, mutable=mutable)

    # -- convenience inference -------------------------------------------------
    def __call__(self, x, train: bool = False):
        if self.variables is None:
            self.initialize()
        x = jnp.asarray(np.asarray(x), dtype=jnp.float32)
        key = (x.shape, bool(train))
        if key not in self._predict_fns:
            self._predict_fns[key] = jax.jit(
                lambda v, inp: self.module.apply(v, inp, train=train)
            )
        return self._predict_fns[key](self.variables, x)

    def eval(self):
        self.train_mode = False
        return self

    def train(self, mode: bool = True):
        self.train_mode = mode
        return self

    def to(self, device):  # API compatibility no-op; jax manages placement
        return self

    def parameters(self):
        """Flat iterator over parameter leaves (torch-API affordance)."""
        if self.variables is None:
            self.initialize()
        return jax.tree_util.tree_leaves(self.variables.get("params", {}))

    def num_parameters(self) -> int:
        return sum(int(np.prod(p.shape)) for p in self.parameters())

    def __repr__(self):
        n = self.num_parameters() if self.variables is not None else "?"
        return f"Model({type(self.module).__name__}, params={n})"
