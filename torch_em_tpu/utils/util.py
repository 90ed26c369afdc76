"""Checkpoint/model access helpers (reference torch_em/util/util.py).

``get_trainer`` (:366), ``get_normalizer`` (:387), ``load_model`` (:408),
``model_is_equal`` (:463), ``get_constructor_arguments`` (:299, realized by
the repo-wide ``init_kwargs`` convention), ``get_random_colors`` (:472),
``is_compiled``/``auto_compile`` (:30/:38 — jit is always on in this
framework, so these are identity shims kept for API parity).
"""

import os
from typing import Optional

import numpy as np

__all__ = [
    "get_trainer", "get_normalizer", "load_model", "model_is_equal", "get_constructor_arguments",
    "get_random_colors", "is_compiled", "auto_compile",
]


def is_compiled(model) -> bool:
    """API parity: jax models are always jit-compiled on use."""
    return True


def auto_compile(model, compile_model=None, default_compile=True):
    """API parity shim: jit compilation is implicit (reference util.py:38)."""
    return model


def get_constructor_arguments(obj):
    """Constructor arguments of a framework object (reference util.py:299).

    All framework classes store them in ``init_kwargs``.
    """
    if hasattr(obj, "init_kwargs"):
        return dict(obj.init_kwargs)
    return {}


def get_trainer(checkpoint: str, name: str = "best", device: Optional[str] = None):
    """Load a trainer from a checkpoint folder or trainer instance
    (reference util.py:366)."""
    from ..trainer import DefaultTrainer

    if isinstance(checkpoint, DefaultTrainer):
        return checkpoint
    assert os.path.exists(checkpoint), checkpoint
    return DefaultTrainer.from_checkpoint(checkpoint, name=name, device=device)


def get_normalizer(trainer):
    """The raw normalizer used by the trainer's training dataset
    (reference util.py:387)."""
    dataset = trainer.train_loader.dataset
    while hasattr(dataset, "datasets"):
        dataset = dataset.datasets[0]
    preprocessor = getattr(dataset, "raw_transform", None)
    if preprocessor is None:
        from ..transforms.raw import standardize

        return standardize
    if hasattr(preprocessor, "normalizer"):
        return preprocessor.normalizer
    return preprocessor


def load_model(checkpoint: str, model=None, name: str = "best", state_key: str = "model_state",
               device: Optional[str] = None):
    """Load the model from a trained checkpoint (reference util.py:408)."""
    import jax
    from flax import serialization as flax_serialization

    from ..trainer import DefaultTrainer

    if model is None:
        trainer = get_trainer(checkpoint, name=name, device=device)
        model = trainer.model
        model.replace_variables(jax.device_get(trainer.variables))
        return model
    # load the state into a given model
    path = os.path.join(checkpoint, f"{name}.ckpt")
    save_dict = DefaultTrainer._load_save_dict(path)
    if model.variables is None:
        model.initialize()
    variables = flax_serialization.from_state_dict(
        jax.device_get(model.variables), save_dict[state_key]
    )
    model.replace_variables(variables)
    return model


def model_is_equal(model1, model2) -> bool:
    """Check whether two models have identical parameters (reference util.py:463)."""
    import jax

    leaves1 = jax.tree_util.tree_leaves(model1.variables)
    leaves2 = jax.tree_util.tree_leaves(model2.variables)
    if len(leaves1) != len(leaves2):
        return False
    return all(
        np.asarray(a).shape == np.asarray(b).shape and np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(leaves1, leaves2)
    )


def get_random_colors(labels: np.ndarray):
    """Random matplotlib colormap for a label image (reference util.py:472)."""
    from matplotlib import colors

    n_labels = len(np.unique(labels)) - 1
    cmap = [[0, 0, 0]] + np.random.rand(n_labels, 3).tolist()
    return colors.ListedColormap(cmap)
