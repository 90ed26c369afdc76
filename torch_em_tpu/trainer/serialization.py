"""Checkpoint (de)serialization of constructor data — the config system.

The reference's ``Serializer``/``Deserializer`` (torch_em/trainer/
default_trainer.py:325/:159) dump every trainer ``__init__`` kwarg into the
checkpoint so that ``from_checkpoint`` can rebuild a fully trainable trainer
(datasets included). It rests on pickle; here the TPU-native rebuild uses a
JSON-able spec tree + dotted-path registry instead (SURVEY.md §5.4):

- builtins pass through; tuples/dicts/lists recurse,
- plain callables/classes -> ``{"__callable__": "module.qualname"}``,
- instances following the ``init_kwargs`` convention ->
  ``{"__instance__": "module.Class", "kwargs": {...}}``,
- models (``Model`` wrappers) -> ``{"__model__": factory_path, "kwargs"}``,
- data loaders -> dataset spec + loader kwargs,
- small numpy arrays inline.

This keeps the checkpoint self-describing without executing arbitrary pickles.
"""

import importlib
from typing import Any, Dict

import numpy as np

__all__ = ["serialize_value", "serialize_value_or_pickle", "deserialize_value",
           "resolve_path", "path_of"]


def path_of(obj) -> str:
    """Dotted import path of a function / class."""
    module = getattr(obj, "__module__", None)
    name = getattr(obj, "__qualname__", getattr(obj, "__name__", None))
    if module is None or name is None or "<locals>" in name:
        raise ValueError(f"Cannot serialize {obj!r}: not importable by dotted path.")
    return f"{module}.{name}"


def resolve_path(path: str):
    module_name, _, qualname = path.rpartition(".")
    obj = importlib.import_module(module_name)
    for part in qualname.split("."):
        obj = getattr(obj, part)
    return obj


def serialize_value(value) -> Any:
    from ..data.loader import DataLoader
    from ..models.base import Model

    if value is None or isinstance(value, (bool, int, float, str)):
        return value
    if isinstance(value, tuple):
        return {"__tuple__": [serialize_value(v) for v in value]}
    if isinstance(value, list):
        return [serialize_value(v) for v in value]
    if isinstance(value, dict):
        return {"__dict__": {k: serialize_value(v) for k, v in value.items()}}
    if isinstance(value, slice):
        return {"__slice__": [value.start, value.stop, value.step]}
    if isinstance(value, np.dtype):
        return {"__dtype__": str(value)}
    if isinstance(value, np.generic):
        return value.item()
    if isinstance(value, np.ndarray):
        if value.size > 1_000_000:
            raise ValueError("Refusing to inline-serialize arrays larger than 1M elements.")
        return {"__ndarray__": value.tolist(), "dtype": str(value.dtype)}
    if isinstance(value, Model):
        factory = getattr(value, "factory", None)
        if factory is None:
            raise ValueError("Model has no .factory path; cannot serialize.")
        return {"__model__": factory, "kwargs": serialize_value(dict(value.init_kwargs))["__dict__"]}
    if isinstance(value, DataLoader):
        return {
            "__loader__": {
                "dataset": serialize_value(value.dataset),
                "kwargs": serialize_value(dict(value.init_kwargs))["__dict__"],
            }
        }
    import functools

    if isinstance(value, functools.partial):
        return {
            "__partial__": {
                "func": path_of(value.func),
                "args": [serialize_value(a) for a in value.args],
                "keywords": {k: serialize_value(v) for k, v in value.keywords.items()},
            }
        }
    if hasattr(value, "init_kwargs"):
        # objects built by a factory function record it via a `.factory` path
        target = value.factory if isinstance(getattr(value, "factory", None), str) else path_of(type(value))
        return {
            "__instance__": target,
            "kwargs": serialize_value(dict(value.init_kwargs))["__dict__"],
        }
    if callable(value):
        return {"__callable__": path_of(value)}
    raise ValueError(f"Cannot serialize value of type {type(value)}: {value!r}")


def serialize_value_or_pickle(value) -> Any:
    """``serialize_value`` with a pickle fallback.

    The manifest format prefers importable references (reconstructable,
    human-readable, robust across refactors). Values that cannot be expressed
    that way — e.g. loaders wrapping objects without ``init_kwargs`` — fall
    back to an inline pickle blob, mirroring the reference trainer's
    pickle-based init storage (reference default_trainer.py:73-105) so
    ``from_checkpoint`` reconstructs the same set of kwargs the reference
    does. Values that pickle cannot handle either (closures, locals) still
    raise ValueError for the caller to warn-and-drop.
    """
    try:
        return serialize_value(value)
    except ValueError:
        import base64
        import pickle

        try:
            blob = pickle.dumps(value)
        except Exception as e:
            raise ValueError(
                f"Cannot serialize {type(value)} by dotted path nor pickle: {e}")
        return {"__pickle__": base64.b64encode(blob).decode("ascii")}


def deserialize_value(spec) -> Any:
    if spec is None or isinstance(spec, (bool, int, float, str)):
        return spec
    if isinstance(spec, list):
        return [deserialize_value(v) for v in spec]
    if isinstance(spec, dict):
        if "__tuple__" in spec:
            return tuple(deserialize_value(v) for v in spec["__tuple__"])
        if "__dict__" in spec:
            return {k: deserialize_value(v) for k, v in spec["__dict__"].items()}
        if "__slice__" in spec:
            return slice(*spec["__slice__"])
        if "__dtype__" in spec:
            return np.dtype(spec["__dtype__"])
        if "__ndarray__" in spec:
            return np.asarray(spec["__ndarray__"], dtype=spec["dtype"])
        if "__callable__" in spec:
            return resolve_path(spec["__callable__"])
        if "__pickle__" in spec:
            import base64
            import pickle

            return pickle.loads(base64.b64decode(spec["__pickle__"]))
        if "__partial__" in spec:
            import functools

            p = spec["__partial__"]
            return functools.partial(
                resolve_path(p["func"]), *[deserialize_value(a) for a in p["args"]],
                **{k: deserialize_value(v) for k, v in p["keywords"].items()},
            )
        if "__instance__" in spec:
            cls = resolve_path(spec["__instance__"])
            kwargs = {k: deserialize_value(v) for k, v in spec["kwargs"].items()}
            return cls(**kwargs)
        if "__model__" in spec:
            factory = resolve_path(spec["__model__"])
            kwargs = {k: deserialize_value(v) for k, v in spec["kwargs"].items()}
            return factory(**kwargs)
        if "__loader__" in spec:
            from ..data.loader import DataLoader

            dataset = deserialize_value(spec["__loader__"]["dataset"])
            kwargs = {k: deserialize_value(v) for k, v in spec["__loader__"]["kwargs"].items()}
            return DataLoader(dataset, **kwargs)
        raise ValueError(f"Cannot deserialize spec with keys {list(spec.keys())}")
    raise ValueError(f"Cannot deserialize spec of type {type(spec)}")
