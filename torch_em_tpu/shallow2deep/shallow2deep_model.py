"""Shallow2Deep inference (reference torch_em/shallow2deep/shallow2deep_model.py).

``RFWithFilters`` (:30) — RF prediction with the filter bank;
``IlastikPredicter`` (:68) — import-guarded ilastik wrapper;
``Shallow2DeepModel`` (:123) — RF predict -> enhancer network, loaded from a
checkpoint or a bioimage.io package.
"""

import pickle
from typing import Optional, Tuple

import numpy as np

from .prepare_shallow2deep import _apply_filters, _get_filters

__all__ = ["RFWithFilters", "IlastikPredicter", "Shallow2DeepModel"]


class RFWithFilters:
    """Random forest prediction on filter-bank features (reference :30)."""

    def __init__(self, rf_path: str, ndim: int, filter_config, output_channel=None):
        with open(rf_path, "rb") as f:
            self.rf = pickle.load(f)
        self.filters_and_sigmas = _get_filters(ndim, filter_config)
        self.output_channel = output_channel

    def __call__(self, x: np.ndarray) -> np.ndarray:
        features = _apply_filters(np.asarray(x, dtype="float32"), self.filters_and_sigmas)
        assert features.shape[1] == self.rf.n_features_in_, \
            f"{features.shape[1]}, {self.rf.n_features_in_}"
        out = self.rf.predict_proba(features)
        if self.output_channel is None:
            out_shape = (out.shape[1],) + x.shape
        else:
            out = out[:, self.output_channel]
            out_shape = x.shape if isinstance(self.output_channel, int) \
                else (len(self.output_channel),) + x.shape
        return out.reshape(out_shape).astype("float32")


class IlastikPredicter:
    """Prediction with an ilastik pixel-classification project (reference :68);
    requires the optional ilastik dependency."""

    def __init__(self, ilp_path: str, ndim: int, ilastik_multi_thread: bool = False,
                 output_channel=None):
        try:
            import ilastik.experimental.api as ilastik_api  # noqa: F401
        except ImportError as e:
            raise RuntimeError("IlastikPredicter requires the ilastik api.") from e
        import xarray

        self.ilp = ilastik_api.from_project_file(ilp_path)
        self.dims = ("y", "x") if ndim == 2 else ("z", "y", "x")
        self.output_channel = output_channel
        self._xarray = xarray

    def __call__(self, x: np.ndarray) -> np.ndarray:
        assert x.ndim == len(self.dims), f"{x.ndim}, {self.dims}"
        out = self.ilp.predict(self._xarray.DataArray(x, dims=self.dims)).values
        if self.output_channel is not None:
            out = out[..., self.output_channel]
        return out


class Shallow2DeepModel:
    """RF prediction -> enhancer network (reference :123)."""

    @staticmethod
    def load_model(checkpoint, device=None):
        from ..utils.util import get_trainer

        try:
            trainer = get_trainer(checkpoint, device=device or "cpu")
            return trainer.model
        except Exception as e:
            print("Could not load torch_em_tpu checkpoint from", checkpoint, ":", e)
        from ..utils.modelzoo import import_bioimageio_model

        model, _ = import_bioimageio_model(checkpoint)
        return model

    @staticmethod
    def load_rf(rf_config, rf_channel=1, ilastik_multi_thread=False):
        if len(rf_config) == 3:  # random forest path and feature config
            rf_path, ndim, filter_config = rf_config
            assert isinstance(rf_path, str)
            return RFWithFilters(rf_path, ndim, filter_config, output_channel=rf_channel)
        elif len(rf_config) == 2:  # ilastik project and dimensionality
            ilp_path, ndim = rf_config
            return IlastikPredicter(ilp_path, ndim, ilastik_multi_thread,
                                    output_channel=rf_channel)
        raise ValueError(f"Invalid rf config: {rf_config}")

    def __init__(self, checkpoint: str, rf_config: Tuple, device=None, rf_channel: int = 1,
                 ilastik_multi_thread: bool = False):
        self.model = self.load_model(checkpoint, device)
        self.rf_predicter = self.load_rf(rf_config, rf_channel, ilastik_multi_thread)
        self.checkpoint = checkpoint
        self.rf_config = rf_config
        self.device = device

    def __call__(self, x) -> np.ndarray:
        """x: (N, C, *spatial) batch; RF runs per sample, the enhancer batched."""
        x = np.asarray(x)
        rf_pred = np.stack([
            self.rf_predicter(sample[0].astype("float32")) for sample in x
        ])
        if rf_pred.ndim == x.ndim - 1:
            rf_pred = rf_pred[:, None]
        return np.asarray(self.model(rf_pred))

    # pickle support without the heavy rf/model state
    def __getstate__(self):
        state = self.__dict__.copy()
        del state["rf_predicter"]
        del state["model"]
        return state

    def __setstate__(self, state):
        state["model"] = self.load_model(state["checkpoint"], state["device"])
        state["rf_predicter"] = self.load_rf(state["rf_config"])
        self.__dict__.update(state)
