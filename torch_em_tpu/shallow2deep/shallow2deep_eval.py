"""Shallow2Deep evaluation (reference torch_em/shallow2deep/shallow2deep_eval.py).

``visualize_pretrained_rfs`` (:19) — predict samples with a subset of the RF
ensemble; ``evaluate_enhancers`` (:78) — compare enhancer predictions against
ground truth with a metric over multiple RF stages.
"""

import os
import pickle
from glob import glob
from typing import Callable, Dict, Optional, Sequence

import numpy as np

from .prepare_shallow2deep import _apply_filters, _get_filters

__all__ = ["visualize_pretrained_rfs", "evaluate_enhancers"]


def visualize_pretrained_rfs(checkpoint: str, raw: np.ndarray, n_forests: int,
                             sample_random: bool = False, filter_config=None,
                             n_threads: Optional[int] = None) -> Dict[str, np.ndarray]:
    """Predict a sample with a subset of the pretrained random forests
    (reference shallow2deep_eval.py:19); returns {rf_name: prediction}."""
    rf_paths = sorted(glob(os.path.join(checkpoint, "*.pkl")))
    assert rf_paths, f"No random forests found in {checkpoint}"
    if sample_random:
        rf_paths = list(np.random.choice(rf_paths, size=n_forests, replace=False))
    else:
        rf_paths = rf_paths[:: max(len(rf_paths) // n_forests, 1)][:n_forests]

    ndim = raw.ndim
    filters_and_sigmas = _get_filters(ndim, filter_config)
    features = _apply_filters(raw.astype("float32"), filters_and_sigmas)

    predictions = {}
    for path in rf_paths:
        with open(path, "rb") as f:
            rf = pickle.load(f)
        pred = rf.predict_proba(features)
        predictions[os.path.basename(path)] = pred.reshape(raw.shape + (pred.shape[1],))
    return predictions


def evaluate_enhancers(data: np.ndarray, labels: np.ndarray, enhancers: Dict[str, str],
                       rf_folder: str, metric: Callable, is2d: bool = False,
                       rf_channel=1, filter_config=None, prediction_function=None):
    """Evaluate enhancer models on RF predictions of increasing quality
    (reference shallow2deep_eval.py:78). Returns a pandas DataFrame of scores
    (rows = rf stages, columns = enhancers + raw rf)."""
    import pandas as pd

    from .shallow2deep_model import RFWithFilters, Shallow2DeepModel

    rf_paths = sorted(glob(os.path.join(rf_folder, "*.pkl")))
    assert rf_paths, f"No random forests found in {rf_folder}"
    ndim = 2 if is2d else data.ndim

    scores = {name: [] for name in enhancers}
    scores["rf-score"] = []
    rf_names = []
    for rf_path in rf_paths:
        rf_names.append(os.path.basename(rf_path))
        rf = RFWithFilters(rf_path, ndim, filter_config, output_channel=rf_channel)
        if is2d and data.ndim == 3:
            rf_pred = np.stack([rf(sl) for sl in data])
        else:
            rf_pred = rf(data)
        scores["rf-score"].append(metric(labels, rf_pred))

        for name, checkpoint in enhancers.items():
            model = Shallow2DeepModel.load_model(checkpoint, device="cpu")
            inp = rf_pred[None, None] if rf_pred.ndim == data.ndim else rf_pred[None]
            pred = np.asarray(model(inp.astype("float32")))[0]
            scores[name].append(metric(labels, pred))

    return pd.DataFrame(scores, index=rf_names)
