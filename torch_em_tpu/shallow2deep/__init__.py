"""Shallow2Deep: RF-enhancer training (arXiv:2201.05846)."""

from .prepare_shallow2deep import prepare_shallow2deep, prepare_shallow2deep_advanced
from .pseudolabel_training import get_pseudolabel_dataset, get_pseudolabel_loader
from .shallow2deep_dataset import (
    Shallow2DeepDataset, Shallow2DeepImageCollectionDataset, get_shallow2deep_dataset,
    get_shallow2deep_loader,
)
from .shallow2deep_eval import evaluate_enhancers, visualize_pretrained_rfs
from .shallow2deep_model import IlastikPredicter, RFWithFilters, Shallow2DeepModel
from .transform import BoundaryTransform, ForegroundTransform
