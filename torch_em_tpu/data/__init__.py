"""Data pipeline: lazy patch datasets, samplers, and the prefetching loader."""

from .base import Dataset
from .concat_dataset import ConcatDataset
from .dataset_wrapper import DatasetWrapper
from .image_collection_dataset import ImageCollectionDataset
from .loader import DataLoader, DistributedIndexSampler, default_collate
from .pseudo_label_dataset import PseudoLabelDataset
from .raw_dataset import RawDataset, RawDatasetWithMasks
from .raw_image_collection_dataset import RawImageCollectionDataset
from .sampler import (
    MinForegroundSampler, MinSemanticLabelForegroundSampler, MinIntensitySampler,
    MinInstanceSampler, MinTwoInstanceSampler, MinNoToBackgroundBoundarySampler,
)
from .segmentation_dataset import SegmentationDataset
from .tensor_dataset import TensorDataset
