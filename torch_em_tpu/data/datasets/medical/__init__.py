"""Medical imaging datasets."""

from .busi import get_busi_data, get_busi_dataset, get_busi_loader, get_busi_paths
from .dca1 import get_dca1_data, get_dca1_dataset, get_dca1_loader, get_dca1_paths
