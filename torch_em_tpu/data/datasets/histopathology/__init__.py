"""Histopathology datasets."""

from .monuseg import get_monuseg_data, get_monuseg_dataset, get_monuseg_loader, get_monuseg_paths
from .pannuke import get_pannuke_data, get_pannuke_dataset, get_pannuke_loader, get_pannuke_paths
