"""Electron microscopy datasets."""

from .cremi import get_cremi_data, get_cremi_dataset, get_cremi_loader, get_cremi_paths
from .isbi2012 import get_isbi_data, get_isbi_dataset, get_isbi_loader, get_isbi_paths
from .lucchi import get_lucchi_data, get_lucchi_dataset, get_lucchi_loader, get_lucchi_paths
from .mitoem import get_mitoem_data, get_mitoem_dataset, get_mitoem_loader, get_mitoem_paths
from .snemi import get_snemi_data, get_snemi_dataset, get_snemi_loader, get_snemi_paths
from .vnc import get_vnc_data, get_vnc_mito_dataset, get_vnc_mito_loader, get_vnc_mito_paths
