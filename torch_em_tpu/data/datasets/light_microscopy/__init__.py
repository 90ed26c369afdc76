"""Light microscopy datasets."""

from .covid_if import get_covid_if_data, get_covid_if_dataset, get_covid_if_loader, get_covid_if_paths
from .dsb import get_dsb_data, get_dsb_dataset, get_dsb_loader, get_dsb_paths
from .livecell import get_livecell_data, get_livecell_dataset, get_livecell_loader, get_livecell_paths
from .plantseg import get_plantseg_data, get_plantseg_dataset, get_plantseg_loader, get_plantseg_paths
from .ctc import (
    get_ctc_segmentation_data, get_ctc_segmentation_dataset, get_ctc_segmentation_loader,
    get_ctc_segmentation_paths,
)
from .deepbacs import get_deepbacs_data, get_deepbacs_dataset, get_deepbacs_loader, get_deepbacs_paths
