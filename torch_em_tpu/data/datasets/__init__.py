"""Dataset zoo: download/caching + dataset/loader factories per dataset
(reference torch_em/data/datasets/). Four domains: electron_microscopy,
light_microscopy, histopathology, medical.
"""

from . import util
from .electron_microscopy import *  # noqa: F401,F403
from .light_microscopy import *  # noqa: F401,F403
from .histopathology import *  # noqa: F401,F403
