"""Model zoo: U-Net family (more model families in submodules)."""

from .base import Model, get_activation
from .unet import UNet2d, UNet3d, AnisotropicUNet, UNetModule, POSTPROCESSING
