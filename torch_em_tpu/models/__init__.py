"""Model zoo: U-Nets, UNETR (ViT), ViM-UNet (Mamba), Probabilistic U-Net, 3D ResNets."""

from .base import Model, get_activation
from .probabilistic_unet import ProbabilisticUNet, ProbabilisticUNetModel
from .resnet3d import (
    resnet3d_18, resnet3d_34, resnet3d_50, resnet3d_101, resnet3d_152,
    resnext3d_50_32x4d, resnext3d_101_32x8d, resnext3d_101_64x4d,
    wide_resnet3d_50_2, wide_resnet3d_101_2,
)
from .dino import DinoV2ViT, DinoV3ViT
from .sam3 import Sam3ViT
from .scalemae import MAEViT, ScaleMAEViT
from .unet import AnisotropicUNet, POSTPROCESSING, UNet2d, UNet3d, UNetModule
from .unetr import UNETR, UNETR2D, UNETR3D, DepthStripPooling
from .vim import get_vim_encoder, get_vimunet_model, ViM
from .vit import get_vision_transformer, ViT
