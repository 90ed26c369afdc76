"""CREMI north-star recipe: anisotropic UNet3d, boundary targets with EM
defect augmentations (BASELINE.md config 2).

Run: python train_cremi.py -i /path/to/cremi [-n 100000]
"""

import torch_em_tpu as torch_em
from torch_em_tpu.data.datasets.electron_microscopy import get_cremi_loader
from torch_em_tpu.models import AnisotropicUNet
from torch_em_tpu.utils.training import parser_helper


def main():
    parser = parser_helper(description="Train an anisotropic 3D U-Net on CREMI",
                           default_iterations=100000, default_batch_size=1)
    args = parser.parse_args()

    model = AnisotropicUNet(
        in_channels=1, out_channels=1,
        scale_factors=[[1, 2, 2], [1, 2, 2], [2, 2, 2], [2, 2, 2]],
        initial_features=32, final_activation="Sigmoid", anisotropic_kernel=True,
    )

    patch_shape = (32, 256, 256)
    # train on samples A+B, validate on C
    train_loader = get_cremi_loader(
        args.input, patch_shape=patch_shape, batch_size=args.batch_size,
        samples=("A", "B"), boundaries=True, download=True, num_workers=4, shuffle=True,
        n_samples=1000,
    )
    val_loader = get_cremi_loader(
        args.input, patch_shape=patch_shape, batch_size=args.batch_size,
        samples=("C",), boundaries=True, download=True, num_workers=4, n_samples=50,
    )

    trainer = torch_em.default_segmentation_trainer(
        name="cremi-boundary-model",
        model=model,
        train_loader=train_loader,
        val_loader=val_loader,
        learning_rate=1e-4,
        mixed_precision=True,
        log_image_interval=100,
    )
    trainer.fit(iterations=args.n_iterations)


if __name__ == "__main__":
    main()
