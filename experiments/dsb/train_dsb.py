"""DSB north-star recipe: 2D U-Net, foreground + boundary targets
(reference README.md:28-70 recipe; BASELINE.md config 1).

Run: python train_dsb.py -i /path/to/dsb [-n 25000]
"""

import torch_em_tpu as torch_em
from torch_em_tpu.data.datasets.light_microscopy import get_dsb_loader
from torch_em_tpu.models import UNet2d
from torch_em_tpu.utils.training import parser_helper


def main():
    parser = parser_helper(description="Train a 2D U-Net on DSB", default_iterations=25000,
                           default_batch_size=8)
    args = parser.parse_args()

    model = UNet2d(in_channels=1, out_channels=2, initial_features=64,
                   final_activation="Sigmoid")

    patch_shape = (1, 256, 256)
    train_loader = get_dsb_loader(
        args.input, patch_shape=patch_shape, split="train", download=True,
        batch_size=args.batch_size, boundaries=True, num_workers=4, shuffle=True,
    )
    val_loader = get_dsb_loader(
        args.input, patch_shape=patch_shape, split="test", download=True,
        batch_size=args.batch_size, boundaries=True, num_workers=4,
    )

    if args.check:
        from torch_em_tpu.utils.debug import check_loader

        check_loader(train_loader, n_samples=4, save_path="./dsb_loader_check")
        return

    trainer = torch_em.default_segmentation_trainer(
        name="dsb-boundary-model",
        model=model,
        train_loader=train_loader,
        val_loader=val_loader,
        learning_rate=1e-4,
        log_image_interval=100,
    )
    trainer.fit(iterations=args.n_iterations)


if __name__ == "__main__":
    main()
