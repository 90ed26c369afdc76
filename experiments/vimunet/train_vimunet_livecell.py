"""ViM-UNet / UNETR on LIVECell recipe (BASELINE.md config 5).

Run: python train_vimunet_livecell.py -i /path/to/livecell [--model vim|unetr]
"""

import torch_em_tpu as torch_em
from torch_em_tpu.data.datasets.light_microscopy import get_livecell_loader
from torch_em_tpu.utils.training import parser_helper


def get_model(kind: str, out_channels: int):
    if kind == "vim":
        from torch_em_tpu.models import get_vimunet_model

        return get_vimunet_model(out_channels=out_channels, model_type="vim_t", img_size=512,
                                 final_activation="Sigmoid")
    from torch_em_tpu.models import UNETR

    return UNETR(img_size=512, encoder="vit_b", out_channels=out_channels,
                 resize_input=True, final_activation="Sigmoid")


def main():
    parser = parser_helper(description="Train ViM-UNet / UNETR on LIVECell",
                           default_iterations=100000, default_batch_size=4)
    parser.add_argument("--model", default="vim", choices=("vim", "unetr"))
    args = parser.parse_args()

    model = get_model(args.model, out_channels=2)
    patch_shape = (512, 512)
    train_loader = get_livecell_loader(
        args.input, "train", patch_shape, batch_size=args.batch_size, boundaries=True,
        download=True, num_workers=4, shuffle=True,
    )
    val_loader = get_livecell_loader(
        args.input, "val", patch_shape, batch_size=args.batch_size, boundaries=True,
        download=True, num_workers=4,
    )

    trainer = torch_em.default_segmentation_trainer(
        name=f"livecell-{args.model}",
        model=model,
        train_loader=train_loader,
        val_loader=val_loader,
        learning_rate=1e-4,
        mixed_precision=True,
    )
    trainer.fit(iterations=args.n_iterations)


if __name__ == "__main__":
    main()
