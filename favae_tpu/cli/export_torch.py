"""Export a favae_tpu Orbax checkpoint to a reference-format torch .pt.

The inverse of loading the released checkpoints: train here, hand the
weights back to the reference ecosystem (utils/torch_export.py).

    python -m favae_tpu.cli.export_torch --preset celebahq_expe5 \
        --orbax_ckpt output/run/best --out run_best.pt
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description="Export checkpoint to torch .pt")
    p.add_argument("--preset", type=str, default="celebahq_expe5")
    p.add_argument("--orbax_ckpt", type=str, required=True,
                   help="favae_tpu checkpoint dir (latest/best)")
    p.add_argument("--out", type=str, required=True, help="output .pt path")
    p.add_argument("--resolution", type=int, default=256)
    args = p.parse_args(argv)

    import jax
    from favae_tpu import config as C
    from favae_tpu.train.favae_state import FavaeTrainState, merge_params
    from favae_tpu.utils.checkpoint import restore_checkpoint
    from favae_tpu.utils.torch_export import save_favae_pt

    model_cfg = C.PRESETS[args.preset]()
    loss_cfg = {
        "celebahq_expe5": C.celebahq_expe5_losses,
        "ffhq_table1": C.ffhq_table1_losses,
        "imagenet_f16": C.imagenet_f16_losses,
        "imagenet_f4": C.imagenet_f4_losses,
    }[args.preset]()
    state, _, _, _ = FavaeTrainState.create(
        model_cfg, loss_cfg, C.TrainConfig(), jax.random.PRNGKey(0), lr=1e-4,
        image_size=args.resolution)
    state, meta = restore_checkpoint(args.orbax_ckpt, state)
    save_favae_pt(args.out, merge_params(state.params_g, state.params_d),
                  state.batch_stats, state.cb_state, model_cfg,
                  epoch=int(meta.get("epoch", 0)))
    print(f"wrote reference-format checkpoint -> {args.out}")


if __name__ == "__main__":
    main()
