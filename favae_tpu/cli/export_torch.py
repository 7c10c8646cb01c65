"""Export a favae_tpu Orbax checkpoint to a reference-format torch .pt.

The inverse of loading the released checkpoints: train here, hand the
weights back to the reference ecosystem (utils/torch_export.py).

    python -m favae_tpu.cli.export_torch --preset celebahq_expe5 \
        --orbax_ckpt output/run/best --out run_best.pt

CAT checkpoints (writes the reference's {"transformer_model": ...} layout,
cat_scripts/train_cat.py:219-226):

    python -m favae_tpu.cli.export_torch --cat --orbax_ckpt output/cat/best \
        --gpt_name gpt2_medium --codebook_size 1024 --out cat_best.pt
"""

from __future__ import annotations

import argparse


def _export_cat(args):
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from favae_tpu import config as C
    from favae_tpu.models.gpt import GPT
    from favae_tpu.train.cat_step import (CATTrainState, make_cat_optimizer)
    from favae_tpu.utils.checkpoint import restore_checkpoint
    from favae_tpu.utils.torch_export import save_cat_pt

    gpt_cfg = {"gpt2_mini": C.gpt2_mini, "gpt2_medium": C.gpt2_medium,
               "gpt2_large": C.gpt2_large}[args.gpt_name](
        vocab_size=args.codebook_size, n_cond_embed=args.n_cond_embed)
    # the restore template's opt_state mu leaves must match the dtype the
    # checkpoint was trained with (--adam_mu_dtype bfloat16 runs have bf16
    # mu); mirror the train_cat flag so the template agrees
    cat_cfg = dataclasses.replace(C.cat_celebahq(),
                                  adam_mu_dtype=args.adam_mu_dtype)
    gpt = GPT(gpt_cfg, dtype=jnp.float32)
    # template tree only — one dummy token keeps the init forward trivial
    params = gpt.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 1), jnp.int32),
        jnp.zeros((1, 1, gpt_cfg.n_cond_embed)), jnp.ones((1, 1), bool),
        cond_drop_prob=0.0)["params"]
    tx = make_cat_optimizer(cat_cfg, optax.constant_schedule(0.0))
    state = CATTrainState(gpt_params=params, opt_state=tx.init(params),
                          step=jnp.int32(0))
    state, meta = restore_checkpoint(args.orbax_ckpt, state)
    save_cat_pt(args.out, state.gpt_params,
                image_encoded_dim=gpt_cfg.image_encoded_dim,
                n_cond_embed=gpt_cfg.n_cond_embed,
                epoch=int(meta.get("epoch", 0)),
                best_score=float(meta.get("best_score",
                                          meta.get("score", np.inf))),
                step=int(state.step))
    print(f"wrote reference-format CAT checkpoint -> {args.out}")


def main(argv=None):
    p = argparse.ArgumentParser(description="Export checkpoint to torch .pt")
    p.add_argument("--preset", type=str, default="celebahq_expe5")
    p.add_argument("--orbax_ckpt", type=str, required=True,
                   help="favae_tpu checkpoint dir (latest/best)")
    p.add_argument("--out", type=str, required=True, help="output .pt path")
    p.add_argument("--resolution", type=int, default=256)
    p.add_argument("--cat", action="store_true",
                   help="export a CAT GPT checkpoint instead of FA-VAE")
    p.add_argument("--gpt_name", type=str, default="gpt2_medium",
                   choices=["gpt2_mini", "gpt2_medium", "gpt2_large"])
    p.add_argument("--codebook_size", type=int, default=1024)
    p.add_argument("--n_cond_embed", type=int, default=768)
    p.add_argument("--adam_mu_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="Adam first-moment dtype the CAT checkpoint was "
                        "trained with (must match --adam_mu_dtype at train "
                        "time for the Orbax restore template)")
    args = p.parse_args(argv)

    if args.cat:
        _export_cat(args)
        return

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
