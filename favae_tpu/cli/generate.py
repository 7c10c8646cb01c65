"""Text-to-image generation with a trained CAT model.

The reference only samples inside the trainer's log_images
(cat_scripts/train_cat.py:102-107); this standalone CLI is the user-facing
generation tool.

    python -m favae_tpu.cli.generate --ckpt output/cat/run/best \
        --favae_ckpt expe_7_mu9.pt --clip_ckpt ViT-L-14.pt \
        --bpe_vocab bpe_simple_vocab_16e6.txt.gz \
        --prompt "a smiling woman with glasses" --n 4 --out samples.npz
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import jax


def resolve_cfg(codebook_size: int, embed_dim: int, gpt_name: str):
    """cat_celebahq with the checkpoint-shape knobs applied: codebook size /
    embed dim feed both the quantizer and the GPT vocab; gpt_name must match
    the trained --gpt_name (cli/train_cat.py) or the restore template won't
    line up."""
    import dataclasses
    from favae_tpu import config as C

    cfg = C.cat_celebahq()
    if (codebook_size, embed_dim, gpt_name) == (1024, 256, "gpt2_medium"):
        return cfg
    gpt_factory = {"gpt2_mini": C.gpt2_mini, "gpt2_medium": C.gpt2_medium,
                   "gpt2_large": C.gpt2_large}[gpt_name]
    vqgan = dataclasses.replace(
        cfg.vqgan, quantizer=dataclasses.replace(
            cfg.vqgan.quantizer, codebook_size=codebook_size, dim=embed_dim))
    return C.CATConfig(
        vqgan=vqgan, clip=cfg.clip,
        gpt=gpt_factory(vocab_size=codebook_size,
                        n_cond_embed=cfg.gpt.n_cond_embed))


def main(argv=None):
    p = argparse.ArgumentParser(description="CAT text-to-image generation")
    p.add_argument("--ckpt", type=str, default=None,
                   help="favae_tpu CAT checkpoint dir (Orbax)")
    p.add_argument("--torch_cat_ckpt", type=str, default=None,
                   help="reference CelebA_CAT.pt (GPT weights)")
    p.add_argument("--favae_ckpt", type=str, default=None)
    p.add_argument("--clip_ckpt", type=str, default=None)
    p.add_argument("--bpe_vocab", type=str, default=None)
    p.add_argument("--prompt", type=str, action="append", required=True,
                   help="repeatable; one image set per prompt")
    p.add_argument("--n", type=int, default=1, help="images per prompt")
    p.add_argument("--top_k", type=int, default=500)
    p.add_argument("--top_p", type=float, default=0.95)
    p.add_argument("--cond_scale", type=float, default=3.0)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--quantized", action="store_true",
                   help="serve the token loop with int8 feed-forward weights "
                        "(faster, slightly lossy; models/decode_engine.py)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", type=str, default="samples.npz")
    p.add_argument("--codebook_size", type=int, default=1024)
    p.add_argument("--embed_dim", type=int, default=256)
    p.add_argument("--gpt_name", type=str, default="gpt2_medium",
                   choices=["gpt2_mini", "gpt2_medium", "gpt2_large"],
                   help="must match the --gpt_name the checkpoint was "
                        "trained with (cli/train_cat.py)")
    args = p.parse_args(argv)

    from favae_tpu.utils.xla_cache import enable_persistent_cache
    enable_persistent_cache()
    from favae_tpu import config as C
    from favae_tpu.models.clip_text import BPETokenizer
    from favae_tpu.models.txt_cond import build_cat

    cfg = resolve_cfg(args.codebook_size, args.embed_dim, args.gpt_name)

    favae_variables = cb_state = clip_params = None
    if args.favae_ckpt:
        from favae_tpu.utils.torch_convert import convert_favae
        params, bs, cb_state = convert_favae(args.favae_ckpt, cfg.vqgan)
        favae_variables = {"params": params}
        if bs:
            favae_variables["batch_stats"] = bs
    if args.clip_ckpt:
        from favae_tpu.utils.torch_convert import convert_clip_text
        clip_params = convert_clip_text(args.clip_ckpt)
    tokenizer = (BPETokenizer(args.bpe_vocab) if args.bpe_vocab
                 else BPETokenizer(merges=["s y"]))

    cat, gpt_params = build_cat(cfg, jax.random.PRNGKey(args.seed),
                                favae_variables=favae_variables,
                                cb_state=cb_state, clip_params=clip_params,
                                tokenizer=tokenizer)
    if args.torch_cat_ckpt:
        from favae_tpu.utils.torch_convert import convert_cat_gpt
        gpt_params = convert_cat_gpt(args.torch_cat_ckpt)
    elif args.ckpt:
        from favae_tpu.utils.checkpoint import restore_checkpoint
        from favae_tpu.train.cat_step import (CATTrainState, create_cat_state,
                                              make_cat_optimizer)
        import optax
        tx = make_cat_optimizer(cfg, optax.constant_schedule(1e-4))
        template = create_cat_state(cat, gpt_params, tx)
        state, _ = restore_checkpoint(args.ckpt, template)
        gpt_params = state.gpt_params

    prompts = [pr for pr in args.prompt for _ in range(args.n)]
    text_ids = cat.tokenize(prompts)
    imgs, grids = cat.sample_images(
        gpt_params, text_ids, rng=jax.random.PRNGKey(args.seed + 1),
        top_k=args.top_k, top_p=args.top_p, temperature=args.temperature,
        cond_scale=args.cond_scale, quantized=args.quantized)
    imgs = np.clip(np.asarray(imgs) * 0.5 + 0.5, 0, 1)
    np.savez(args.out, images=imgs, tokens=np.asarray(grids),
             prompts=np.asarray(prompts, dtype=object))
    print(f"wrote {imgs.shape[0]} images -> {args.out}")

    # also dump pngs next to the npz when PIL is available
    try:
        from PIL import Image
        base = os.path.splitext(args.out)[0]
        for i, im in enumerate(imgs):
            Image.fromarray((im * 255).astype(np.uint8)).save(f"{base}_{i}.png")
    except ImportError:
        pass


if __name__ == "__main__":
    main()
