"""Train CAT — CLI with the reference's flag surface.

reference: cat_scripts/train_cat.py:247-319. Example:

    python -m favae_tpu.cli.train_cat --ds cat_run --codebook_size 1024 \
        --embed_dim 256 --use_same_gauss_resblock --gaussian_kernel 3 \
        --clip vit-l-14 --n_cond_embed 768 --txt_tok_cond --enabled_warmup \
        --favae_ckpt expe_7_mu9.pt --clip_ckpt ViT-L-14.pt \
        --bpe_vocab bpe_simple_vocab_16e6.txt.gz \
        --train_file celeba_train_w_cap.pkl --val_file celeba_test_w_cap.pkl
"""

from __future__ import annotations

import argparse
import os

import jax


def build_parser():
    p = argparse.ArgumentParser(description="Train CAT (TPU)")
    p.add_argument("--ds", type=str, required=True)
    p.add_argument("--gpt_name", type=str, default="gpt2_medium",
                   choices=["gpt2_mini", "gpt2_medium", "gpt2_large"])
    p.add_argument("--gpt_remat", type=str, default="dots_nb",
                   choices=["full", "dots", "dots_nb", "none"],
                   help="training-path remat of the GPT blocks: identical "
                        "math, memory/compute trade (see GPTConfig.remat). "
                        "dots_nb is fastest-that-fits at gpt2_medium "
                        "batch<=16 on one v5e; fall back to full if OOM")
    p.add_argument("--gpt_unroll", type=int, default=1,
                   help="unroll factor for the training-path layer scan; "
                        "n_layer gives ~+5%% step throughput for a ~1.5x "
                        "longer compile (identical math)")
    p.add_argument("--dropout_rng", type=str, default="rbg",
                   choices=["rbg", "threefry"],
                   help="PRNG behind training dropout masks; rbg (TPU "
                        "hardware RNG) is ~7%% faster per step, threefry "
                        "restores the JAX-default stream")
    p.add_argument("--fold_ln_scale", action="store_true",
                   help="fold each pre-projection LayerNorm scale into the "
                        "projection kernel (same function of the same "
                        "params; turns activation-sized LN-scale grad "
                        "reductions into weight-sized ones)")
    p.add_argument("--adam_mu_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="storage dtype of Adam's first moment (optax "
                        "mu_dtype); bfloat16 halves the mu HBM traffic of "
                        "the optimizer phase, float32 (default) keeps the "
                        "reference's exact AdamW dynamics")
    p.add_argument("--clip", type=str, default="vit-l-14",
                   choices=["vit-b-32", "vit-l-14"])
    p.add_argument("--dropout", type=float, default=0.1)
    p.add_argument("--min_lr", type=float, default=0.0)
    p.add_argument("--base_lr", type=float, default=2e-6)
    p.add_argument("--batch_size", type=int, default=2)
    p.add_argument("--grad_accum", type=int, default=1,
                   help="split each batch into N microbatches, scan "
                        "value_and_grad over them and apply ONE averaged "
                        "update — trains effective batches that OOM as a "
                        "single activation footprint (e.g. 24 = 2x12 on a "
                        "16G v5e; see docs/PERFORMANCE.md). batch_size must "
                        "be divisible by N")
    p.add_argument("--adam_nu_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="storage dtype of Adam's SECOND moment (no optax "
                        "equivalent; see cat_step.scale_by_adam_nu). "
                        "Riskier than bf16 mu — sqrt(nu) scales the step "
                        "size — keep float32 unless the on-chip A/B "
                        "(scripts/validate_mu_dtype.py WHAT=nu) is neutral "
                        "for your config")
    p.add_argument("--cache_latents", action="store_true",
                   help="precompute the frozen FA-VAE token ids and CLIP "
                        "text embeddings ONCE before training and train the "
                        "GPT from the cache: removes the per-step frozen-"
                        "tower recompute (~9%% of the r5 chip step) and "
                        "frees their params + encoder activations from "
                        "device memory; update-for-update identical to the "
                        "full pipeline. Costs ~237 KB host RAM per sample "
                        "(ViT-L/14)")
    p.add_argument("--save_every_epoch", type=int, default=1)
    p.add_argument("--favae_ckpt", type=str, default=None,
                   help="reference-format FA-VAE checkpoint (.pt) or None for "
                        "random first stage (smoke tests)")
    p.add_argument("--clip_ckpt", type=str, default=None,
                   help="OpenAI CLIP checkpoint (.pt) for the text tower")
    p.add_argument("--bpe_vocab", type=str, default=None,
                   help="bpe_simple_vocab_16e6.txt.gz path")
    p.add_argument("--codebook_size", type=int, default=1024)
    p.add_argument("--embed_dim", type=int, default=256)
    p.add_argument("--double_z", action="store_true")
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--warmup_epochs", type=int, default=20)
    p.add_argument("--resolution", type=int, default=256)
    p.add_argument("--top_k", type=int, default=500)
    p.add_argument("--top_p", type=float, default=0.95)
    p.add_argument("--normalize_clip", action="store_true")
    p.add_argument("--enabled_warmup", action="store_true")
    p.add_argument("--print_steps", type=int, default=10)
    p.add_argument("--img_steps", type=int, default=1000)
    p.add_argument("--txt_tok_cond", action="store_true")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--resume_path", type=str, default=None,
                   help="explicit checkpoint to resume/warm-start from: an "
                        "Orbax dir (full state) or a reference-format torch "
                        ".pt (GPT weights only). Default: save_dir/latest "
                        "(reference: train_cat.py:199-204)")
    p.add_argument("--tp", type=int, default=1,
                   help="tensor-parallel degree for the GPT (devices = dp*tp)")
    p.add_argument("--train_file", type=str, default=None)
    p.add_argument("--val_file", type=str, default=None)
    p.add_argument("--use_cosine_sim", action="store_true")
    p.add_argument("--use_l2_quantizer", action="store_true")
    p.add_argument("--codebook_dim", type=int, default=None)
    p.add_argument("--use_same_conv_gauss", action="store_true")
    p.add_argument("--use_same_gauss_resblock", action="store_true")
    p.add_argument("--use_gauss_resblock", action="store_true")
    p.add_argument("--use_gauss_attn", action="store_true")
    p.add_argument("--use_patch_discriminator", action="store_true")
    p.add_argument("--gaussian_kernel", type=int, default=3)
    p.add_argument("--n_cond_embed", type=int, default=768)
    p.add_argument("--disc_n_layers", type=int, default=3)
    p.add_argument("--downsample_factor", type=int, default=16)
    p.add_argument("--num_groups", type=int, default=32)
    p.add_argument("--dsl_init_sigma", type=float, default=3.0)
    p.add_argument("--synthetic_data", action="store_true")
    p.add_argument("--debug_nans", action="store_true")
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    from favae_tpu.utils.xla_cache import enable_persistent_cache
    from favae_tpu.parallel.mesh import maybe_initialize_distributed
    enable_persistent_cache()
    maybe_initialize_distributed()
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    from favae_tpu import config as C
    from favae_tpu.data.pipeline import DataLoader, PklImageDataset, SyntheticDataset
    from favae_tpu.models.clip_text import BPETokenizer
    from favae_tpu.train.cat_trainer import CATTrainer
    from favae_tpu.utils.logging import print0

    if args.use_same_conv_gauss:
        fcm, dsl = C.FCM_CONV, C.DSL_PAIR
    elif args.use_same_gauss_resblock:
        fcm, dsl = C.FCM_RES, C.DSL_PAIR
    elif args.use_gauss_resblock:
        fcm, dsl = C.FCM_RES, C.DSL_NONPAIR
    elif args.use_gauss_attn:
        fcm, dsl = C.FCM_ATTN, C.DSL_NONPAIR
    else:
        fcm, dsl = C.FCM_RES, C.DSL_PAIR

    vqgan_cfg = C.VQGANConfig(
        codec=C.codec_for_downsample_factor(
            args.downsample_factor, resolution=args.resolution,
            z_channels=args.embed_dim, double_z=args.double_z,
            num_groups=args.num_groups),
        quantizer=C.QuantizerConfig(
            codebook_size=args.codebook_size, dim=args.embed_dim,
            codebook_dim=args.codebook_dim, use_cosine_sim=args.use_cosine_sim),
        discriminator=C.DiscriminatorConfig(
            kind="patch" if args.use_patch_discriminator else "conv",
            num_layers=args.disc_n_layers),
        fcm_kind=fcm, dsl_mode=dsl)

    gpt_factory = {"gpt2_mini": C.gpt2_mini, "gpt2_medium": C.gpt2_medium,
                   "gpt2_large": C.gpt2_large}[args.gpt_name]
    clip_cfg = (C.CLIPTextConfig() if args.clip == "vit-l-14"
                else C.CLIPTextConfig(width=512, heads=8, layers=12,
                                      embed_dim=512))
    cat_cfg = C.CATConfig(
        vqgan=vqgan_cfg,
        gpt=gpt_factory(vocab_size=args.codebook_size,
                        n_cond_embed=args.n_cond_embed,
                        dropout=args.dropout,
                        remat=args.gpt_remat,
                        train_unroll=args.gpt_unroll,
                        dropout_rng_impl=args.dropout_rng,
                        fold_ln_scale=args.fold_ln_scale),
        clip=clip_cfg, normalize_clip=args.normalize_clip,
        top_k=args.top_k, top_p=args.top_p, base_lr=args.base_lr,
        warmup_epochs=args.warmup_epochs, epochs=args.epochs,
        min_lr=args.min_lr, adam_mu_dtype=args.adam_mu_dtype,
        adam_nu_dtype=args.adam_nu_dtype)

    save_path = os.path.join("output", "cat", args.ds)
    os.makedirs(save_path, exist_ok=True)

    # frozen components
    favae_variables = cb_state = clip_params = None
    if args.favae_ckpt:
        from favae_tpu.utils.torch_convert import convert_favae
        params, batch_stats, cb_state = convert_favae(args.favae_ckpt, vqgan_cfg)
        favae_variables = {"params": params}
        if batch_stats:
            favae_variables["batch_stats"] = batch_stats
        print0(f"loaded FA-VAE first stage from {args.favae_ckpt}")
    if args.clip_ckpt:
        from favae_tpu.utils.torch_convert import convert_clip_text
        clip_params = convert_clip_text(args.clip_ckpt)
        print0(f"loaded CLIP text tower from {args.clip_ckpt}")
    tokenizer = BPETokenizer(args.bpe_vocab) if args.bpe_vocab else None

    global_batch = args.batch_size * jax.device_count()
    if args.synthetic_data or args.train_file is None:
        train_ds = SyntheticDataset(resolution=args.resolution,
                                    size=32 * global_batch, with_captions=True)
        val_ds = SyntheticDataset(resolution=args.resolution,
                                  size=4 * global_batch, with_captions=True,
                                  seed=7)
        if tokenizer is None:
            # tiny synthetic merges so tokenize() works without the vocab file
            tokenizer = BPETokenizer(merges=["s y", "sy n", "syn t"])
    else:
        train_ds = PklImageDataset(args.train_file, resolution=args.resolution,
                                   with_captions=True)
        val_ds = (PklImageDataset(args.val_file, resolution=args.resolution,
                                  with_captions=True)
                  if args.val_file else None)

    # each host loads only its shard of the global batch (shard_batch()
    # assembles the global array from the per-process pieces)
    host_batch = global_batch // jax.process_count()
    train_dl = DataLoader(train_ds, batch_size=host_batch,
                          num_workers=args.num_workers,
                          shard_index=jax.process_index(),
                          shard_count=jax.process_count())
    val_dl = (DataLoader(val_ds, batch_size=host_batch, shuffle=False,
                         num_workers=args.num_workers,
                         shard_index=jax.process_index(),
                         shard_count=jax.process_count())
              if val_ds else None)

    trainer = CATTrainer(cat_cfg, save_path, steps_per_epoch=len(train_dl),
                         batch_size=args.batch_size,
                         favae_variables=favae_variables, cb_state=cb_state,
                         clip_params=clip_params, tokenizer=tokenizer,
                         log_dir=os.path.join(save_path, "runs"),
                         enabled_warmup=args.enabled_warmup, tp=args.tp,
                         save_every_epoch=args.save_every_epoch,
                         grad_accum=args.grad_accum,
                         cache_latents=args.cache_latents)
    if args.resume or args.resume_path:
        trainer.resume(args.resume_path)
    print0(f"devices={jax.device_count()} global_batch={global_batch}")
    trainer.fit(train_dl, val_dl, print_steps=args.print_steps,
                img_steps=args.img_steps)


if __name__ == "__main__":
    main()
