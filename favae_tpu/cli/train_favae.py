"""Train FA-VAE — CLI with the reference's flag surface.

reference: favae_scripts/train_favae.py:390-449. Same knob names; the
architecture-variant booleans (--use_non_pair_conv etc.) map onto
(fcm_kind, dsl_mode), and --preset selects a published configuration
directly. Launch:

    python -m favae_tpu.cli.train_favae --ds myrun --preset celebahq_expe5 \
        --train_file celeba_train.pkl --test_file celeba_test.pkl

No torchrun: SPMD covers every local device automatically.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os

import jax


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train FA-VAE (TPU)")
    p.add_argument("--ds", type=str, required=True, help="output run name")
    p.add_argument("--preset", type=str, default=None,
                   help="published config preset (celebahq_expe5, ffhq_table1, "
                        "imagenet_f16, imagenet_f4)")
    p.add_argument("--batch_size", type=int, default=8,
                   help="per-device batch size")
    p.add_argument("--downsample_factor", type=int, default=16)
    p.add_argument("--save_every_epoch", type=int, default=1)
    p.add_argument("--perceptual_weight", type=float, default=1.0)
    p.add_argument("--disc_weight", type=float, default=0.75)
    p.add_argument("--codebook_weight", type=float, default=1.0)
    # None = "not passed": presets keep their own schedule unless overridden
    p.add_argument("--disc_start_epochs", type=int, default=None)
    p.add_argument("--ffl_start_epochs", type=int, default=None)
    p.add_argument("--codebook_size", type=int, default=1024)
    p.add_argument("--embed_dim", type=int, default=256)
    p.add_argument("--codebook_dim", type=int, default=None)
    p.add_argument("--resolution", type=int, default=256)
    p.add_argument("--epochs", type=int, default=800)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--loader_uint8", action="store_true",
                   help="ship resized uint8 batches and normalize on device "
                        "(4x less host->device traffic; identical math)")
    p.add_argument("--loader_processes", action="store_true",
                   help="decode JPEGs in worker processes instead of threads "
                        "(avoids GIL contention with dispatch on few-core "
                        "hosts)")
    p.add_argument("--print_steps", type=int, default=10)
    p.add_argument("--img_steps", type=int, default=100)
    p.add_argument("--base_lr", type=float, default=2.0e-6)
    p.add_argument("--adam_mu_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"],
                   help="Adam first-moment storage dtype for both optimizers "
                        "(bfloat16 halves mu traffic; float32 keeps "
                        "reference-exact dynamics)")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--resume_path", type=str, default=None,
                   help="explicit checkpoint to resume/warm-start from: an "
                        "Orbax dir (full state) or a reference-format torch "
                        ".pt (weights only). Default: save_dir/latest "
                        "(reference: train_favae.py:334-341)")
    p.add_argument("--train_file", type=str, default=None)
    p.add_argument("--test_file", type=str, default=None)
    p.add_argument("--double_z", action="store_true")
    p.add_argument("--use_cosine_sim", action="store_true")
    p.add_argument("--use_l2_quantizer", action="store_true",
                   help="accepted for compatibility (always the l2 quantizer)")
    p.add_argument("--with_fcm", action="store_true")
    p.add_argument("--use_non_pair_conv", action="store_true")
    p.add_argument("--use_same_conv_gauss", action="store_true")
    p.add_argument("--use_same_gauss_resblock", action="store_true")
    p.add_argument("--use_gauss_resblock", action="store_true")
    p.add_argument("--use_gauss_attn", action="store_true")
    p.add_argument("--use_ffl_with_fcm", action="store_true")
    p.add_argument("--orthogonal_reg_active_codes_only", action="store_true")
    p.add_argument("--orthogonal_reg_weight", type=float, default=0.0)
    p.add_argument("--orthogonal_reg_max_codes", type=int, default=None)
    p.add_argument("--ffl_weight", type=float, default=0.0)
    p.add_argument("--DSL_weight_features", type=float, default=0.0)
    p.add_argument("--SL_weight", type=float, default=0.0)
    p.add_argument("--gaussian_kernel", type=int, default=9)
    p.add_argument("--gaussian_sigma", type=float, default=3.0)
    p.add_argument("--dsl_init_sigma", type=float, default=3.0)
    p.add_argument("--use_patch_discriminator", action="store_true")
    p.add_argument("--use_actnorm", action="store_true",
                   help="ActNorm instead of BatchNorm in the PatchGAN "
                        "(data-dependent init on the first batch; reference: "
                        "models/discriminator.py:53-138)")
    p.add_argument("--disc_n_layers", type=int, default=3)
    p.add_argument("--kmeans_init", action="store_true",
                   help="k-means codebook init from the first batch "
                        "(reference: models/l2_quantize.py:224-240,352-368)")
    p.add_argument("--kmeans_iters", type=int, default=10)
    p.add_argument("--threshold_ema_dead_code", type=float, default=0.0)
    p.add_argument("--num_groups", type=int, default=32)
    p.add_argument("--lpips_ckpt", type=str, default=None,
                   help="path to the torch vgg16_lpips.pt weights")
    p.add_argument("--synthetic_data", action="store_true",
                   help="train on synthetic data (smoke tests/benchmarks)")
    p.add_argument("--compute_dtype", type=str, default="bfloat16")
    p.add_argument("--debug_nans", action="store_true",
                   help="enable jax_debug_nans (the TPU analogue of the "
                        "reference's torch.autograd.set_detect_anomaly, "
                        "train_favae.py:30)")
    return p


def config_from_args(args):
    from favae_tpu import config as C

    if args.preset:
        if args.preset not in C.PRESETS:
            raise SystemExit(
                f"unknown preset '{args.preset}'; available: "
                + ", ".join(sorted(C.PRESETS)))
        model_cfg = C.PRESETS[args.preset]()
        loss_fn = {
            "celebahq_expe5": C.celebahq_expe5_losses,
            "ffhq_table1": C.ffhq_table1_losses,
            "imagenet_f16": C.imagenet_f16_losses,
            "imagenet_f4": C.imagenet_f4_losses,
        }[args.preset]
        loss_cfg = loss_fn()
        # the epoch gates are a training schedule, not part of the published
        # loss recipe: explicit flags override the preset (the reference CLI
        # always honors them, train_favae.py:82-103)
        import dataclasses
        overrides = {}
        if args.disc_start_epochs is not None:
            overrides["disc_start_epochs"] = args.disc_start_epochs
        if args.ffl_start_epochs is not None:
            overrides["ffl_start_epochs"] = args.ffl_start_epochs
        if overrides:
            loss_cfg = dataclasses.replace(loss_cfg, **overrides)
    else:
        # flag-based dispatch (reference: models/vqgan_fcm.py:58-96)
        if args.use_non_pair_conv:
            fcm, dsl = C.FCM_CONV, C.DSL_NONPAIR
        elif args.use_same_conv_gauss:
            fcm, dsl = C.FCM_CONV, C.DSL_PAIR
        elif args.use_same_gauss_resblock:
            fcm, dsl = C.FCM_RES, C.DSL_PAIR
        elif args.use_gauss_resblock:
            fcm, dsl = C.FCM_RES, C.DSL_NONPAIR
        elif args.use_gauss_attn:
            fcm, dsl = C.FCM_ATTN, C.DSL_NONPAIR
        elif args.use_ffl_with_fcm:
            fcm, dsl = C.FCM_CONV, C.DSL_NONE
        else:
            fcm, dsl = C.FCM_NONE, C.DSL_NONE
        model_cfg = C.VQGANConfig(
            codec=C.codec_for_downsample_factor(
                args.downsample_factor, resolution=args.resolution,
                z_channels=args.embed_dim, double_z=args.double_z,
                num_groups=args.num_groups),
            quantizer=C.QuantizerConfig(
                codebook_size=args.codebook_size, dim=args.embed_dim,
                codebook_dim=args.codebook_dim,
                use_cosine_sim=args.use_cosine_sim,
                commitment_weight=args.codebook_weight,
                kmeans_init=args.kmeans_init, kmeans_iters=args.kmeans_iters,
                threshold_ema_dead_code=args.threshold_ema_dead_code,
                orthogonal_reg_weight=args.orthogonal_reg_weight,
                orthogonal_reg_max_codes=args.orthogonal_reg_max_codes,
                orthogonal_reg_active_codes_only=args.orthogonal_reg_active_codes_only),
            discriminator=C.DiscriminatorConfig(
                kind="patch" if args.use_patch_discriminator else "conv",
                num_layers=args.disc_n_layers, use_actnorm=args.use_actnorm),
            fcm_kind=fcm, dsl_mode=dsl, compute_dtype=args.compute_dtype)
        loss_cfg = C.LossConfig(
            perceptual_weight=args.perceptual_weight,
            disc_weight=args.disc_weight,
            codebook_weight=args.codebook_weight,
            ffl_weight=args.ffl_weight,
            dsl_weight=args.DSL_weight_features,
            sl_weight=args.SL_weight,
            gaussian_kernel=args.gaussian_kernel,
            gaussian_sigma=args.gaussian_sigma,
            dsl_init_sigma=args.dsl_init_sigma,
            disc_start_epochs=(1 if args.disc_start_epochs is None
                               else args.disc_start_epochs),
            ffl_start_epochs=(0 if args.ffl_start_epochs is None
                              else args.ffl_start_epochs),
            # spectra follow the codec compute dtype (bf16 by default on TPU)
            spectral_dtype=args.compute_dtype)

    train_cfg = C.TrainConfig(
        batch_size=args.batch_size, base_lr=args.base_lr, epochs=args.epochs,
        save_every_epoch=args.save_every_epoch, print_steps=args.print_steps,
        img_steps=args.img_steps, adam_mu_dtype=args.adam_mu_dtype)
    return model_cfg, loss_cfg, train_cfg


def main(argv=None):
    args = build_parser().parse_args(argv)
    from favae_tpu.utils.xla_cache import enable_persistent_cache
    from favae_tpu.parallel.mesh import maybe_initialize_distributed
    enable_persistent_cache()
    maybe_initialize_distributed()
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    model_cfg, loss_cfg, train_cfg = config_from_args(args)

    save_path = os.path.join("output", args.ds)
    os.makedirs(save_path, exist_ok=True)
    with open(os.path.join(save_path, "train_cfg.json"), "w") as f:
        json.dump({
            "model": dataclasses.asdict(model_cfg),
            "loss": dataclasses.asdict(loss_cfg),
            "train": dataclasses.asdict(train_cfg),
        }, f, indent=2, default=str)

    from favae_tpu.data.pipeline import DataLoader, PklImageDataset, SyntheticDataset
    from favae_tpu.train.favae_trainer import FavaeTrainer
    from favae_tpu.utils.logging import print0

    res = model_cfg.codec.resolution
    global_batch = train_cfg.batch_size * jax.device_count()
    # each host loads only its shard of the global batch; shard_batch()
    # assembles the global array from the per-process pieces
    host_batch = global_batch // jax.process_count()
    if args.synthetic_data or args.train_file is None:
        train_ds = SyntheticDataset(resolution=res, size=64 * global_batch)
        val_ds = SyntheticDataset(resolution=res, size=4 * global_batch, seed=7)
    else:
        dtype = "uint8" if args.loader_uint8 else "float32"
        train_ds = PklImageDataset(args.train_file, resolution=res,
                                   output_dtype=dtype)
        val_ds = (PklImageDataset(args.test_file, resolution=res,
                                  output_dtype=dtype)
                  if args.test_file else None)

    train_dl = DataLoader(train_ds, batch_size=host_batch,
                          num_workers=args.num_workers,
                          use_processes=args.loader_processes,
                          shard_index=jax.process_index(),
                          shard_count=jax.process_count())
    val_dl = (DataLoader(val_ds, batch_size=host_batch, shuffle=False,
                         num_workers=args.num_workers,
                         use_processes=args.loader_processes,
                         shard_index=jax.process_index(),
                         shard_count=jax.process_count())
              if val_ds else None)

    lpips_params = None
    if args.lpips_ckpt:
        from favae_tpu.utils.torch_convert import convert_lpips
        lpips_params = convert_lpips(args.lpips_ckpt)

    trainer = FavaeTrainer(model_cfg, loss_cfg, train_cfg, save_path,
                           lpips_params=lpips_params,
                           log_dir=os.path.join(save_path, "runs"))
    if args.resume or args.resume_path:
        trainer.resume(args.resume_path)
    print0(f"devices={jax.device_count()} lr={trainer.lr:.3e} "
           f"global_batch={global_batch}")
    trainer.fit(train_dl, val_dl)


if __name__ == "__main__":
    main()
