"""Reconstruction evaluation: PSNR / L1 / LPIPS / rFID / codebook usage.

The reference ships the FID backbone (losses/inception.py) but never wires it
into a harness; this CLI is that missing offline evaluator. It loads either a
reference torch checkpoint (via the converter) or a favae_tpu Orbax
checkpoint, reconstructs the eval set, and prints a JSON metrics dict.

    python -m favae_tpu.cli.eval_favae --preset celebahq_expe5 \
        --torch_ckpt expe_5.pt --test_file celeba_test.pkl \
        --inception_ckpt pt_inception-2015-12-05.pt
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np
import jax
import jax.numpy as jnp


def build_parser():
    p = argparse.ArgumentParser(description="Evaluate FA-VAE reconstructions")
    p.add_argument("--preset", type=str, default="celebahq_expe5")
    p.add_argument("--torch_ckpt", type=str, default=None,
                   help="reference-format .pt checkpoint")
    p.add_argument("--orbax_ckpt", type=str, default=None,
                   help="favae_tpu checkpoint dir (latest/best)")
    p.add_argument("--test_file", type=str, default=None)
    p.add_argument("--synthetic_data", action="store_true")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--max_images", type=int, default=None)
    p.add_argument("--resolution", type=int, default=256)
    p.add_argument("--inception_ckpt", type=str, default=None,
                   help="pytorch-fid inception weights for rFID")
    p.add_argument("--lpips_ckpt", type=str, default=None)
    p.add_argument("--num_workers", type=int, default=8)
    p.add_argument("--save_recons", type=str, default=None,
                   help="directory for side-by-side [input | recon] PNGs")
    return p


def psnr(x, y, data_range: float = 2.0):
    """PSNR over [-1, 1] images (range 2)."""
    mse = jnp.mean((x - y) ** 2, axis=(1, 2, 3))
    return 10.0 * jnp.log10(data_range ** 2 / mse)


def main(argv=None):
    args = build_parser().parse_args(argv)
    from favae_tpu.utils.xla_cache import enable_persistent_cache
    enable_persistent_cache()
    from favae_tpu import config as C
    from favae_tpu.data.pipeline import DataLoader, PklImageDataset, SyntheticDataset
    from favae_tpu.models.quantizer import CodebookState, init_codebook_state
    from favae_tpu.models.vqgan import VQGANFCM

    model_cfg = C.PRESETS[args.preset]()
    loss_cfg = {
        "celebahq_expe5": C.celebahq_expe5_losses,
        "ffhq_table1": C.ffhq_table1_losses,
        "imagenet_f16": C.imagenet_f16_losses,
        "imagenet_f4": C.imagenet_f4_losses,
    }[args.preset]()

    model = VQGANFCM(model_cfg, gaussian_kernel=loss_cfg.gaussian_kernel,
                     dsl_init_sigma=loss_cfg.dsl_init_sigma)

    if args.torch_ckpt:
        from favae_tpu.utils.torch_convert import convert_favae
        params, batch_stats, cb_state = convert_favae(args.torch_ckpt, model_cfg)
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        cb_state = CodebookState(
            embed=jnp.asarray(cb_state.embed),
            cluster_size=jnp.asarray(cb_state.cluster_size),
            embed_avg=jnp.asarray(cb_state.embed_avg))
    elif args.orbax_ckpt:
        from favae_tpu.config import TrainConfig
        from favae_tpu.train.favae_state import FavaeTrainState, merge_params
        from favae_tpu.utils.checkpoint import restore_checkpoint
        state, _, _, _ = FavaeTrainState.create(
            model_cfg, loss_cfg, TrainConfig(), jax.random.PRNGKey(0), lr=1e-4,
            image_size=args.resolution)
        state, _ = restore_checkpoint(args.orbax_ckpt, state)
        variables = {"params": merge_params(state.params_g, state.params_d)}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        cb_state = state.cb_state
    else:
        # random init (pipeline smoke only)
        rng = jax.random.PRNGKey(0)
        cb_state = init_codebook_state(model_cfg.quantizer, rng)
        dummy = jnp.zeros((1, args.resolution, args.resolution, 3), jnp.float32)
        variables = model.init({"params": rng, "dropout": rng}, dummy,
                               cb_state, train=False, inference=True)

    inception = inception_vars = None
    if args.inception_ckpt:
        from favae_tpu.models.inception import InceptionV3FID
        from favae_tpu.utils.torch_convert import convert_inception
        inc_params, inc_stats = convert_inception(args.inception_ckpt)
        inception = InceptionV3FID()
        inception_vars = {"params": inc_params, "batch_stats": inc_stats}

    lpips = lpips_params = None
    if args.lpips_ckpt:
        from favae_tpu.models.lpips import LPIPS
        from favae_tpu.utils.torch_convert import convert_lpips
        lpips = LPIPS()
        lpips_params = convert_lpips(args.lpips_ckpt)

    @jax.jit
    def recon_fn(variables, cb_state, x):
        # params threaded as args: baked-in constants overwhelm the remote
        # compile service
        z_q, _, indices, _, _ = model.apply(
            variables, x, cb_state, train=False, inference=True,
            method=VQGANFCM.encode)
        x_recon, _, _ = model.apply(variables, z_q, train=False,
                                    inference=True, method=VQGANFCM.decode)
        out = {"x_recon": x_recon, "indices": indices,
               "psnr": psnr(x, x_recon),
               "l1": jnp.mean(jnp.abs(x - x_recon), axis=(1, 2, 3))}
        return out, x_recon

    @jax.jit
    def aux_fn(inception_vars, lpips_params, x, x_recon):
        out = {}
        if inception is not None:
            out["feat_real"] = inception.apply(inception_vars, x)
            out["feat_fake"] = inception.apply(inception_vars, x_recon)
        if lpips is not None:
            out["lpips"] = lpips.apply({"params": lpips_params}, x, x_recon)
        return out

    if args.synthetic_data or args.test_file is None:
        ds = SyntheticDataset(resolution=args.resolution, size=64)
    else:
        ds = PklImageDataset(args.test_file, resolution=args.resolution)
    loader = DataLoader(ds, batch_size=args.batch_size, shuffle=False,
                        num_workers=args.num_workers)

    if args.save_recons:
        os.makedirs(args.save_recons, exist_ok=True)
    saved = 0

    psnrs, l1s, lpipss = [], [], []
    feats_r, feats_f = [], []
    used = np.zeros(model_cfg.quantizer.codebook_size, bool)
    seen = 0
    for x in loader:
        xj = jnp.asarray(x)
        out, x_recon = recon_fn(variables, cb_state, xj)
        if inception is not None or lpips is not None:
            out = {**out, **aux_fn(inception_vars, lpips_params, xj, x_recon)}
        psnrs.append(np.asarray(out["psnr"]))
        l1s.append(np.asarray(out["l1"]))
        if "lpips" in out:
            lpipss.append(np.asarray(out["lpips"]))
        if "feat_real" in out:
            feats_r.append(np.asarray(out["feat_real"]))
            feats_f.append(np.asarray(out["feat_fake"]))
        used[np.unique(np.asarray(out["indices"]))] = True
        if args.save_recons and saved < 64:
            try:
                from PIL import Image
                xr = np.asarray(out["x_recon"])
                for i in range(x.shape[0]):
                    pair = np.concatenate([np.asarray(x)[i], xr[i]], axis=1)
                    pair = np.clip(pair * 0.5 + 0.5, 0, 1)
                    Image.fromarray((pair * 255).astype(np.uint8)).save(
                        f"{args.save_recons}/recon_{saved:04d}.png")
                    saved += 1
            except ImportError:
                pass
        seen += x.shape[0]
        if args.max_images and seen >= args.max_images:
            break

    metrics = {
        "psnr": float(np.mean(np.concatenate(psnrs))),
        "l1": float(np.mean(np.concatenate(l1s))),
        "codebook_usage": float(used.mean()),
        "images": seen,
    }
    if lpipss:
        metrics["lpips"] = float(np.mean(np.concatenate(lpipss)))
    if feats_r:
        from favae_tpu.models.inception import fid_from_features
        metrics["rfid"] = fid_from_features(np.concatenate(feats_r),
                                            np.concatenate(feats_f))
    print(json.dumps(metrics))
    return metrics


if __name__ == "__main__":
    main()
