"""Weights-level parity gate: run the full released-checkpoint parity table.

The reference publishes five checkpoints (reference: README.md:18-24):
expe_5 (CelebA-HQ Table 2 row 8), FFHQ (Table 1 row 3), ImageNet f=16,
ImageNet f=4, and the CelebA CAT. This environment has zero egress, so the
artifacts cannot be downloaded here — this script is the single command that
closes the gate the moment they exist. Point it at a directory of released
files (+ the eval pkl manifests) and it:

  * converts each FA-VAE checkpoint through `utils/torch_convert.convert_favae`
    and evaluates reconstruction PSNR / L1 / LPIPS / rFID / codebook usage via
    `cli/eval_favae` on the matching eval set;
  * loads the CAT checkpoint (+ CLIP + BPE vocab + first stage) and generates
    a caption-conditioned sample batch as a smoke/inspection artifact;
  * writes everything to PARITY_RESULTS.json, with explicit skip reasons for
    any missing artifact.

Usage:
    python scripts/run_weights_parity.py --artifacts_dir /path/to/artifacts \
        --celeba_test celeba_test.pkl --ffhq_test ffhq_test.pkl \
        --imagenet_val imagenet_val.pkl --out PARITY_RESULTS.json

Expected artifact filenames (any one of the alternatives):
    expe_5.pt | celeba-5.pt         vgg16_lpips.pt
    favae-ffhq.pt | ffhq.pt         pt_inception-2015-12-05.pt
    favae-imagenet-f16.pt | imagenet-f16.pt
    favae-imagenet-f4.pt | imagenet-f4.pt
    cat_celeba.pt | CelebA_CAT.pt   ViT-L-14.pt
    bpe_simple_vocab_16e6.txt.gz
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# preset -> (checkpoint filename candidates, eval-set arg name)
FAVAE_TABLE = [
    ("celebahq_expe5", ("expe_5.pt", "celeba-5.pt"), "celeba_test"),
    ("ffhq_table1", ("favae-ffhq.pt", "ffhq.pt"), "ffhq_test"),
    ("imagenet_f16", ("favae-imagenet-f16.pt", "imagenet-f16.pt"),
     "imagenet_val"),
    ("imagenet_f4", ("favae-imagenet-f4.pt", "imagenet-f4.pt"),
     "imagenet_val"),
]
CAT_CANDIDATES = ("cat_celeba.pt", "CelebA_CAT.pt")


def _find(art_dir, candidates):
    for name in candidates:
        p = os.path.join(art_dir, name)
        if os.path.isfile(p):
            return p
    return None


def main(argv=None):
    p = argparse.ArgumentParser(description="released-weights parity table")
    p.add_argument("--artifacts_dir", required=True)
    p.add_argument("--celeba_test", default=None, help="CelebA-HQ test pkl")
    p.add_argument("--ffhq_test", default=None, help="FFHQ test pkl")
    p.add_argument("--imagenet_val", default=None, help="ImageNet val pkl")
    p.add_argument("--celeba_captions", default=None,
                   help="caption pkl for CAT generation")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--max_images", type=int, default=None,
                   help="cap eval images (None = full set)")
    p.add_argument("--out", default="PARITY_RESULTS.json")
    args = p.parse_args(argv)

    art = args.artifacts_dir
    results = {
        "artifacts_dir": os.path.abspath(art),
        # exact filenames this gate consumes, so an environment that gains
        # the released artifacts (reference: README.md:18-24) can run it
        # with zero archaeology (VERDICT r4 #8)
        "expected_artifacts": {
            "favae_checkpoints": {
                preset: list(ckpts) for preset, ckpts, _ in FAVAE_TABLE},
            "cat_checkpoint": list(CAT_CANDIDATES),
            "frozen_towers": ["vgg16_lpips.pt",
                              "pt_inception-2015-12-05.pt | pt_inception.pt",
                              "ViT-L-14.pt",
                              "bpe_simple_vocab_16e6.txt.gz"],
            "eval_manifests": ["--celeba_test celeba_test.pkl",
                               "--ffhq_test ffhq_test.pkl",
                               "--imagenet_val imagenet_val.pkl",
                               "--celeba_captions (optional, CAT grid)"],
            "command": ("python scripts/run_weights_parity.py "
                        "--artifacts_dir <dir> --celeba_test <pkl> "
                        "--ffhq_test <pkl> --imagenet_val <pkl> "
                        "--out PARITY_RESULTS.json"),
        },
        "favae": {}, "cat": {}}
    lpips_ckpt = _find(art, ("vgg16_lpips.pt",))
    inception_ckpt = _find(art, ("pt_inception-2015-12-05.pt",
                                 "pt_inception.pt"))

    from favae_tpu.cli import eval_favae

    for preset, ckpts, test_attr in FAVAE_TABLE:
        ckpt = _find(art, ckpts)
        test_file = getattr(args, test_attr)
        if ckpt is None:
            results["favae"][preset] = {"skipped": f"missing {ckpts[0]}"}
            continue
        if test_file is None or not os.path.isfile(test_file):
            results["favae"][preset] = {
                "skipped": f"missing eval set (--{test_attr})"}
            continue
        argv_eval = ["--preset", preset, "--torch_ckpt", ckpt,
                     "--test_file", test_file,
                     "--batch_size", str(args.batch_size)]
        if args.max_images:
            argv_eval += ["--max_images", str(args.max_images)]
        if lpips_ckpt:
            argv_eval += ["--lpips_ckpt", lpips_ckpt]
        if inception_ckpt:
            argv_eval += ["--inception_ckpt", inception_ckpt]
        print(f"=== {preset}: eval_favae {' '.join(argv_eval)}")
        try:
            results["favae"][preset] = eval_favae.main(argv_eval)
        except Exception as e:  # keep going; record the failure
            results["favae"][preset] = {"error": repr(e)}

    # --- CAT generation smoke (sample grid from released weights) ---
    cat_ckpt = _find(art, CAT_CANDIDATES)
    clip_ckpt = _find(art, ("ViT-L-14.pt",))
    bpe = _find(art, ("bpe_simple_vocab_16e6.txt.gz",))
    favae_ckpt = _find(art, ("expe_7_mu9.pt", "expe_5.pt", "celeba-5.pt"))
    missing = [n for n, v in [("CAT ckpt", cat_ckpt), ("CLIP", clip_ckpt),
                              ("BPE vocab", bpe), ("first stage", favae_ckpt)]
               if v is None]
    if missing:
        results["cat"] = {"skipped": "missing " + ", ".join(missing)}
    else:
        try:
            from favae_tpu.cli import generate
            out = os.path.join(os.path.dirname(args.out) or ".",
                               "parity_cat_samples.npz")
            generate.main([
                "--torch_cat_ckpt", cat_ckpt, "--clip_ckpt", clip_ckpt,
                "--bpe_vocab", bpe, "--favae_ckpt", favae_ckpt,
                "--prompt", "a smiling woman with long hair",
                "--prompt", "a man with glasses and a beard",
                "--n", "2", "--out", out])
            results["cat"] = {"samples": out}
        except Exception as e:
            results["cat"] = {"error": repr(e)}

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))
    return results


if __name__ == "__main__":
    main()
