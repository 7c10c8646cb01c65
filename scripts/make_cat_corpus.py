"""Build the captioned JPEG corpus for the real-vocab CAT chip drive.

Writes /root/.cache/favae_cat_corpus/{train_w_cap.pkl,val_w_cap.pkl} in the
reference caption-manifest format — a pickled list of [image_path, caption]
pairs (reference: FA-VAE/datasets.py GeneralDataset `data_w_cap` branch) —
plus the JPEGs themselves. Zero-egress environment, so the images are
synthetic but *learnable*: each caption class maps to a deterministic
color/gradient/shape pattern (plus per-image noise), so a caption-conditioned
CAT run can actually reduce CE by using the text, which is what the chip
drive needs to demonstrate (VERDICT r3 #6).

    python scripts/make_cat_corpus.py [--root /root/.cache/favae_cat_corpus]
"""
import argparse
import os
import pickle

import numpy as np
from PIL import Image

COLORS = {
    "red": (210, 60, 50), "green": (60, 190, 80), "blue": (50, 90, 210),
    "gold": (220, 180, 40), "violet": (150, 60, 200), "teal": (40, 170, 170),
}
SHAPES = ["circle", "square", "stripe", "diamond"]
CAPTION = "a portrait photo of a {color} {shape} on a dark background"


def render(color, shape, rng, res=256):
    img = np.zeros((res, res, 3), np.float32)
    # dark vertical gradient background
    img += np.linspace(10, 60, res, dtype=np.float32)[:, None, None]
    c = np.asarray(COLORS[color], np.float32)
    yy, xx = np.mgrid[0:res, 0:res].astype(np.float32)
    cy = res / 2 + rng.uniform(-res / 8, res / 8)
    cx = res / 2 + rng.uniform(-res / 8, res / 8)
    r = res / 4 * rng.uniform(0.8, 1.2)
    if shape == "circle":
        m = ((yy - cy) ** 2 + (xx - cx) ** 2) < r * r
    elif shape == "square":
        m = (np.abs(yy - cy) < r) & (np.abs(xx - cx) < r)
    elif shape == "stripe":
        m = np.abs(yy - cy) < r / 2
    else:  # diamond
        m = (np.abs(yy - cy) + np.abs(xx - cx)) < r * 1.3
    img[m] = c * rng.uniform(0.85, 1.0)
    img += rng.normal(0, 6, img.shape).astype(np.float32)
    return np.clip(img, 0, 255).astype(np.uint8)


def build(root, n_train=256, n_val=32, res=256, seed=0):
    os.makedirs(os.path.join(root, "img"), exist_ok=True)
    rng = np.random.RandomState(seed)
    keys = [(c, s) for c in COLORS for s in SHAPES]
    manifests = {}
    idx = 0
    for split, n in [("train", n_train), ("val", n_val)]:
        entries = []
        for i in range(n):
            color, shape = keys[(idx) % len(keys)]
            idx += 1
            p = os.path.join(root, "img", f"{split}_{i:04d}.jpg")
            Image.fromarray(render(color, shape, rng, res)).save(p, quality=92)
            entries.append([p, CAPTION.format(color=color, shape=shape)])
        mp = os.path.join(root, f"{split}_w_cap.pkl")
        with open(mp, "wb") as f:
            pickle.dump(entries, f)
        manifests[split] = mp
        print(f"{split}: {n} images -> {mp}")
    return manifests


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/root/.cache/favae_cat_corpus")
    ap.add_argument("--n_train", type=int, default=256)
    ap.add_argument("--n_val", type=int, default=32)
    ap.add_argument("--res", type=int, default=256)
    args = ap.parse_args()
    build(args.root, args.n_train, args.n_val, args.res)
