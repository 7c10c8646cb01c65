#!/usr/bin/env bash
# FA-VAE CelebA-HQ, Table 2 row 8 (expe_5): FCM(Res) + non-pairwise DSL
# (reference launch: favae_scripts/train_favae_celeba.sh:54-62; no torchrun —
# SPMD uses every local TPU chip automatically)
set -euo pipefail
python -m favae_tpu.cli.train_favae --ds celebahq_expe5 --preset celebahq_expe5 \
    --batch_size "${BATCH_SIZE:-8}" \
    --train_file "${TRAIN_FILE:-pkl_files/celeba_train.pkl}" \
    --test_file "${TEST_FILE:-pkl_files/celeba_test.pkl}" \
    --lpips_ckpt "${LPIPS_CKPT:-vgg16_lpips.pt}" \
    "$@"
