#!/usr/bin/env bash
# FFHQ / ImageNet presets (reference: favae_scripts/train_favae_other_datasets_public.sh)
#   PRESET=ffhq_table1 | imagenet_f16 | imagenet_f4
set -euo pipefail
PRESET="${PRESET:-ffhq_table1}"
python -m favae_tpu.cli.train_favae --ds "$PRESET" --preset "$PRESET" \
    --batch_size "${BATCH_SIZE:-8}" \
    --train_file "${TRAIN_FILE:?set TRAIN_FILE}" \
    --test_file "${TEST_FILE:?set TEST_FILE}" \
    --lpips_ckpt "${LPIPS_CKPT:-vgg16_lpips.pt}" \
    "$@"
