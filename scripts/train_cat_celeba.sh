#!/usr/bin/env bash
# CAT on CelebA-HQ (reference launch: cat_scripts/script_cat_celeba.sh:19-26)
set -euo pipefail
python -m favae_tpu.cli.train_cat --ds "${DS:-cat_celeba}" \
    --codebook_size 1024 --embed_dim 256 --enabled_warmup \
    --batch_size "${BATCH_SIZE:-2}" --txt_tok_cond --top_k 500 --top_p 0.95 \
    --clip vit-l-14 --n_cond_embed 768 \
    --use_l2_quantizer --use_cosine_sim --use_same_gauss_resblock --gaussian_kernel 3 \
    --favae_ckpt "${FAVAE_CKPT:?set FAVAE_CKPT (e.g. expe_7_mu9.pt)}" \
    --clip_ckpt "${CLIP_CKPT:?set CLIP_CKPT (OpenAI ViT-L-14.pt)}" \
    --bpe_vocab "${BPE_VOCAB:?set BPE_VOCAB (bpe_simple_vocab_16e6.txt.gz)}" \
    --train_file "${TRAIN_FILE:?set TRAIN_FILE}" \
    --val_file "${VAL_FILE:?set VAL_FILE}" \
    "$@"
