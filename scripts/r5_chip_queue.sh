#!/bin/bash
# Round-5 chip work queue — strictly serial (one TPU process at a time;
# one CPU core). Logs land in /tmp/r5_chip/, preserved into
# docs/data/r5_chip/. Same row mechanics as r4 (scripts/queue_lib.sh,
# tested in tests/test_chip_queue_logic.py): resumable done-markers,
# pre-row relay probe with re-arm, per-row flock, preserve-on-exit.
#
# r5 difference that matters: every bench row now runs the FIXED bench —
# host-fetch sync (block_until_ready does not block through the relay; r4
# postmortem) + >100%-MFU quarantine gates (favae_tpu/utils/benchgate.py)
# — so a row can no longer burn the relay window producing invalid numbers
# (ADVICE r4 medium #3).
export PYTHONPATH=/root/repo:/root/.axon_site
# rows already serialize via the per-row flock in run(); the in-process lock
# in bench.py would deadlock against the flock its own parent holds
export FAVAE_SKIP_CHIP_LOCK=1
export QUEUE_LOG_DIR=${QUEUE_LOG_DIR:-/tmp/r5_chip}
export QUEUE_DATA_SUBDIR=docs/data/r5_chip
cd /root/repo
source scripts/queue_lib.sh
trap preserve EXIT

# Row order = evidence value per relay-minute (VERDICT r4 #2): canonical
# bench first (re-captures the truthful number; done manually at round start
# if the builder session already ran it), then the three never-driven
# presets, the CAT MFU grid, long-horizon + real-vocab drives, decision
# rows, sampler refreshes.

# 1. canonical bench (expe5, synthetic + loader-fed) — the /verify drive
run bench_expe5 timeout 2400 python bench.py

# 2. undriven presets (VERDICT r3 #1 / r4 #2). f16 first (Pallas VQ at K=16384).
run bench_imagenet_f16 env FAVAE_BENCH_PRESET=imagenet_f16 FAVAE_BENCH_MODE=synthetic timeout 2400 python bench.py
run bench_ffhq_table1 env FAVAE_BENCH_PRESET=ffhq_table1 FAVAE_BENCH_MODE=synthetic timeout 2400 python bench.py
run bench_imagenet_f4 env FAVAE_BENCH_PRESET=imagenet_f4 FAVAE_BENCH_MODE=synthetic FAVAE_BENCH_BATCH=8 timeout 3000 python bench.py
preserve

# 3. CAT bench rows (VERDICT r4 #5 + #7): f32 row, bf16 row, bf16 B=24
# (B=24 pushes the rel-pos one-hot past the 128 MB budget -> exercises the
# chunked _gather_bias_mxu branch at production shape)
run cat_b16_f32 env FAVAE_BENCH_MODE=cat B=16 REMAT=dots_nb UNROLL=24 MU_DTYPE=float32 timeout 2400 python bench.py
run cat_b16_bf16 env FAVAE_BENCH_MODE=cat B=16 REMAT=dots_nb UNROLL=24 MU_DTYPE=bfloat16 timeout 2400 python bench.py
run cat_b24_bf16 env FAVAE_BENCH_MODE=cat B=24 REMAT=dots_nb UNROLL=24 MU_DTYPE=bfloat16 timeout 2400 python bench.py

echo "QUEUE PHASE 1 DONE $(date +%H:%M:%S)" | tee -a $L/queue.log
preserve

# 4. long-horizon stability drive (VERDICT r4 #3): 1.5k steps loader-fed
run long_horizon env STEPS=1500 BATCH=16 timeout 3600 python scripts/long_horizon_drive.py
preserve

# 5. real-vocab CAT end-to-end (VERDICT r4 #4): train on captioned corpus
# with the reference BPE vocab, then generate from the checkpoint
run cat_realvocab timeout 3600 python -m favae_tpu.cli.train_cat \
  --ds r5_realvocab \
  --train_file /root/.cache/favae_cat_corpus/train_w_cap.pkl \
  --val_file /root/.cache/favae_cat_corpus/val_w_cap.pkl \
  --bpe_vocab /root/reference/CLIP/clip/bpe_simple_vocab_16e6.txt.gz \
  --use_gauss_resblock --use_cosine_sim --use_l2_quantizer \
  --txt_tok_cond --batch_size 8 --epochs 12 --num_workers 4 \
  --save_every_epoch 100 --print_steps 8 --img_steps 200
# 5b. generate from the just-trained real-vocab checkpoint
run cat_realvocab_generate timeout 1800 python -m favae_tpu.cli.generate \
  --ckpt output/cat/r5_realvocab/latest \
  --bpe_vocab /root/reference/CLIP/clip/bpe_simple_vocab_16e6.txt.gz \
  --prompt "a smiling young woman with long brown hair" \
  --prompt "a man wearing glasses" \
  --n 2 --out $L/realvocab_samples.npz
preserve

# 6. bf16 Adam-mu convergence validation, 500 steps x2 (VERDICT r4 #5)
run validate_mu timeout 3600 env STEPS=500 B=16 python scripts/validate_mu_dtype.py

# 7. decision rows (VERDICT r4 #5 fold_ln A/B; #7 chunked gather at B=24).
# cat_b24 with REMAT=full: the only policy that fits B>=24 on a 16G chip
# (dots_nb OOM'd deterministically at compile, 17.54G > 15.75G — r3 + r5
# row cat_b24_bf16). B=24 pushes the rel-pos one-hot past the 128 MB
# budget -> first production-shape run of the chunked _gather_bias_mxu.
run cat_b16_bf16_fold env FAVAE_BENCH_MODE=cat B=16 REMAT=dots_nb UNROLL=24 MU_DTYPE=bfloat16 FOLD_LN=1 timeout 2400 python bench.py
run cat_b24_full env FAVAE_BENCH_MODE=cat B=24 REMAT=full UNROLL=24 MU_DTYPE=bfloat16 timeout 2400 python bench.py
preserve

# 8. opt-in knob rows (stage-1 reuse, FA-VAE bf16 mu)
run bench_expe5_fast env FAVAE_BENCH_FAST_STAGE1=1 FAVAE_BENCH_MODE=synthetic timeout 2400 python bench.py
run bench_expe5_mu env FAVAE_BENCH_MU_DTYPE=bfloat16 FAVAE_BENCH_MODE=synthetic timeout 2400 python bench.py

# 9. serving sampler refresh (bf16 + int8 engine rows)
run cat_sampling_b4 env B=4 timeout 1800 python scripts/bench_cat_sampling.py
run cat_sampling_b16 env B=16 timeout 1800 python scripts/bench_cat_sampling.py

echo "QUEUE ALL DONE $(date +%H:%M:%S)" | tee -a $L/queue.log
preserve
