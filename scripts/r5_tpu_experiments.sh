#!/bin/bash
# Round-5 chip-side experiment sequence (run serially; 1-core box rules in
# CLAUDE.md). Produces:
#   /tmp/rehearsal_cardiac_r5a.jsonl  — 1,000-step cardiac_full curve (clean)
#   /tmp/rehearsal_cardiac_r5b.jsonl  — same, SIGTERM@611 + resume
#   /tmp/camus_profile_{base,fused}.log — fused-FPN experiment
#   /tmp/op_profile_camus.json        — per-op HLO profile
#   /tmp/serve_check_cardiac.json     — cardiac serving artifact
set -x
export PYTHONPATH=/root/.axon_site:/root/repo
export JAX_COMPILATION_CACHE_DIR=/root/.jax_tpu_cache
cd /root/repo

# 1a. decisive cardiac_full rehearsal: 25 epochs x 40 steps = 1,000 steps
# (this is the run BENCHMARKS.md records; the original invocation asked for
# 30 epochs and the `timeout 5400` truncated it at 25 — 25 is the artifact)
rm -rf /tmp/rehearsal_cardiac_r5a /tmp/rehearsal_cardiac_r5a.jsonl
timeout 5400 python scripts/train_rehearsal.py --recipe cardiac_full --bf16 \
  --epochs 25 --steps-per-epoch 40 --ckpt /tmp/rehearsal_cardiac_r5a \
  --out /tmp/rehearsal_cardiac_r5a.jsonl

# 1b. SIGTERM/resume rehearsal: same stream, SIGTERM mid-epoch at step 611,
# resume to epoch 18 (=step 720). Rows 1-18 must match run 1a to all printed
# digits (per-step data seeding + floor-to-epoch schedule make the (state,
# data) sequence identical), except the split epoch 16's train-loss mean,
# which averages only the post-resume steps (reporting artifact, r4
# BENCHMARKS). 18 epochs rather than 30: the overlap with 1a is the check —
# steps past 720 would re-prove nothing about resume (1-core box, data-gen
# bound at ~3 s/step).
rm -rf /tmp/rehearsal_cardiac_r5b /tmp/rehearsal_cardiac_r5b.jsonl
timeout 5400 python scripts/train_rehearsal.py --recipe cardiac_full --bf16 \
  --epochs 18 --steps-per-epoch 40 --ckpt /tmp/rehearsal_cardiac_r5b \
  --out /tmp/rehearsal_cardiac_r5b.jsonl --sigterm-at-step 611
timeout 5400 python scripts/train_rehearsal.py --recipe cardiac_full --bf16 \
  --epochs 18 --steps-per-epoch 40 --ckpt /tmp/rehearsal_cardiac_r5b \
  --out /tmp/rehearsal_cardiac_r5b.jsonl

# 2. camus_temporal fused-FPN experiment (VERDICT r4 item 3)
timeout 2400 python scripts/profile_train_step.py --bf16 \
  --recipe camus_temporal > /tmp/camus_profile_base.log 2>&1
timeout 2400 python scripts/profile_train_step.py --bf16 \
  --recipe camus_temporal --fused > /tmp/camus_profile_fused.log 2>&1

# 3. per-op HLO profile (replaces ablation-by-subtraction evidence)
timeout 2400 python scripts/op_profile.py --recipe camus_temporal --bf16 \
  --steps 30 --out /tmp/op_profile_camus.json > /tmp/op_profile_camus.log 2>&1

# 4. cardiac serving artifact (VERDICT r4 stretch item 7)
timeout 2400 python scripts/serve_check.py --recipe cardiac_full \
  --ckpt /tmp/rehearsal_cardiac_r5a --batch 64 --frames 128 \
  > /tmp/serve_check_cardiac.json 2>/tmp/serve_check_cardiac.log

echo "=== r5 TPU experiments complete ==="
