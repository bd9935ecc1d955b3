#!/bin/bash
# Round-5 flagship fine-tune: warm-start from the r4 checkpoint and
# train ~3x longer with a rotation-heavier MultiPlane curriculum
# (VERDICT r4 "what's weak" #5: 8.7k steps, noisy val, 17.8% rel-ATE
# outlier on a rotation-y held-out scene).
#
#   - warm start weights/vonet_synth.npz (structure_only 0: poses free
#     from step 0, the BA unroll is already stable at this init)
#   - flow_r floor raised 0.5 -> 1.5 px/frame and ceiling 6 -> 9 so
#     every clip has real rotation (the r4 run's ro loss term sat at 0
#     for the first ~3k steps: pure-translation clips dominated)
#   - lower peak LR (fine-tune) on a fresh OneCycle over 12k steps
#
# Promote with:
#   python apps/eval_synthetic.py --network checkpoints/synth_r5_best.npz \
#       --scenes 8 --trials 3
set -e
cd "$(dirname "$0")/.."
nohup python -u apps/train.py --name synth_r5 --dataset synthetic \
  --ht 176 --wd 240 --n_frames 15 --unroll 18 --batch 1 \
  --steps 12000 --lr 4e-5 \
  --opts MIXED_PRECISION False \
  --flow_t 6,28 --flow_r 1.5,9 \
  --init_npz weights/vonet_synth.npz --structure_only 0 \
  --init_encoders /root/reference/onnx_models --freeze_encoders \
  --reservoir 64 --val_every 250 --npz_every 1000 --ckpt_every 4000 \
  > /tmp/train_r5.log 2>&1 &
echo "train pid $!"
