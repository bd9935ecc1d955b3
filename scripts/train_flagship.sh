#!/bin/bash
# Flagship (full-dim) update-operator training on the TPU.
#
# Trains DIM=384/FDIM=128 (config defaults) on the synthetic clip
# stream with the reference-trained encoders imported from ONNX and
# frozen (ref trains everything jointly on TartanAir, train.py:86-117;
# no dataset ships in this container, so the synthetic stream stands
# in and the encoders start from the reference's shipped weights).
#
# Checkpoints land in checkpoints/synth_r2_*.npz every 1000 steps;
# grade them with:
#   python apps/eval_synthetic.py --network checkpoints/synth_r2_XXXX.npz --trials 1
# and promote a passing one to weights/vonet_synth.npz (bench.py and
# the demo pick it up automatically).
set -e
cd "$(dirname "$0")/.."
nohup python -u apps/train.py --name synth_r2 --dataset synthetic \
  --ht 176 --wd 240 --n_frames 15 --unroll 18 --batch 1 \
  --steps 60000 --lr 8e-5 \
  --init_encoders /root/reference/onnx_models --freeze_encoders \
  --reservoir 64 --val_every 500 --npz_every 1000 --ckpt_every 5000 \
  > /tmp/train_flagship.log 2>&1 &
echo "train pid $!"
