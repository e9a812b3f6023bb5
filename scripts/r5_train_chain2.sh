#!/bin/bash
# Round-5 chain 2: fair n=100 baseline gate, then the capacity experiment
# (width-2 vs width-1 from-scratch siblings, identical curriculum+steps).
cd /root/repo
while [ ! -f /root/repo/r5_chain1.done ]; do sleep 30; done
set -x
python scripts/exp_hard.py --checkpoint-dir snapshot/hard_moments_r4ft2 \
  --cells 0,1,2,9,10,12 --pairs-per-cell 100 \
  --out GATE_r05_r4ft2_n100.jsonl > GATE_r05_r4ft2_n100.log 2>&1

python scripts/train_synthetic.py --curriculum --steps 40000 --pose-steps 4000 \
  --pool 96 --num-points 4000 --desc-mode moments --desc-width 2.0 \
  --out snapshot/r5_w2_scratch > snapshot/r5_w2_scratch_train.log 2>&1
python scripts/exp_hard.py --checkpoint-dir snapshot/r5_w2_scratch \
  --cells 0,1,2,9,10,12 --pairs-per-cell 100 \
  --out GATE_r05_w2_quick.jsonl > GATE_r05_w2_quick.log 2>&1

python scripts/train_synthetic.py --curriculum --steps 40000 --pose-steps 4000 \
  --pool 96 --num-points 4000 --desc-mode moments --desc-width 1.0 \
  --out snapshot/r5_w1_scratch > snapshot/r5_w1_scratch_train.log 2>&1
python scripts/exp_hard.py --checkpoint-dir snapshot/r5_w1_scratch \
  --cells 0,1,2,9,10,12 --pairs-per-cell 100 \
  --out GATE_r05_w1_quick.jsonl > GATE_r05_w1_quick.log 2>&1
echo CHAIN2_DONE > /root/repo/r5_chain2.done
