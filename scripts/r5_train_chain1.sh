#!/bin/bash
# Round-5 descriptor campaign, chain 1: two targeted fine-tune variants
# from hard_moments_r4ft2, each followed by a quick decision-cell gate.
cd /root/repo
set -x
P1='[{"steps": 3000, "overlap_range": [0.2, 0.6], "noise_range": [0.0, 1.2], "density_choices": [1, 2, 4, 8, 10], "clutter_choices": [0, 0.05, 0.1, 0.2]}, {"steps": 5000, "overlap_range": [0.25, 0.45], "noise_range": [0.3, 1.2], "density_choices": [1, 4, 10], "clutter_choices": [0, 0.1]}]'
python scripts/train_synthetic.py --phases "$P1" --pose-steps 3000 \
  --pool 96 --num-points 4000 --desc-mode moments \
  --init-from snapshot/hard_moments_r4ft2 --lr-scale 0.15 \
  --out snapshot/r5_tailcells > snapshot/r5_tailcells_train.log 2>&1
python scripts/exp_hard.py --checkpoint-dir snapshot/r5_tailcells \
  --cells 0,1,2,9,10,12 --pairs-per-cell 100 \
  --out GATE_r05_tailcells_quick.jsonl > GATE_r05_tailcells_quick.log 2>&1

P2='[{"steps": 4000, "overlap_range": [0.15, 0.7], "noise_range": [0.0, 1.2], "density_choices": [1, 2, 4, 8, 10], "clutter_choices": [0, 0.05, 0.1, 0.2]}, {"steps": 8000, "overlap_range": [0.1, 0.4], "noise_range": [0.0, 1.2], "density_choices": [1, 2, 4, 8, 10], "clutter_choices": [0, 0.05, 0.1, 0.2]}]'
python scripts/train_synthetic.py --phases "$P2" --pose-steps 4000 \
  --pool 96 --num-points 4000 --desc-mode moments \
  --init-from snapshot/hard_moments_r4ft2 --lr-scale 0.3 \
  --out snapshot/r5_longtail > snapshot/r5_longtail_train.log 2>&1
python scripts/exp_hard.py --checkpoint-dir snapshot/r5_longtail \
  --cells 0,1,2,9,10,12 --pairs-per-cell 100 \
  --out GATE_r05_longtail_quick.jsonl > GATE_r05_longtail_quick.log 2>&1
echo CHAIN1_DONE > /root/repo/r5_chain1.done
