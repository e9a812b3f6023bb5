#!/bin/bash
# Round-5 chain 3: GNC solver calibration + quality gate (VERDICT #3).
cd /root/repo
while [ ! -f /root/repo/r5_chain2.done ]; do sleep 30; done
set -x
# noise_bound (kiss_resolution) sweep on the 6 decision cells
for nb in 0.1 0.2 0.3 0.5; do
  python scripts/exp_hard.py --checkpoint-dir snapshot/hard_moments_r4ft2 \
    --cells 0,1,2,9,10,12 --pairs-per-cell 100 \
    --set match.pose_estimator=gnc --set match.kiss_resolution=$nb \
    --out GATE_r05_gnc_nb${nb}.jsonl > GATE_r05_gnc_nb${nb}.log 2>&1
done
# full 17-cell GNC gate at the reference-derived default (0.3)
python scripts/exp_hard.py --checkpoint-dir snapshot/hard_moments_r4ft2 \
  --pairs-per-cell 100 \
  --set match.pose_estimator=gnc \
  --out GATE_r05_gnc.jsonl > GATE_r05_gnc.log 2>&1
echo CHAIN3_DONE > /root/repo/r5_chain3.done
