#!/bin/bash
# Round-5 chain 4: inference-time hard-cell levers + device trace.
cd /root/repo
while [ ! -f /root/repo/r5_chain3.done ]; do sleep 30; done
set -x
# (a) keypoint budget sweep on the decision cells
for nf in 2000 2500; do
  python scripts/exp_hard.py --checkpoint-dir snapshot/hard_moments_r4ft2 \
    --cells 0,1,2,9,10,12 --pairs-per-cell 100 \
    --set patch.num_fps=$nf --set patch.num_points_radius_estimate=$nf \
    --out GATE_r05_fps${nf}.jsonl > GATE_r05_fps${nf}.log 2>&1
done
# (b) radius calibrated on the SPARSER cloud: density cells + a control row
python scripts/exp_hard.py --checkpoint-dir snapshot/hard_moments_r4ft2 \
  --cells 3,9,10,11,12,13 --pairs-per-cell 100 \
  --set patch.radius_source=sparser \
  --out GATE_r05_radsparse.jsonl > GATE_r05_radsparse.log 2>&1
python scripts/exp_hard.py --checkpoint-dir snapshot/hard_moments_r4ft2 \
  --cells 3,9,10,11,12,13 --pairs-per-cell 100 \
  --out GATE_r05_raddense_ctl.jsonl > GATE_r05_raddense_ctl.log 2>&1
# (c) inlier_th re-confirmation at n=200 on the decision cells
for th in 0.75 1.0 1.25 1.5 2.0 2.5 3.0; do
  python scripts/exp_hard.py --checkpoint-dir snapshot/hard_moments_r4ft2 \
    --cells 0,1,2,9,10,12 --pairs-per-cell 200 \
    --set match.inlier_th=$th \
    --out GATE_r05_inl${th}_n200.jsonl > GATE_r05_inl${th}_n200.log 2>&1
done
# (d) device trace of the batched serving program
python scripts/exp_trace.py --out TRACE_r5.jsonl > TRACE_r5.log 2>&1
echo CHAIN4_DONE > /root/repo/r5_chain4.done
