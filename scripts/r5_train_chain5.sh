#!/bin/bash
# Round-5 chain 5: final measurement wave on the shipped config.
cd /root/repo
while [ ! -f /root/repo/r5_chain4.done ]; do sleep 30; done
set -x
# solver throughput head-to-head (ransac vs gnc vs scale-batched conv)
python scripts/exp_headtohead.py --r5 --full-scales --rounds 6 \
  --out HEADTOHEAD_r5_solver.jsonl > HEADTOHEAD_r5_solver.log 2>&1
# final full 17-cell gate at n=200, shipped config
python scripts/exp_hard.py --checkpoint-dir snapshot/hard_moments_r4ft2 \
  --pairs-per-cell 200 \
  --out GATE_r05_final_n200.jsonl > GATE_r05_final_n200.log 2>&1
# easy gate (12 partial-overlap pairs)
python scripts/exp_quality.py --ckpt snapshot/hard_moments_r4ft2 \
  --desc-mode moments > QUALITY_r05.log 2>&1
# multi-frame SLAM front-end
python scripts/exp_multiframe.py --checkpoint-dir snapshot/hard_moments_r4ft2 \
  --out MULTIFRAME_r05.jsonl > MULTIFRAME_r05.log 2>&1
# final serving bench (also re-warms /tmp/jax_ccache)
python bench.py > BENCH_local_r5.json 2> BENCH_local_r5.log
echo CHAIN5_DONE > /root/repo/r5_chain5.done
