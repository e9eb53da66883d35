#!/bin/bash
# Round-4 TPU measurement queue — run the moment the tunnel is healthy.
# Each step is independently bounded and logs to /tmp/tpu_r4/; steps are
# ordered by evidence value so a re-wedge mid-session loses the least.
# Two TPU clients contend destructively over the tunnel (verify
# SKILL.md) — steps run strictly sequentially.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/tpu_r4

echo "== probe =="
timeout 120 python tools/tpu_probe.py | tee /tmp/tpu_r4/probe.json || exit 1

echo "== 1. full healthy bench (headline + pad A/B + rooflines) =="
LIGHTCURVER_BENCH_NO_PROBE=1 timeout 2400 python bench.py \
    2>&1 | tee /tmp/tpu_r4/bench.log

echo "== 2. PSF MXU experiments (lowpad + scheduling variants) =="
timeout 900 python tools/exp_psf_mxu.py 2>&1 | tee /tmp/tpu_r4/mxu.log

echo "== 3. starlet backend decision (VERDICT r3 #7) =="
timeout 900 python tools/bench_starlet_tpu.py 2>&1 \
    | tee /tmp/tpu_r4/starlet.log

echo "== 4. rank-M cost on the chip (for the record) =="
timeout 600 python tools/exp_roi_rankm.py 2>&1 | tee /tmp/tpu_r4/rankm.log

echo "== done =="
