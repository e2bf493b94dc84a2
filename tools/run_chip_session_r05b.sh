#!/bin/bash
# Sequential r5 chip session, part B (topup already done & committed).
# One TPU process at a time; each tool exits before the next starts.
# Priority order: wrANS decode check (VERDICT #2) -> ISP roofline (#3)
# -> WMSA gate probe (#5) -> TCM timing (#7) -> codec stage profile (#4).
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
L=artifacts/chip_session_r05
mkdir -p $L
echo "=== wrans check ==="
timeout 3300 python -u tools/chip_wrans_check.py 1024 \
  > $L/wrans.log 2>&1
echo "=== isp roofline ==="
timeout 2700 python -u tools/chip_isp_roofline_r05.py \
  > $L/isp.log 2>&1
echo "=== wmsa gate probe ==="
timeout 1800 python -u tools/chip_wmsa_gate_probe.py \
  > $L/gate.log 2>&1
echo "=== tcm timing ==="
timeout 1800 python -u tools/chip_tcm_timing.py \
  > $L/tcm.log 2>&1
echo "=== codec stage profile (fused) ==="
RCN_PROFILE_FUSED=1 timeout 2400 python -u tools/chip_profile_codec_stages.py \
  > $L/stages.log 2>&1
echo "=== done ==="
