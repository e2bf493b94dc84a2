#!/bin/bash
# Sequential r5 chip session (one TPU process at a time; each tool exits
# before the next starts). Run AFTER the ablation sweep finishes.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
L=artifacts/chip_session_r05
mkdir -p $L
echo "=== topup lmbda 0.05 ===" 
timeout 4000 python -u tools/chip_topup.py \
  /root/repo/artifacts/ckpt_sweep_cam_r05/lmbda_0.05 0.05 8000 24000 \
  > $L/topup.log 2>&1
echo "=== wrans check ==="
timeout 3600 python -u tools/chip_wrans_check.py 1024 \
  > $L/wrans.log 2>&1
echo "=== codec stage profile (fused) ==="
RCN_PROFILE_FUSED=1 timeout 3000 python -u tools/chip_profile_codec_stages.py \
  > $L/stages.log 2>&1
echo "=== wmsa gate probe ==="
timeout 1800 python -u tools/chip_wmsa_gate_probe.py \
  > $L/gate.log 2>&1
echo "=== tcm timing ==="
timeout 1800 python -u tools/chip_tcm_timing.py \
  > $L/tcm.log 2>&1
echo "=== isp roofline ==="
timeout 3000 python -u tools/chip_isp_roofline_r05.py \
  > $L/isp.log 2>&1
echo "=== done ==="
