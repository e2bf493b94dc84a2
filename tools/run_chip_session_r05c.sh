#!/bin/bash
# Sequential r5 chip session, part C: the retried wrANS check (priority 1,
# VERDICT #2), then the wmsa2 r05 re-measure (VERDICT #5). Run after part B's
# remaining legs (gate probe / tcm / stages) or instead of them if time is
# short.
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
L=artifacts/chip_session_r05
mkdir -p $L
echo "=== wrans check (retried) ==="
timeout 3300 python -u tools/chip_wrans_check.py 1024 \
  > $L/wrans2.log 2>&1
echo "=== isp roofline (fixed component init) ==="
timeout 2400 python -u tools/chip_isp_roofline_r05.py \
  > $L/isp2.log 2>&1
echo "=== wmsa2 r05 re-measure WB=32 ==="
WMSA2_OUT=/root/repo/artifacts/wmsa2_chip_check_r05.json WB=32 \
  timeout 1500 python -u tools/chip_check_wmsa2.py \
  > $L/wmsa2_wb32.log 2>&1
echo "=== done ==="
