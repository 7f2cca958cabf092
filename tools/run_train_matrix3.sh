#!/bin/sh
# Round-3 matrix 3: block1-backward root-cause (ablation + dx/dw split),
# the fixed pos-layout kernel in-situ, and the new BN-custom default
# confirmed end-to-end. Serialized (1-core host).
set -x
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/train_matrix3.log

run() { echo "### $*" >> "$LOG"; timeout 1100 "$@" >> "$LOG" 2>&1; echo "EXIT=$?" >> "$LOG"; }

# 1. block1 structural ablation (full / bneval / nopool / noskip)
run python tools/gradprobe.py --ops block --iters 6
# 2. block1 dx-chain vs dw-chain split
run python tools/gradprobe.py --ops split --iters 6
# 3. pos-layout middle flow, fixed VMEM blocking (pos_chunks=8)
run env MDFD_MIDDLE_LAYOUT=pos python tools/netbench.py --iters 8 --upto block11,block12,exit
# 4. trainbench parts with the new defaults (BN custom VJP on)
run python tools/trainbench.py parts --batch 64 --iters 6
echo MATRIX3-DONE >> "$LOG"
