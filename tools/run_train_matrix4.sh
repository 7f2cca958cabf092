#!/bin/sh
# Round-3 matrix 4: does the pointwise-as-dot backward fix the dw-chain?
# Plus the pos-layout kernel with the bf16-relu + pos_chunks=16 VMEM fix.
set -x
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/train_matrix4.log

run() { echo "### $*" >> "$LOG"; timeout 1100 "$@" >> "$LOG" 2>&1; echo "EXIT=$?" >> "$LOG"; }

# 1. block1 split under pw-dot: dw_only should collapse if the 1x1
#    kernel-grad conv lowering is the cost
run env MDFD_PW_IMPL=dot python tools/gradprobe.py --ops split --iters 6
# 2. net effect at B=64
run env MDFD_PW_IMPL=dot python tools/trainbench.py parts --batch 64 --iters 6
# 3. pos-layout middle flow, VMEM-fixed
run env MDFD_MIDDLE_LAYOUT=pos python tools/netbench.py --iters 8 --upto block11,block12,exit
echo MATRIX4-DONE >> "$LOG"
