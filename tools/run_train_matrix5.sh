#!/bin/sh
# Round-3 matrix 5: per-kernel-grad attribution of block1's dw-chain, and
# the pos-layout kernel with chunked-relu VMEM fix.
set -x
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/train_matrix5.log

run() { echo "### $*" >> "$LOG"; timeout 1100 "$@" >> "$LOG" 2>&1; echo "EXIT=$?" >> "$LOG"; }

run python tools/gradprobe.py --ops kgrad --iters 6
run env MDFD_MIDDLE_LAYOUT=pos python tools/netbench.py --iters 8 --upto block11,block12,exit
echo MATRIX5-DONE >> "$LOG"
