#!/bin/sh
# Round-3 matrix 6: odd-vs-even entry spatial dims (input 262^2 makes block1
# see 128^2 instead of 125^2 -> is the odd-shape conv-backward lowering the
# wall?), and the pos-layout kernel with the raised Mosaic VMEM limit.
set -x
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/train_matrix6.log

run() { echo "### $*" >> "$LOG"; timeout 1100 "$@" >> "$LOG" 2>&1; echo "EXIT=$?" >> "$LOG"; }

run python tools/trainbench.py parts --batch 64 --size 262 --iters 6
run env MDFD_MIDDLE_LAYOUT=pos python tools/netbench.py --iters 8 --upto block11,block12,exit
echo MATRIX6-DONE >> "$LOG"
