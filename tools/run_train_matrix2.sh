#!/bin/sh
# Round-3 follow-up measurement matrix (real TPU): the runs the first matrix
# lost to the netbench dtype bug + the B=256 compile timeout, plus the
# block1-backward HLO root-cause dump. Serialized (1-core host).
set -x
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/train_matrix2.log

run() { echo "### $*" >> "$LOG"; timeout 1100 "$@" >> "$LOG" 2>&1; echo "EXIT=$?" >> "$LOG"; }

# 1. serving pos-layout middle flow, in-situ (VERDICT item 2)
run env MDFD_MIDDLE_LAYOUT=pos python tools/netbench.py --iters 8 --upto block11,block12,exit
run python tools/netbench.py --iters 8 --upto block11,block12,exit
# 2. batch scaling of the full step (B=256 compile needs the longer timeout)
run python tools/trainbench.py step --batches 256 --iters 6
# 3. block1 backward optimized-HLO dump (root-cause evidence)
run python tools/dump_grad_hlo.py --batch 64 --full
# 4. re-publish the full in-situ stage budget (VERDICT item 7)
run python tools/netbench.py --iters 8
echo MATRIX2-DONE >> "$LOG"
