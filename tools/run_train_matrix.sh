#!/bin/sh
# Round-3 training-perf measurement matrix (real TPU). Run when the relay is
# healthy; each line appends to /tmp/train_matrix.log. Serialized on purpose
# (1-core host: parallel compiles starve each other).
set -x
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/train_matrix.log

run() { echo "### $*" >> "$LOG"; timeout 580 "$@" >> "$LOG" 2>&1; echo "EXIT=$?" >> "$LOG"; }

# 1. BN-train backward isolation: grad with eval-mode BN
run python tools/trainbench.py parts --batch 64 --iters 6 --bn_eval
# 2. custom-VJP BN
run env MDFD_BN_CUSTOM=1 python tools/trainbench.py parts --batch 64 --iters 6
# 3. per-block remat
run python tools/trainbench.py parts --batch 64 --iters 6 --remat
# 4. batch scaling of the full step
run python tools/trainbench.py step --batches 128,256 --iters 6
# 5. serving pos-layout middle flow, in-situ
run env MDFD_MIDDLE_LAYOUT=pos python tools/netbench.py --iters 8 --upto block11,block12,exit
run python tools/netbench.py --iters 8 --upto block11,block12,exit
# 6. re-publish the in-situ stage budget with the fixed (chained) perturbation
run python tools/netbench.py --iters 8
echo MATRIX-DONE >> "$LOG"
