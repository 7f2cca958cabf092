#!/bin/sh
# Round-3 matrix 7: last two backward levers — per-block fusion barriers and
# a bigger scoped-VMEM budget for XLA's backward fusions.
set -x
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
LOG=/tmp/train_matrix7.log

run() { echo "### $*" >> "$LOG"; timeout 1100 "$@" >> "$LOG" 2>&1; echo "EXIT=$?" >> "$LOG"; }

run env MDFD_BLOCK_BARRIER=1 python tools/trainbench.py parts --batch 64 --iters 6
run env XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib=65536 python tools/trainbench.py parts --batch 64 --iters 6
run env MDFD_BN_BWD_BF16=1 python tools/trainbench.py parts --batch 64 --iters 6
echo MATRIX7-DONE >> "$LOG"
