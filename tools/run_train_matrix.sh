#!/bin/sh
# Round-3 training-perf measurement matrices (real TPU), parameterized.
#
#   tools/run_train_matrix.sh <N>     # N in 1..7, logs to /tmp/train_matrixN.log
#
# These are the seven recorded experiments behind PERF.md's "training-path
# attribution" section (r3): each ran once, its numbers are in PERF.md, and
# the script is kept runnable so the evidence can be reproduced. Serialized
# on purpose (1-core host: parallel compiles starve each other); run when the
# relay is healthy.
set -x
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site

N="${1:-1}"
LOG="/tmp/train_matrix${N}.log"
[ "$N" = "1" ] && LOG=/tmp/train_matrix.log

run() { echo "### $*" >> "$LOG"; timeout 1100 "$@" >> "$LOG" 2>&1; echo "EXIT=$?" >> "$LOG"; }

case "$N" in
1)
  # Baseline matrix: BN-eval backward isolation, custom BN VJP, remat,
  # batch scaling, pos-layout middle in-situ, full stage budget.
  run python tools/trainbench.py parts --batch 64 --iters 6 --bn_eval
  run env MDFD_BN_CUSTOM=1 python tools/trainbench.py parts --batch 64 --iters 6
  run python tools/trainbench.py parts --batch 64 --iters 6 --remat
  run python tools/trainbench.py step --batches 128,256 --iters 6
  run env MDFD_MIDDLE_LAYOUT=pos python tools/netbench.py --iters 8 --upto block11,block12,exit
  run python tools/netbench.py --iters 8 --upto block11,block12,exit
  run python tools/netbench.py --iters 8
  ;;
2)
  # Follow-ups lost to the netbench dtype bug + B=256 compile timeout, plus
  # the block1-backward optimized-HLO root-cause dump.
  run env MDFD_MIDDLE_LAYOUT=pos python tools/netbench.py --iters 8 --upto block11,block12,exit
  run python tools/netbench.py --iters 8 --upto block11,block12,exit
  run python tools/trainbench.py step --batches 256 --iters 6
  run python tools/dump_grad_hlo.py --batch 64 --full
  run python tools/netbench.py --iters 8
  ;;
3)
  # block1 structural ablation + dx/dw split; BN-custom default end-to-end.
  run python tools/gradprobe.py --ops block --iters 6
  run python tools/gradprobe.py --ops split --iters 6
  run env MDFD_MIDDLE_LAYOUT=pos python tools/netbench.py --iters 8 --upto block11,block12,exit
  run python tools/trainbench.py parts --batch 64 --iters 6
  ;;
4)
  # Pointwise-as-dot backward: does it fix the dw-chain?
  run env MDFD_PW_IMPL=dot python tools/gradprobe.py --ops split --iters 6
  run env MDFD_PW_IMPL=dot python tools/trainbench.py parts --batch 64 --iters 6
  run env MDFD_MIDDLE_LAYOUT=pos python tools/netbench.py --iters 8 --upto block11,block12,exit
  ;;
5)
  # Per-kernel-grad attribution of block1's dw-chain.
  run python tools/gradprobe.py --ops kgrad --iters 6
  run env MDFD_MIDDLE_LAYOUT=pos python tools/netbench.py --iters 8 --upto block11,block12,exit
  ;;
6)
  # Odd-vs-even entry spatial dims (input 262^2 -> block1 sees 128^2).
  run python tools/trainbench.py parts --batch 64 --size 262 --iters 6
  run env MDFD_MIDDLE_LAYOUT=pos python tools/netbench.py --iters 8 --upto block11,block12,exit
  ;;
7)
  # Last two backward levers: per-block fusion barriers, scoped-VMEM budget.
  run env MDFD_BLOCK_BARRIER=1 python tools/trainbench.py parts --batch 64 --iters 6
  run env XLA_FLAGS=--xla_tpu_scoped_vmem_limit_kib=65536 python tools/trainbench.py parts --batch 64 --iters 6
  run env MDFD_BN_BWD_BF16=1 python tools/trainbench.py parts --batch 64 --iters 6
  ;;
*)
  echo "usage: $0 <1..7>" >&2
  exit 2
  ;;
esac
echo "MATRIX${N}-DONE" >> "$LOG"
