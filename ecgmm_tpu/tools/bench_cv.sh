#!/bin/bash
# Fold-parallel CV chip benchmark (BASELINE.md "Fold-parallel CV"):
# nested 5x3 (15 folds) and exhaustive 10x9 (90 pairs) fusion CV on the
# real relayed TPU, sequential vs --fold-parallel, cached-embedding and
# raw-modality modes, hospital cohort scale (n=244), epochs bounded to 8
# on BOTH sides (the comparison is harness overhead, not convergence).
# Emits one timing line per run to stdout.
set -u
cd "$(dirname "$0")/../.."
run() {
  local tag="$1"; shift
  local t0=$(date +%s.%N)
  "$@" > "/tmp/cvbench_${tag}.log" 2>&1
  local rc=$?
  local t1=$(date +%s.%N)
  echo "CVBENCH ${tag} rc=${rc} wall_s=$(awk -v a="$t0" -v b="$t1" 'BEGIN{printf "%.1f", b-a}')"
}
B="python -m ecgmm_tpu.train.cv"
N="--n-synth 244 --epochs 8"
run nested_seq_cached   $B nested --preset fusion $N --cache-embeddings
run nested_par_cached   $B nested --preset fusion $N --cache-embeddings --fold-parallel
run nested_seq_raw      $B nested --preset fusion $N
run nested_par_raw      $B nested --preset fusion $N --fold-parallel
run exh_seq_cached      $B exhaustive --preset fusion $N --k 10 --cache-embeddings
run exh_par_cached      $B exhaustive --preset fusion $N --k 10 --cache-embeddings --fold-parallel
run exh_seq_raw         $B exhaustive --preset fusion $N --k 10
run exh_par_raw         $B exhaustive --preset fusion $N --k 10 --fold-parallel
