#!/bin/sh
# Regenerate the standing scale-bench artifacts (VERDICT r11 next #3,
# r12 next #1): the 8 heaviest gate queries + the star pipeline at a
# scale-fixture dir, so scale regressions are diffable round over
# round instead of re-argued from PLANS prose.
#
# The corpora are deterministic gen_sf fixtures (seed 42 — the same
# one the PLANS #52 sweep used):
#   python tools/gen_sf.py --sf 1  --out .scale/sf1
#   python tools/gen_sf.py --sf 10 --out .scale/sf10
#
# Usage: sh tools/bench_sf1.sh [sf_dir]     (default .scale/sf1)
#   BENCH_OUT=BENCH_sf10.json BENCH_K=1 sh tools/bench_sf1.sh .scale/sf10
#   SPARK_GRAFT_DRIVER_MEM=8g BENCH_OUT=BENCH_sf1_mem.json sh tools/bench_sf1.sh
set -e
cd "$(dirname "$0")/.."
SF_DIR=${1:-.scale/sf1}
[ -d "$SF_DIR" ] || { echo "missing $SF_DIR — run gen_sf.py first" >&2; exit 1; }
SPARK_GRAFT_SF_DIR="$SF_DIR" \
SPARK_GRAFT_BENCH_K="${BENCH_K:-2}" \
SPARK_GRAFT_BENCH_QUERIES=contamination,cosine_topk,dedup_clusters,dim_indicator,minhash_lsh_pairs,quality_filters,token_freq,topk_values \
SPARK_GRAFT_BENCH_OUT="${BENCH_OUT:-BENCH_sf1.json}" \
python bench.py 2>/dev/null
