#!/bin/sh
# Regenerate BENCH_sf1.json — the standing sf1 scale-bench artifact
# (VERDICT r11 next #3): the 8 heaviest gate queries + the star
# pipeline at sf1, K=2, so scale regressions are diffable round over
# round instead of re-argued from PLANS prose.
#
# The corpus is the deterministic gen_sf fixture (seed 42 — the same
# one the PLANS #52 sweep used):
#   python tools/gen_sf.py --sf 1 --out .scale/sf1
#
# Usage: sh tools/bench_sf1.sh [sf_dir]   (default .scale/sf1)
set -e
cd "$(dirname "$0")/.."
SF_DIR=${1:-.scale/sf1}
[ -d "$SF_DIR" ] || { echo "missing $SF_DIR — run gen_sf.py first" >&2; exit 1; }
SPARK_GRAFT_SF_DIR="$SF_DIR" \
SPARK_GRAFT_BENCH_K=2 \
SPARK_GRAFT_BENCH_QUERIES=contamination,cosine_topk,dedup_clusters,dim_indicator,minhash_lsh_pairs,quality_filters,token_freq,topk_values \
SPARK_GRAFT_BENCH_OUT=BENCH_sf1.json \
python bench.py 2>/dev/null
