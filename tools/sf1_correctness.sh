#!/usr/bin/env bash
# Standing sf1 (10x) EXACTNESS sidecar (VERDICT r19 item 1): runs the
# full DuckDB oracle compare at sf1 for a named tranche of catalog
# queries and writes CORRECTNESS_sf1_r{N}.json. The sf0.1 catalog gate
# cannot see scale-dependent defects (decimal precision-adjustment
# rounding, hash-order tie-breaks, overflow onset) — the r19 sidecar's
# first ten queries caught exactly one such silent wrong-answer bug
# (d12's damping product rounding at scale 16).
#
# Usage: tools/sf1_correctness.sh <round> [tranche-csv]
#   round: artifact tag (e.g. 20 -> CORRECTNESS_sf1_r20.json)
#   tranche-csv: query names; default = the r20 tranche below.
#
# Cumulative coverage lives in tools/sf1_covered.json (query -> round
# first proven sf1-exact); the runner merges each passing tranche in.
# Cadence policy: see BASELINE.md "sf1 exactness cadence".
set -euo pipefail
cd "$(dirname "$0")/.."

ROUND="${1:?usage: sf1_correctness.sh <round> [tranche-csv]}"

# r20 tranche: the next 30 by defect-class priority — chained decimal
# arithmetic (TPC-H aggregates, DSIR/drift ppm ratios), hash-order
# tie-breaks (top-k / rank / heavy-hitter queries), and fixed-point
# replays (BPE, Lloyd k-means, sketch quantiles, minhash/simhash/KMV).
TRANCHE_DEFAULT="t34_sketch_quantiles,t36_source_drift,t26_dsir,s2_lsh_ann,s5_lsh_multiprobe,d2_minhash_lsh,d3_simhash,d6_kmv_distinct,q_stats_moments,q1_pricing_summary,q8_market_share,q14_promo_revenue,q17_small_quantity,q11_important_parts,q22_idle_customers,q6_revenue,q9_product_profit,t23_bpe,t27_bpe_encode,d11_semantic_dedup,t15_bigram_lm,t18_lm_score,t20_exact_quantiles,t11_length_quantiles,q_topk_orders,q_window_rank,t7_vocab_topk,t12_heavy_hitters,s1_cosine_topk,p14_source_topk"
TRANCHE="${2:-$TRANCHE_DEFAULT}"

SF1=target/sf1
OUT=target/verify_sf1_r${ROUND}

if [ ! -d "$SF1/documents.parquet" ]; then
  echo "== generating sf1 data (deterministic; reused across rounds) =="
  SPARK_DRIVER_MEM=16g sbt -batch \
    "runMain graft.ScaleDataGen /root/testdata/sf0.1 $SF1 10"
fi

echo "== Verify at sf1 (tranche: $TRANCHE) =="
SPARK_DRIVER_MEM=16g SPARK_GRAFT_CPUS=32 sbt -batch \
  "runMain graft.Verify $SF1 $OUT $TRANCHE"

echo "== DuckDB oracle compare at sf1 =="
python3 tools/check.py "$SF1" "$OUT" --only "$TRANCHE" \
  --json "CORRECTNESS_sf1_r${ROUND}.json" --timing

python3 - "$ROUND" <<'EOF'
import json, sys, os
rnd = sys.argv[1]
res = json.load(open(f"CORRECTNESS_sf1_r{rnd}.json"))
covp = "tools/sf1_covered.json"
cov = json.load(open(covp)) if os.path.exists(covp) else {}
for q, r in res.items():
    if r["hash_match"] and q not in cov:
        cov[q] = int(rnd) if rnd.isdigit() else rnd
with open(covp, "w") as f:
    json.dump(cov, f, indent=1, sort_keys=True)
print(f"cumulative sf1-exact coverage: {len(cov)}/144 "
      f"({sum(1 for r in res.values() if r['hash_match'])}/{len(res)} this tranche)")
EOF
