#!/usr/bin/env bash
# Scripted sf0.1 gate for the heavy dedup / similarity-store family.
#
# The driver's per-round correctness gate runs every query at sf0.01;
# the dedup family's interesting failure modes (hot-gram caps, band-join
# recall, store append drift) only get load-bearing at 10x that, so this
# script re-runs exactly that family at sf0.1 through the SAME
# Verify -> DuckDB-oracle pipeline (no ad-hoc probes). Run once per
# round; record the tail of the output in COVERAGE.md.
#
# Usage: scripts/gate_sf01.sh [sfdir] [outdir]
set -euo pipefail
cd "$(dirname "$0")/.."

SF="${1:-/root/testdata/sf0.1}"
OUT="${2:-target/verify-sf01}"
FAMILY="q33_jaccard_pairs,q33_jaccard_default,q34_minhash_lsh_pairs,q35_simhash,q113_incremental_jaccard,q125_incremental_minhash,q126_incremental_simhash,q127_signature_store,q128_gram_store,q133_store_maintenance"

SPARK_GRAFT_QUERIES="$FAMILY" sbt -batch "runMain graft.Verify $SF $OUT"
python3 scripts/selfcheck.py "$SF" "$OUT"
