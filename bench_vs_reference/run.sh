#!/bin/bash
# Head-to-head: the reference engine (its built dist bundle, public
# Orchestrator API, in-memory offset-paginated adapter) vs this engine
# on the same extract+transform workload.
# The reference bundle requires axios at load time even for non-HTTP
# adapters; stub it (no network involved anywhere in this bench).
set -e
STUB=$(mktemp -d)/node_modules
mkdir -p "$STUB/axios"
echo '{"name":"axios","version":"0.0.0-stub","main":"index.js"}' > "$STUB/axios/package.json"
echo 'module.exports = {};' > "$STUB/axios/index.js"
cd "$(dirname "$0")"
for n in 600000 1000000; do
  REF_BENCH_ROWS=$n NODE_PATH="$STUB" node reference_bench.js
done
for n in 600000 1000000 20000000; do
  REF_BENCH_ROWS=$n python3 engine_bench.py
done
