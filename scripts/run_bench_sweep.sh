#!/usr/bin/env bash
# Final splat-count scaling sweep: bench.py at 10k/20k/50k (one process
# per point; the relay serializes). Writes JSON lines to stdout.
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="/root/.axon_site:/root/repo"
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_cache
for np in 10000 20000 50000; do
    python bench.py --num-points "$np" 2>/dev/null | grep '^{'
done
