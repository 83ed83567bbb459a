#!/usr/bin/env bash
# Run the unit test suite on local CPU (8 virtual devices).
# PALLAS_AXON_POOL_IPS= disables the axon TPU plugin registration in
# sitecustomize, which otherwise hangs interpreter start sporadically.
set -e
cd "$(dirname "$0")/.."
exec env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python -m pytest tests/ -q -p no:cacheprovider "$@"
