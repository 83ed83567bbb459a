#!/usr/bin/env bash
# Run the unit test suite on local CPU with the axon TPU plugin disabled.
#
# The environment's sitecustomize registers the TPU tunnel in EVERY python
# interpreter when PALLAS_AXON_POOL_IPS is set; the tunnel serializes
# processes, so a test run would block on (or block) any concurrent TPU job.
# Clearing the variable keeps tests purely local. conftest.py additionally
# forces JAX_PLATFORMS=cpu and an 8-device virtual mesh.
set -euo pipefail
cd "$(dirname "$0")/.."
exec env PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python -m pytest tests/ -q "$@"
