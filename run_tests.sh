#!/bin/bash
# CPU test runner. PALLAS_AXON_POOL_IPS= skips the TPU-tunnel PJRT
# registration in sitecustomize (which otherwise blocks interpreter startup
# on network for minutes); tests force JAX_PLATFORMS=cpu anyway (conftest).
cd "$(dirname "$0")"
if [ $# -eq 0 ]; then set -- -x -q; fi
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  exec python -m pytest tests/ "$@"
