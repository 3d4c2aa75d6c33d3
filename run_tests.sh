#!/bin/bash
# CPU test runner. PALLAS_AXON_POOL_IPS= skips the TPU-tunnel PJRT
# registration in sitecustomize (which otherwise blocks interpreter startup
# on network for minutes); tests force JAX_PLATFORMS=cpu anyway (conftest,
# which also fails fast if jax was already initialized on hardware).
# Runs 4 pytest-xdist workers when available: 152 tests in ~8.5 min vs
# ~20 min serial (compile-dominated; workers compile independently).
cd "$(dirname "$0")"
if [ $# -eq 0 ]; then set -- tests/ -x -q; fi
workers=()
if ! printf '%s\n' "$@" | grep -q '^-n' && \
   PALLAS_AXON_POOL_IPS= python -c "import xdist" 2>/dev/null; then
  workers=(-n 4)
fi
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  exec python -m pytest "${workers[@]}" "$@"
