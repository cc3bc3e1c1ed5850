#!/usr/bin/env bash
# CI runner (the reference's ci/run.sh analog): full test suite on the
# virtual CPU mesh, multi-chip dryrun, and an end-to-end cli smoke test.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "=== unit + integration tests (8-device CPU mesh) ==="
python -m pytest tests/ -q

echo "=== multi-chip dryrun (8 virtual devices) ==="
XLA_FLAGS="--xla_force_host_platform_device_count=8" python - <<'EOF'
import jax
jax.config.update("jax_platforms", "cpu")
import __graft_entry__ as g
g.dryrun_multichip(8)
fn, args = g.entry()
out = jax.jit(fn)(*args)
print("entry + dryrun OK", out[0].shape)
EOF

echo "=== cli smoke ==="
python - <<'EOF'
import jax
jax.config.update("jax_platforms", "cpu")
import tempfile, subprocess, sys, os
from tpullama.models.testing import make_tiny_llama_gguf
path = tempfile.mktemp(suffix=".gguf")
make_tiny_llama_gguf(path)
from tpullama.tools.cli import main
rc = main(["-m", path, "-p", "Hello", "-n", "8", "--temp", "0",
           "--dtype", "float32"])
assert rc == 0
print("cli smoke OK")
EOF

echo "ALL CI PASSED"
