#!/usr/bin/env bash
# CI runner (the reference's ci/run.sh analog): full test suite on the
# virtual CPU mesh, multi-chip dryrun, and an end-to-end cli smoke test.
set -euo pipefail
cd "$(dirname "$0")/.."

# Build the reference oracle binaries (token-exact e2e comparison layer)
# into a durable path if not already present. The reference's own
# tiny-real-model CI pattern (ci/run.sh there) builds the same targets.
REFSRC="${TPULLAMA_REF_SRC:-/root/reference}"
REFBUILD="${TPULLAMA_REF_BUILD:-$(pwd)/.refbuild}"
if [ -d "$REFSRC" ] && [ ! -x "$REFBUILD/bin/llama-cli" ]; then
  echo "=== building reference oracle ($REFBUILD) ==="
  mkdir -p "$REFBUILD"
  cmake -S "$REFSRC" -B "$REFBUILD" -G Ninja -DCMAKE_BUILD_TYPE=Release \
    -DLLAMA_BUILD_TESTS=OFF -DLLAMA_CURL=OFF > "$REFBUILD/cmake.log" 2>&1
  ninja -C "$REFBUILD" llama-cli llama-perplexity llama-tokenize \
    llama-mtmd-cli llama-quantize llama-embedding > "$REFBUILD/build.log" 2>&1
fi
export TPULLAMA_REF_BUILD="$REFBUILD"

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

echo "=== quality gate (fast) ==="
python ci/quality_gate.py --fast

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
