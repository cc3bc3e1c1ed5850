"""Multi-host proof-of-life: 2 jax.distributed CPU processes (4 virtual
devices each) run the sharded TP forward over one 8-device global mesh
and must produce logits identical to the single-process forward.

The capability analog of the reference's RPC multi-host backend
(ggml/src/ggml-rpc/ggml-rpc.cpp:92-110, docs/backend/RPC.md), realized as
jax.distributed + a global mesh per SURVEY §7.6.
"""

import os
import socket
import subprocess
import sys
import tempfile

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_tp_matches_single():
    from tpullama.models.testing import make_tiny_llama_gguf

    path = tempfile.mktemp(suffix=".gguf")
    make_tiny_llama_gguf(path, n_embd=64, n_layer=2, n_head=8, n_head_kv=8,
                         n_ff=128, tied_output=True)  # vocab (260) need not divide tp=8

    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "_distributed_worker.py")
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port), path],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        lines = [l for l in out.splitlines() if l.startswith("LOGITS ")]
        assert lines, out
        outs.append(lines[0])

    # both processes computed the same sharded logits
    assert outs[0] == outs[1], outs

    # ... and they match the single-process forward
    import jax
    import jax.numpy as jnp

    from tpullama.models import load_model
    from tpullama.models.llama import llama_forward

    m = load_model(path)
    hp = m.hparams
    B, T, S = 1, 4, 16
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(3, 200, size=(B, T)), jnp.int32)
    positions = jnp.tile(jnp.arange(T, dtype=jnp.int32), (B, 1))
    causal = np.where(np.arange(S)[None, :] <= np.arange(T)[:, None], 0.0, -1e30)
    causal[:, T:] = -1e30
    mask = jnp.asarray(np.broadcast_to(causal, (B, 1, T, S)).astype(np.float32))
    kv = jnp.zeros((hp.n_layer, B, hp.n_head_kv, S, hp.n_embd_head_k), jnp.float32)
    logits, _ = jax.jit(
        lambda p, *a: llama_forward(p, hp, *a)
    )(m.params, tokens, positions, kv, kv, positions, mask)
    ref = np.asarray(logits).astype(np.float32)
    want_vals = np.array([float(v) for v in outs[0].split()[2:]], np.float32)
    np.testing.assert_allclose(ref.reshape(-1)[:8], want_vals, rtol=1e-3, atol=1e-3)
