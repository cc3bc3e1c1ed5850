"""Profile one fused-decode invocation (32 steps) of the bench model and
print the top device ops by total duration, from the xplane trace."""

import gzip
import json
import os
import sys
import time
from collections import defaultdict

os.environ.setdefault("TPULLAMA_SCAN_UNROLL", "22")

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from bench import build_params
from tpullama.models.hparams import HParams
from tpullama.models.llama import llama_forward

quant = os.environ.get("BENCH_QUANT") or None
dtype = jnp.bfloat16
hp = HParams(
    arch="llama", n_vocab=32000, n_ctx_train=2048, n_embd=2048, n_layer=22,
    n_ff=5632, n_head=32, n_head_kv=4, n_embd_head_k=64, n_embd_head_v=64,
    n_rot=64, rope_freq_base=10000.0, rope_type=0,
)
if os.environ.get("BENCH_FUSED", "0") == "1":
    hp.ffn_fused_up = True
S = int(os.environ.get("BENCH_CTX", 512))
N_STEPS = int(os.environ.get("BENCH_STEPS", 32))
B = 1
params, quant_meta = build_params(hp, dtype, quant=quant)
kv_k = jnp.zeros((hp.n_layer, B, S, hp.n_head_kv, hp.n_embd_head_k), dtype)
kv_v = jnp.zeros((hp.n_layer, B, S, hp.n_head_kv, hp.n_embd_head_v), dtype)


def decode_loop(params, kv_k, kv_v, first_token, n_past0, n_steps):
    def step(carry, i):
        tok, kv_k, kv_v = carry
        pos = (n_past0 + i)[None, None]
        slots = pos
        kv_pos = jnp.arange(S)
        vis = kv_pos <= (n_past0 + i)
        mask = jnp.where(vis, 0.0, -1e30).astype(jnp.float32)[None, None, None, :]
        logits, (kv_k, kv_v) = llama_forward(
            params, hp, tok[None, None], pos, kv_k, kv_v, slots, mask,
            quant_meta=quant_meta,
        )
        nxt = jnp.argmax(logits[0, -1]).astype(jnp.int32)
        return (nxt, kv_k, kv_v), nxt

    (tok, kv_k, kv_v), toks = jax.lax.scan(
        step, (first_token, kv_k, kv_v), jnp.arange(n_steps)
    )
    return toks, kv_k, kv_v


fn = jax.jit(decode_loop, static_argnames=("n_steps",))
toks, kv_k2, kv_v2 = fn(params, kv_k, kv_v, jnp.int32(1), jnp.int32(0), N_STEPS)
np.asarray(toks)
print("compiled; tracing", flush=True)

jax.profiler.start_trace("/tmp/jaxtrace_decode")
toks, kv_k2, kv_v2 = fn(params, kv_k, kv_v, jnp.int32(2), jnp.int32(N_STEPS), N_STEPS)
np.asarray(toks)
jax.profiler.stop_trace()

# newest trace dir
base = "/tmp/jaxtrace_decode/plugins/profile"
d = sorted(os.listdir(base))[-1]
tj = [f for f in os.listdir(f"{base}/{d}") if f.endswith("trace.json.gz")][0]
with gzip.open(f"{base}/{d}/{tj}") as f:
    trace = json.load(f)

events = trace["traceEvents"]
# find TPU device pids (XLA Ops tracks)
by_name = defaultdict(float)
cnt = defaultdict(int)
total = 0.0
for e in events:
    if e.get("ph") != "X":
        continue
    name = e.get("name", "")
    dur = e.get("dur", 0)  # us
    args = e.get("args", {})
    # device op rows carry 'run_id'/hlo info; heuristics: skip python/host
    cat = args.get("device_type", "")
    if "tid" not in e:
        continue
    by_name[name] += dur
    cnt[name] += 1

rows = sorted(by_name.items(), key=lambda kv: -kv[1])
for name, dur in rows[:40]:
    print(f"{dur/1e3:9.2f} ms  x{cnt[name]:5d}  {name[:110]}")
