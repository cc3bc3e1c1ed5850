"""Probe: full llama_forward decode step at depth 32k — where does time go?
Variants: full fwd (fd on/off), attention-only scan over stacked cache."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
os.environ["TPULLAMA_SCAN_UNROLL"] = "8"
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo/scripts")
from bench_matrix import make_hp, make_decode_fn
from bench import build_params

hp = make_hp("llama8b")
S = int(os.environ.get("S", 33024))
depth = S - 256
params, qm = build_params(hp, jnp.bfloat16, quant="Q4_K")
params = jax.device_put(params)
jax.block_until_ready(jax.tree.leaves(params))
N = 16
fn = make_decode_fn(hp, qm, 1, S, 8, donate=True)
kv_k = jnp.zeros((hp.n_layer,1,S,hp.n_head_kv,128), jnp.bfloat16)
kv_v = jnp.zeros((hp.n_layer,1,S,hp.n_head_kv,128), jnp.bfloat16)
first = jnp.ones((1,1), jnp.int32)
t0=time.time()
toks, kv_k, kv_v = fn(params, kv_k, kv_v, first, jnp.int32(depth), n_steps=N)
np.asarray(toks); print("compile+first:", round(time.time()-t0,1))
for it in range(2):
    t0=time.time()
    toks, kv_k, kv_v = fn(params, kv_k, kv_v, first+1+it, jnp.int32(depth), n_steps=N)
    np.asarray(toks)
    print(f"iter: {(time.time()-t0)/N*1e3:.1f} ms/tok")
