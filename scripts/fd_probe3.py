"""Attention-only layer scan over a stacked cache (scan xs->ys pattern,
as llama_forward uses) at depth 32k."""
import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
from tpullama.ops.pallas.flash_decode import flash_decode

L, B, Hq, Hkv, D = 32, 1, 32, 8, 128
S = 33024
scale = 1.0/np.sqrt(D)
kv_k = jnp.zeros((L,B,Hkv,S,D), jnp.bfloat16)
kv_v = jnp.zeros((L,B,Hkv,S,D), jnp.bfloat16)
mask = jnp.zeros((B,1,1,S), jnp.float32)

def step_tok(carry, i):
    x, kk, vv = carry
    def layer(xc, xs):
        x, = xc
        k, v = xs
        from tpullama.models.llama import scatter_rows
        k = scatter_rows(k, jnp.zeros((B,1), jnp.int32), x[:, :1, :Hkv])
        v = scatter_rows(v, jnp.zeros((B,1), jnp.int32), x[:, :1, :Hkv])
        q = x  # (B,1,Hq,D)
        o = flash_decode(q, k, v, mask, scale)
        return (o,), (k, v)
    (x,), (kk, vv) = jax.lax.scan(layer, (x,), (kk, vv), unroll=8)
    return (x, kk, vv), x[0,0,0,0]

def run(kk, vv, x0, n):
    (x, kk, vv), ys = jax.lax.scan(step_tok, (x0, kk, vv), jnp.arange(n))
    return ys, kk, vv

fn = jax.jit(run, static_argnums=(3,), donate_argnums=(0,1))
x0 = jnp.ones((B,1,Hq,D), jnp.bfloat16)
N = 16
t0=time.time(); ys, kv_k, kv_v = fn(kv_k, kv_v, x0, N); np.asarray(ys)
print("compile+first:", round(time.time()-t0,1))
for _ in range(2):
    t0=time.time(); ys, kv_k, kv_v = fn(kv_k, kv_v, x0, N); np.asarray(ys)
    print(f"{(time.time()-t0)/N*1e3:.1f} ms/tok (ideal ~{L*0.34:.0f}+?)")
