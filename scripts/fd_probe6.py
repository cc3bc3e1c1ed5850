"""Carry-with-DUS + layer-indexed kernel pattern (vs xs/ys scan)."""
import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
from tpullama.ops.pallas.flash_decode import flash_decode

L, B, Hq, Hkv, D = 32, 1, 32, 8, 128
S = 33024
scale = 1.0/np.sqrt(D)
mask = jnp.zeros((B,1,1,S), jnp.float32)
x0 = jnp.ones((B,1,Hq,D), jnp.bfloat16)
N = 16

def step_tok(carry, i):
    x, kk, vv = carry
    def layer(carry2, lidx):
        x, kk, vv = carry2
        # T=1 fast-path scatter: dynamic_update_slice into the stacked
        # carry (in-place with donation)
        val = x[:, :1, :Hkv].swapaxes(1, 2).astype(kk.dtype)  # (B,Hkv,1,D)
        slot = i % 256
        kk = jax.lax.dynamic_update_slice(kk, val[None], (lidx, 0, 0, slot, 0))
        vv = jax.lax.dynamic_update_slice(vv, val[None], (lidx, 0, 0, slot, 0))
        o = flash_decode(x, kk, vv, mask, scale, layer=lidx)
        return (o, kk, vv), None
    (x, kk, vv), _ = jax.lax.scan(layer, (x, kk, vv),
                                  jnp.arange(L, dtype=jnp.int32), unroll=8)
    return (x, kk, vv), x[0,0,0,0]

def run(kk, vv, x0):
    (x, kk, vv), ys = jax.lax.scan(step_tok, (x0, kk, vv), jnp.arange(N))
    return ys, kk, vv

fn = jax.jit(run, donate_argnums=(0,1))
kk = jnp.zeros((L,B,Hkv,S,D), jnp.bfloat16)
vv = jnp.zeros((L,B,Hkv,S,D), jnp.bfloat16)
t0=time.time(); ys, kk, vv = fn(kk, vv, x0); np.asarray(ys); print("compile:", round(time.time()-t0,1))
for _ in range(2):
    t0=time.time(); ys, kk, vv = fn(kk, vv, x0); np.asarray(ys)
    print(f"{(time.time()-t0)/N*1e3:.1f} ms/tok")
