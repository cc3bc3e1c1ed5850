"""Probe: flash_decode kernel vs jnp attention at 8B decode shapes on the
real chip. Times a lax.scan of N calls (slope method via two lengths)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
import jax, jax.numpy as jnp, numpy as np
from tpullama.ops.attention import attention
from tpullama.ops.pallas.flash_decode import flash_decode

B, Hq, Hkv, D = 1, 32, 8, 128
S = int(os.environ.get("S", 33024))
rng = np.random.default_rng(0)
q = jnp.asarray(rng.standard_normal((B,1,Hq,D)).astype(np.float32), jnp.bfloat16)
k = jnp.asarray(rng.standard_normal((B,S,Hkv,D)).astype(np.float32), jnp.bfloat16)
v = jnp.asarray(rng.standard_normal((B,S,Hkv,D)).astype(np.float32), jnp.bfloat16)
mask = jnp.zeros((B,1,1,S), jnp.float32)
scale = 1.0/np.sqrt(D)

def loop(fn, n):
    def body(c, _):
        out = fn(q + c, k, v, mask, scale)
        return jnp.mean(out).astype(jnp.bfloat16), out[0,0,0,0]
    def run(c):
        return jax.lax.scan(body, c, jnp.arange(n))[0]
    return jax.jit(run, static_argnums=())

kv_gb = S*Hkv*D*2*2/1e9
for name, fn in [("flash_decode", flash_decode), ("jnp", attention)]:
    f10 = loop(lambda *a: fn(*a), 10)
    f50 = loop(lambda *a: fn(*a), 10 if name=="jnp" and S>20000 else 50)
    n_hi = 10 if name=="jnp" and S>20000 else 50
    np.asarray(f10(jnp.bfloat16(0)))  # compile+run
    t0=time.time(); np.asarray(f10(jnp.bfloat16(1))); t10=time.time()-t0
    if n_hi > 10:
        np.asarray(f50(jnp.bfloat16(0)))
        t0=time.time(); np.asarray(f50(jnp.bfloat16(1))); t50=time.time()-t0
        per = (t50-t10)/(n_hi-10)
    else:
        per = t10/10
    print(f"{name}: {per*1e3:.3f} ms/call  -> {kv_gb/per:.0f} GB/s (KV {kv_gb*1e3:.0f} MB)")
