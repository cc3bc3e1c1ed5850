"""Bisect the stacked-cache attention slowdown: single-layer variants."""
import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
from tpullama.ops.pallas.flash_decode import flash_decode

B, Hq, Hkv, D = 1, 32, 8, 128
S = 33024
scale = 1.0/np.sqrt(D)
mask = jnp.zeros((B,1,1,S), jnp.float32)
q0 = jnp.ones((B,1,Hq,D), jnp.bfloat16)

def timeit(name, fn, *args, n=32, donate=()):
    f = jax.jit(fn, donate_argnums=donate)
    out = f(*args); jax.block_until_ready(out); np.asarray(jax.tree.leaves(out)[0][..., :1])
    t0=time.time()
    out = f(*args); np.asarray(jax.tree.leaves(out)[0][..., :1])
    t=time.time()-t0
    print(f"{name}: {t*1e3/n:.2f} ms/call")

# A: bare kernel, n calls chained
k1 = jnp.zeros((B,S,Hkv,D), jnp.bfloat16)
v1 = jnp.zeros((B,S,Hkv,D), jnp.bfloat16)
def a(q, k, v):
    def body(c, _):
        o = flash_decode(c, k, v, mask, scale)
        return o, ()
    o, _ = jax.lax.scan(body, q, jnp.arange(32))
    return o
timeit("A bare kernel x32", a, q0, k1, v1)

# B: + scatter write before kernel (carry the cache)
def b(q, k, v):
    def body(c, _):
        q, k, v = c
        k = k.at[:, 0].set(q[:, 0, :Hkv])
        v = v.at[:, 0].set(q[:, 0, :Hkv])
        o = flash_decode(q, k, v, mask, scale)
        return (o, k, v), ()
    (o, k, v), _ = jax.lax.scan(body, (q, k, v), jnp.arange(32))
    return o, k, v
timeit("B +scatter carry x32", b, q0, k1, v1, donate=(1,2))

# C: stacked cache as scan xs/ys (llama pattern), no scatter
kk = jnp.zeros((32,B,S,Hkv,D), jnp.bfloat16)
vv = jnp.zeros((32,B,S,Hkv,D), jnp.bfloat16)
def c(q, kk, vv):
    def body(c, xs):
        k, v = xs
        o = flash_decode(c, k, v, mask, scale)
        return o, (k, v)
    o, (kk, vv) = jax.lax.scan(body, q, (kk, vv))
    return o, kk, vv
timeit("C stacked xs/ys x32", c, q0, kk, vv, donate=(1,2))
