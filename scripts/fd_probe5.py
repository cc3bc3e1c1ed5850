"""Bisect the layer-scan attention cost: which component dominates?"""
import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
import jax, jax.numpy as jnp, numpy as np
from tpullama.ops.pallas.flash_decode import flash_decode
from tpullama.models.llama import scatter_rows

L, B, Hq, Hkv, D = 32, 1, 32, 8, 128
S = 33024
scale = 1.0/np.sqrt(D)
mask = jnp.zeros((B,1,1,S), jnp.float32)
kv_k = jnp.zeros((L,B,Hkv,S,D), jnp.bfloat16)
kv_v = jnp.zeros((L,B,Hkv,S,D), jnp.bfloat16)
x0 = jnp.ones((B,1,Hq,D), jnp.bfloat16)
N = 16

def bench(name, make_fn, donate=(0,1)):
    fn = jax.jit(make_fn, static_argnums=(), donate_argnums=donate)
    kk = jnp.zeros((L,B,Hkv,S,D), jnp.bfloat16)
    vv = jnp.zeros((L,B,Hkv,S,D), jnp.bfloat16)
    t0=time.time(); ys, kk, vv = fn(kk, vv, x0); np.asarray(ys)
    c=time.time()-t0
    t0=time.time(); ys, kk, vv = fn(kk, vv, x0); np.asarray(ys)
    t=(time.time()-t0)/N
    print(f"{name}: {t*1e3:.1f} ms/tok (compile {c:.0f}s)")

variant = os.environ.get("V", "all")

def make(scatter=True, kern=True, ys=True):
    def step_tok(carry, i):
        x, kk, vv = carry
        def layer(xc, xs):
            x, = xc
            k, v = xs
            if scatter:
                k = scatter_rows(k, jnp.zeros((B,1), jnp.int32), x[:, :1, :Hkv])
                v = scatter_rows(v, jnp.zeros((B,1), jnp.int32), x[:, :1, :Hkv])
            if kern:
                o = flash_decode(x, k, v, mask, scale)
            else:
                o = x + k[0,0,0,0].astype(x.dtype)
            if ys:
                return (o,), (k, v)
            return (o,), (None, None)
        if ys:
            (x,), (kk, vv) = jax.lax.scan(layer, (x,), (kk, vv), unroll=8)
        else:
            (x,), _ = jax.lax.scan(layer, (x,), (kk, vv), unroll=8)
        return (x, kk, vv), x[0,0,0,0]
    def run(kk, vv, x0):
        (x, kk, vv), ys_ = jax.lax.scan(step_tok, (x0, kk, vv), jnp.arange(N))
        return ys_, kk, vv
    return run

if variant in ("all", "full"):
    bench("full (scatter+kern+ys)", make(True, True, True))
if variant in ("all", "noscatter"):
    bench("no scatter", make(False, True, True))
if variant in ("all", "nokern"):
    bench("no kernel (scatter+ys only)", make(True, False, True))
if variant in ("all", "noys"):
    bench("no ys (carry caches whole)", make(True, True, False))
