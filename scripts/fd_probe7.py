"""Probe: why does flash-decode stream KV at ~235 GB/s (vs qmm's ~620+)?

Tunnel-safe timing: each variant runs R iterations inside ONE jitted
lax.scan (q perturbed per step so iterations stay sequential), fenced
with np.asarray — block_until_ready does not fence through the axon
tunnel and reports impossible rates.

Variants:
  stream   — minimal pallas kernel, SAME grid/block structure as
             flash_decode (grid (Hkv, S/bs), (1,1,bs,D) blocks), body =
             two dots: pure DMA + MXU floor.
  fd       — flash_decode standalone, one (B,Hkv,S,D) cache.
  fd_stack — flash_decode over a stacked (L,...) cache, scanned with a
             traced layer index (the production decode path).
  xla      — plain jnp attention over the same cache.

Sweeps bs. GB/s = K+V bytes / per-iteration time.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, Hq, Hkv, D = 1, 32, 8, 128
S = int(os.environ.get("S", 32768))
G = Hq // Hkv
scale = 1.0 / np.sqrt(D)
R = int(os.environ.get("R", 64))  # scan steps per dispatch
kv_bytes = 2 * Hkv * S * D * 2  # K+V bf16


def timeit(name, step_fn, *args):
    """step_fn(q, *args) -> (B,1,Hq,D)-ish array; scanned R times with a
    serial dependency through q."""

    def loop(q0, *a):
        def body(q, _):
            o = step_fn(q, *a)
            q2 = (q + o.reshape(q.shape).astype(q.dtype) * 1e-6).astype(q.dtype)
            return q2, ()

        qf, _ = jax.lax.scan(body, q0, None, length=R)
        return qf

    f = jax.jit(loop)
    out = f(*args)
    np.asarray(out)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        out = f(*args)
        np.asarray(out)
        best = min(best, time.time() - t0)
    dt = best / R
    print(f"{name:28s} {dt*1e6:9.1f} us  {kv_bytes/dt/1e9:7.1f} GB/s",
          flush=True)
    return dt


def stream_kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, *, bs):
    sc = pl.program_id(1)

    @pl.when(sc == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0, 0].astype(jnp.bfloat16)
    kh = k_ref[0, 0].astype(jnp.bfloat16)
    vh = v_ref[0, 0].astype(jnp.bfloat16)
    s = jax.lax.dot_general(q, kh, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    acc_ref[...] += jax.lax.dot_general(
        s.astype(jnp.bfloat16), vh, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(sc == pl.num_programs(1) - 1)
    def _():
        o_ref[0, 0] = acc_ref[...].astype(o_ref.dtype)


def make_stream(bs):
    def run(qh, k, v):
        qr = qh.reshape(B, 1, Hq, D).transpose(0, 2, 1, 3).reshape(
            B, Hkv, G, D)
        grid = (Hkv, S // bs)
        out = pl.pallas_call(
            functools.partial(stream_kernel, bs=bs),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, G, D), lambda h, sc: (0, h, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, bs, D), lambda h, sc: (0, h, sc, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, bs, D), lambda h, sc: (0, h, sc, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, 1, G, D), lambda h, sc: (0, h, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, Hkv, G, D), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((G, D), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("arbitrary", "arbitrary"),
            ),
        )(qr, k, v)
        return out.reshape(B, 1, Hq, D)

    return run


def main():
    from tpullama.ops.pallas.flash_decode import flash_decode

    q = jnp.ones((B, 1, Hq, D), jnp.bfloat16)
    k1 = jnp.zeros((B, Hkv, S, D), jnp.bfloat16)
    v1 = jnp.zeros((B, Hkv, S, D), jnp.bfloat16)
    mask = jnp.zeros((B, 1, 1, S), jnp.float32)

    which = os.environ.get("WHICH", "stream,fd,xla,stack")

    if "stream" in which:
        for bs in (512, 1024, 2048, 4096, 8192):
            timeit(f"stream bs={bs}", make_stream(bs), q, k1, v1)

    if "fd" in which:
        for bs in (512, 1024, 2048, 4096, 8192):
            timeit(
                f"fd bs={bs}",
                lambda q, k, v, m, _bs=bs: flash_decode(
                    q, k, v, m, scale, block_s=_bs),
                q, k1, v1, mask)

    if "xla" in which:
        def xla_attn(q, k, v, m):
            qg = q.reshape(B, 1, Hkv, G, D).transpose(0, 2, 3, 1, 4)
            s = jnp.einsum("bhgtd,bhsd->bhgts", qg.astype(jnp.float32),
                           k.astype(jnp.float32)) * scale
            s = s + m[:, :, None]
            p = jax.nn.softmax(s, axis=-1)
            o = jnp.einsum("bhgts,bhsd->bhgtd", p, v.astype(jnp.float32))
            return o.transpose(0, 3, 1, 2, 4).reshape(B, 1, Hq, D)

        timeit("xla attn", xla_attn, q, k1, v1, mask)

    if "stack" in which:
        L = 8
        kL = jnp.zeros((L, B, Hkv, S, D), jnp.bfloat16)
        vL = jnp.zeros((L, B, Hkv, S, D), jnp.bfloat16)

        for bs in (1024, 4096):
            def stack_step(q, kk, vv, m, _bs=bs):
                def body(c, lidx):
                    o = flash_decode(q, kk, vv, m, scale, layer=lidx,
                                     block_s=_bs)
                    return c + o.astype(jnp.float32), ()

                out, _ = jax.lax.scan(
                    body, jnp.zeros((B, 1, Hq, D), jnp.float32),
                    jnp.arange(L))
                return out

            # report per-LAYER rate: divide the printed time by L mentally,
            # or read the GB/s as L-layer aggregate
            dt = timeit(f"fd_stack L={L} bs={bs}", stack_step, q, kL, vL,
                        mask)
            print(f"  -> per-layer {dt/L*1e6:.1f} us  "
                  f"{kv_bytes/(dt/L)/1e9:7.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()
