"""Round-4 qmm probe: push packed-Q4_K dequant-matmul past 540 GB/s.

The decode roofline gap (tg@0 0.68 vs the 0.85 gate) is exactly the
packed kernel's effective bandwidth: VPU dequant serializes with DMA +
MXU inside each grid step. Variants attack the VPU op count per weight
and the VPU/MXU overlap:

  v0          — production kernel (ops/pallas/qmm.py), reference
  ab_nounpack — stream packed bytes, dot a dummy bf16 view (isolates DMA)
  ab_noscale  — unpack without the scale mul/repeat (isolates unpack)
  kchunk{2,4} — in-kernel K-chunk loop, python-unrolled: dequant(c+1) is
                independent of dot(c), letting Mosaic's scheduler overlap
                VPU with MXU
  v4_gdot     — group-batched dot: unpack WITHOUT scaling (3.5 VPU
                ops/wt instead of ~6.5), per-group partial dots on the
                MXU ((G,t,32)x(G,tn,32) batched), scale applied to the
                tiny (G,t,tn) partials — moves the scale work from
                O(N*K) VPU ops to O(N*K/32)
  tile sweep  — tn in {256, 512, 1024} for the winners

Run on the real TPU (axon). Uses the slope method + compilation cache
(memory: tpu-benching-recipe).
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _run_once(fn, x0, ws, scan_len, iters=3):
    def loop(x, ws):
        def body(c, _):
            return fn(c, ws), ()

        c, _ = jax.lax.scan(body, x, None, length=scan_len)
        return c

    jl = jax.jit(loop)
    np.asarray(jl(x0, ws))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(jl(x0, ws))
        best = min(best, time.perf_counter() - t0)
    return best


def timed(fn, x0, ws, n_lo=16, n_hi=128, iters=4):
    t_lo = _run_once(fn, x0, ws, n_lo, iters)
    t_hi = _run_once(fn, x0, ws, n_hi, iters)
    return (t_hi - t_lo) / (n_hi - n_lo)


GROUP = 32


def make_kernel(variant, tn, K, T):
    Kg = K // GROUP

    def kernel(x_ref, xg_ref, q4_ref, sc_ref, mn_ref, out_ref):
        if variant == "ab_nounpack":
            # dot against the raw byte plane viewed as bf16-ish — only the
            # DMA + a half-width dot; measures the stream ceiling
            w = q4_ref[...].astype(jnp.bfloat16)
            acc = jax.lax.dot_general(
                x_ref[:, : K // 2], w, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            acc = jnp.concatenate([acc, acc], axis=-1)[:, :tn]
            out_ref[...] = acc
            return
        if variant == "ab_noscale":
            q = q4_ref[...].astype(jnp.int32)
            val = jnp.concatenate([q & 0xF, q >> 4], axis=-1).astype(jnp.bfloat16)
            acc = jax.lax.dot_general(
                x_ref[...], val, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            out_ref[...] = acc
            return
        if variant.startswith("kchunk"):
            nc = int(variant[6:])
            kc = K // nc
            acc = jnp.zeros((T, tn), jnp.float32)
            for c in range(nc):
                qb = q4_ref[:, c * kc // 2 : (c + 1) * kc // 2]
                q = qb.astype(jnp.int32)
                sc = sc_ref[:, c * kc // GROUP : (c + 1) * kc // GROUP]
                val = jnp.concatenate([q & 0xF, q >> 4], axis=-1).astype(jnp.float32)
                w = (val * pltpu.repeat(sc.astype(jnp.float32), GROUP, axis=1)
                     ).astype(jnp.bfloat16)
                # stripe layout: lo nibbles of chunk c unpack to chunk
                # columns [c*kc, c*kc+kc/2), hi to [+kc/2, +kc)
                xc = x_ref[:, c * kc : (c + 1) * kc]
                acc = acc + jax.lax.dot_general(
                    xc.astype(jnp.bfloat16), w, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
            acc = acc - jax.lax.dot_general(
                xg_ref[...], mn_ref[...].astype(jnp.float32),
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
            out_ref[...] = acc
            return
        raise ValueError(variant)

    return kernel


def variant_qmm(variant, x, fields, N, K, tile_n=512):
    T = x.shape[0]
    tn = min(tile_n, N)
    xg = x.reshape(T, K // GROUP, GROUP)
    xgsum = jnp.sum(xg, axis=2)
    xs = xg.swapaxes(1, 2).reshape(T, K).astype(jnp.bfloat16)
    Kg = K // GROUP
    return pl.pallas_call(
        make_kernel(variant, tn, K, T),
        grid=(N // tn,),
        in_specs=[
            pl.BlockSpec((T, K), lambda n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((T, Kg), lambda n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, K // 2), lambda n: (n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, Kg), lambda n: (n, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, Kg), lambda n: (n, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, tn), lambda n: (0, n), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xs, xgsum, fields["q4"], fields["scale"], fields["minv"])


# ---------------------------------------------------------------- v4_gdot


def gdot_kernel(tn, K, T):
    G = K // GROUP  # number of groups

    def kernel(x_ref, xg_ref, q4_ref, sc_ref, mn_ref, out_ref):
        # q4 plane pre-arranged (G, tn, 16): lo/hi stripes inside each 16
        q = q4_ref[...].astype(jnp.int32)  # (G, tn, 16)
        val = jnp.concatenate([q & 0xF, q >> 4], axis=-1).astype(jnp.bfloat16)
        # batched per-group dots on the MXU: (G, T, 32) x (G, tn, 32)
        p = jax.lax.dot_general(
            x_ref[...], val, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # (G, T, tn)
        # scale applied to the partials: O(G*T*tn) instead of O(tn*K)
        p = p * sc_ref[...].astype(jnp.float32)  # sc: (G, 1, tn)
        acc = jnp.sum(p, axis=0)  # (T, tn)
        acc = acc - jax.lax.dot_general(
            xg_ref[...], mn_ref[...].astype(jnp.float32),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        out_ref[...] = acc

    return kernel


def gdot_qmm(x, gfields, N, K, tile_n=512):
    T = x.shape[0]
    tn = min(tile_n, N)
    G = K // GROUP
    xg = x.reshape(T, G, GROUP)
    xgsum = jnp.sum(xg, axis=2)
    xb = xg.swapaxes(0, 1).astype(jnp.bfloat16)  # (G, T, 32)
    return pl.pallas_call(
        gdot_kernel(tn, K, T),
        grid=(N // tn,),
        in_specs=[
            pl.BlockSpec((G, T, GROUP), lambda n: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, G), lambda n: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, tn, GROUP // 2), lambda n: (0, n, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, 1, tn), lambda n: (0, 0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, G), lambda n: (n, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, tn), lambda n: (0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(xb, xgsum, gfields["q4g"], gfields["scaleg"], gfields["minv"])


def main():
    from tpullama.gguf.constants import GGMLType
    from tpullama.ops.pallas.qmm import quantized_matmul

    print("devices:", jax.devices(), flush=True)
    key = jax.random.PRNGKey(0)
    N, K = 11264, 4096  # ffn gate+up shape at 8B-ish K
    T = 1
    k1, k2, k3, k4 = jax.random.split(key, 4)
    q4 = jax.random.randint(k1, (N, K // 2), 0, 255, jnp.int32).astype(jnp.uint8)
    scale = (jax.random.normal(k2, (N, K // GROUP), jnp.float32) * 0.01)
    minv = (jax.random.normal(k3, (N, K // GROUP), jnp.float32) * 0.01)
    fields = {"q4": q4, "scale": scale.astype(jnp.bfloat16),
              "minv": minv.astype(jnp.bfloat16)}
    jax.block_until_ready(fields)
    nbytes = sum(int(np.prod(a.shape)) * a.dtype.itemsize
                 for a in fields.values())
    x0 = jax.random.normal(k4, (T, K), jnp.float32)

    def report(name, t, err=None):
        e = f"  relerr={err:.2e}" if err is not None else ""
        print(f"{name:24s}: {t*1e6:8.1f} us  {nbytes/t/1e9:6.1f} GB/s{e}",
              flush=True)

    def base(x, w):
        y = quantized_matmul(x, w, GGMLType.Q4_K, GROUP, N, K)
        return jnp.sum(y) * 1e-12 + x

    y0 = np.asarray(quantized_matmul(x0, fields, GGMLType.Q4_K, GROUP, N, K))
    report("v0_current", timed(base, x0, fields))

    for variant in ("ab_nounpack", "ab_noscale", "kchunk2", "kchunk4"):
        for tile_n in (512,) if variant.startswith("ab") else (256, 512, 1024):
            def call(x, w, variant=variant, tile_n=tile_n):
                y = variant_qmm(variant, x, w, N, K, tile_n=tile_n)
                return jnp.sum(y) * 1e-12 + x

            try:
                err = None
                if variant.startswith("kchunk"):
                    yv = np.asarray(variant_qmm(variant, x0, fields, N, K,
                                                tile_n=tile_n))
                    err = float(np.abs(yv - y0).max() /
                                max(np.abs(y0).max(), 1e-9))
                t = timed(call, x0, fields)
                report(f"{variant} tn={tile_n}", t, err)
            except Exception as e:
                print(f"{variant} tn={tile_n}: FAIL {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)

    # v4_gdot needs the plane re-arranged (G, tn-padded rows, 16) and
    # scales as (G, 1, N)
    q4_np = np.asarray(q4).reshape(N, K // GROUP, GROUP // 2)
    # stored column j of group g holds element (g*16 + j) lo-nibble pairs?
    # For the PROBE the arrangement only fixes which x element multiplies
    # which nibble — correctness vs a gdot-specific numpy oracle below.
    q4g = jnp.asarray(np.ascontiguousarray(q4_np.transpose(1, 0, 2)))
    scaleg = jnp.asarray(np.ascontiguousarray(
        np.asarray(scale).T.reshape(K // GROUP, 1, N)))
    gfields = {"q4g": q4g, "scaleg": scaleg,
               "minv": fields["minv"]}
    jax.block_until_ready(gfields)

    # numpy oracle for the gdot arrangement
    qn = np.asarray(q4)  # (N, K/2) bytes; group g occupies cols [g*16,(g+1)*16)
    lo = (qn & 0xF).astype(np.float32)
    hi = (qn >> 4).astype(np.float32)
    # gdot element order within group g: [lo(g,0..15), hi(g,0..15)]
    w_g = np.concatenate(
        [lo.reshape(N, -1, 16), hi.reshape(N, -1, 16)], axis=2
    )  # (N, G, 32)
    xg_np = np.asarray(x0).reshape(T, K // GROUP, GROUP)
    y_ref = np.einsum("tgk,ngk,ng->tn", xg_np, w_g, np.asarray(scale))
    y_ref = y_ref - xg_np.sum(2) @ np.asarray(
        fields["minv"].astype(jnp.float32)).T

    for tile_n in (256, 512, 1024):
        def call(x, w, tile_n=tile_n):
            y = gdot_qmm(x, w, N, K, tile_n=tile_n)
            return jnp.sum(y) * 1e-12 + x

        try:
            yv = np.asarray(gdot_qmm(x0, gfields, N, K, tile_n=tile_n))
            err = float(np.abs(yv - y_ref).max() /
                        max(np.abs(y_ref).max(), 1e-9))
            t = timed(call, x0, gfields)
            report(f"v4_gdot tn={tile_n}", t, err)
        except Exception as e:
            print(f"v4_gdot tn={tile_n}: FAIL {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
