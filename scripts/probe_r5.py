"""Round-5 perf probes on the real TPU.

Answers, empirically:
  1. M-scaling: does a (128,K)@(K,N) bf16 dot cost the same as (1,K)@(K,N)?
     (If yes, per-group integer partials are FREE on the MXU: the
     expanded-activation trick X'[(g),k] = x[k]*[g(k)==g] gives exact
     per-group partial sums without batched tiny dots.)
  2. int8 MXU dots: does Mosaic lower (i8, i8) -> i32 dot_general at our
     shapes, and how fast vs bf16?
  3. Unpack cost ladder: pure-VPU unpack rate for q4->bf16 (v0 ops),
     q4->i8 (mask/shift only), mxfp4 LUT, mxfp4 signed-A/r split.
  4. Dense integer-dot end-to-end: unpack-to-i8 + group-partial dot +
     VPU rescale vs the production v0 kernel at llama-8B gate_up decode
     shape (N=28672, K=4096, T=1).
  5. MoE gathered kernel: current (rows 2944, tn=128) vs rows padded to
     3072 with tn in {384, 512, 768, 1024, 3072} and a fused gate|up
     stack (N=6144).

Run:  python scripts/probe_r5.py [probe names...]
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CP = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def timeit(fn, *args, iters=4, scan_len=256):
    """Time fn(*args) repeated scan_len times inside one jit.

    The FIRST arg must be a float array; each iteration perturbs it with
    a tiny function of the previous result so the body is loop-CARRIED
    (XLA hoists loop-invariant bodies entirely — an earlier version of
    this harness measured only the ~1.5 ms dispatch floor)."""

    def make(length):
        def loop(x0, *rest):
            def body(c, _):
                r = fn(c, *rest)
                bump = (r.astype(jnp.float32).ravel()[0] * 1e-30).astype(c.dtype)
                return c + bump, ()

            c, _ = jax.lax.scan(body, x0, None, length=length)
            return jnp.float32(c.ravel()[0])

        return jax.jit(loop)

    # slope method: the tunneled dispatch costs ~30 ms per CALL, so a
    # single timed call cannot resolve sub-ms kernels. Time L and 5L
    # iterations and take the slope — the fixed per-call cost cancels.
    L = scan_len
    jl1, jl5 = make(L), make(5 * L)
    t0 = time.perf_counter()
    np.asarray(jl1(*args))
    np.asarray(jl5(*args))
    compile_s = time.perf_counter() - t0
    b1 = b5 = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(jl1(*args))
        b1 = min(b1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(jl5(*args))
        b5 = min(b5, time.perf_counter() - t0)
    return max(b5 - b1, 1e-9) / (4 * L), compile_s


def emit(name, secs, bytes_moved=None, extra=""):
    gbps = f" {bytes_moved / secs / 1e9:8.1f} GB/s" if bytes_moved else ""
    print(f"[{name:34s}] {secs * 1e6:9.1f} us{gbps} {extra}", flush=True)


# ---------------------------------------------------------------- probe 1
def probe_mscale():
    K, N = 4096, 4096
    w = jnp.asarray(np.random.randn(K, N), jnp.bfloat16)
    for M in (1, 8, 32, 90, 128, 256, 448):
        x = jnp.asarray(np.random.randn(M, K), jnp.bfloat16)
        f = lambda x, w: jnp.dot(x, w, preferred_element_type=jnp.float32)
        s, _ = timeit(f, x, w)
        emit(f"mscale bf16 M={M}", s, K * N * 2)


# ---------------------------------------------------------------- probe 2
def probe_i8dot():
    K, N = 4096, 4096
    wi = jnp.asarray(np.random.randint(-127, 127, (K, N)), jnp.int8)
    for M in (1, 90, 128, 448):
        xi = jnp.asarray(np.random.randint(-127, 127, (M, K)), jnp.bfloat16)
        f = lambda x, w: jax.lax.dot_general(
            x.astype(jnp.int8), w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32)
        try:
            s, _ = timeit(f, xi, wi)
            emit(f"i8dot M={M}", s, K * N)
        except Exception as e:
            print(f"[i8dot M={M}] FAILED: {type(e).__name__}: {str(e)[:120]}")
    # int4-stored operand support
    try:
        wi4 = jnp.asarray(np.random.randint(-7, 7, (K, N)), jnp.int4)
        xi = jnp.asarray(np.random.randint(-7, 7, (128, K)), jnp.bfloat16)

        def f4(x, w):
            return jax.lax.dot_general(
                x.astype(jnp.int8), w.astype(jnp.int8),
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)

        s, _ = timeit(f4, xi, wi4)
        emit("i4(store)->i8 dot M=128", s, K * N // 2)
    except Exception as e:
        print(f"[i4 dot] FAILED: {type(e).__name__}: {str(e)[:120]}")


# ---------------------------------------------------------------- probe 3
def _unpack_kernel(mode, group=32):
    def kernel(sc_ref, q_ref, out_ref):
        q = q_ref[...]
        scbump = sc_ref[:, 0:1].astype(jnp.float32)
        if mode == "v0_bf16":  # current production ladder
            qi = q.astype(jnp.int32)
            val = jnp.concatenate([qi & 0xF, qi >> 4], axis=-1).astype(jnp.float32)
            sh = pltpu.repeat(sc_ref[...].astype(jnp.float32), group, axis=1)
            w = (val * sh).astype(jnp.bfloat16)
            out_ref[...] = jnp.sum(w, axis=1, keepdims=True).astype(jnp.float32)
        elif mode == "q4_to_i8":  # integer path: mask/shift + narrow only
            qi = q.astype(jnp.int32)
            lo = (qi & 0xF).astype(jnp.int8)
            hi = (qi >> 4).astype(jnp.int8)
            w = jnp.concatenate([lo, hi], axis=-1)
            out_ref[...] = jnp.sum(w.astype(jnp.int32), axis=1, keepdims=True
                                   ).astype(jnp.float32) + scbump
        elif mode == "q4_to_i8_noconcat":
            qi = q.astype(jnp.int32)
            lo = (qi & 0xF).astype(jnp.int8)
            hi = (qi >> 4).astype(jnp.int8)
            out_ref[...] = (
                jnp.sum(lo.astype(jnp.int32), axis=1, keepdims=True)
                + jnp.sum(hi.astype(jnp.int32), axis=1, keepdims=True)
            ).astype(jnp.float32) + scbump
        elif mode == "mxfp4_lut":  # current MXFP4 ladder
            LUT = 0xC8643210
            qi = q.astype(jnp.int32)
            idx = jnp.concatenate([qi & 0xF, qi >> 4], axis=-1)
            mag = ((jnp.uint32(LUT) >> ((idx & 7).astype(jnp.uint32) * 4)) & 0xF
                   ).astype(jnp.int32)
            val = jnp.where((idx >> 3) != 0, -mag, mag).astype(jnp.float32)
            sh = pltpu.repeat(sc_ref[...].astype(jnp.float32), group, axis=1)
            w = (val * sh).astype(jnp.bfloat16)
            out_ref[...] = jnp.sum(w, axis=1, keepdims=True).astype(jnp.float32)
        elif mode == "mxfp4_lut_i8":  # LUT to signed i8, no scale
            LUT = 0xC8643210
            qi = q.astype(jnp.int32)
            idx = jnp.concatenate([qi & 0xF, qi >> 4], axis=-1)
            mag = ((jnp.uint32(LUT) >> ((idx & 7).astype(jnp.uint32) * 4)) & 0xF
                   ).astype(jnp.int32)
            s = -(idx >> 3)
            w = ((mag ^ s) - s).astype(jnp.int8)
            out_ref[...] = jnp.sum(w.astype(jnp.int32), axis=1, keepdims=True
                                   ).astype(jnp.float32) + scbump
        elif mode == "mxfp4_Ar_i8":  # A-nibble (v>>1 biased) + r-bit planes
            # emulation: treat q as the A plane; r handled as 1/8-width
            qi = q.astype(jnp.int32)
            lo = (qi & 0xF).astype(jnp.int8)
            hi = (qi >> 4).astype(jnp.int8)
            a = jnp.concatenate([lo, hi], axis=-1)
            out_ref[...] = jnp.sum(a.astype(jnp.int32), axis=1, keepdims=True
                                   ).astype(jnp.float32) + scbump
        elif mode == "mxfp4_lut_shift":  # no multiply, xor-sign, no f32
            LUT = 0xC8643210
            qi = q.astype(jnp.int32)
            idx = jnp.concatenate([qi & 0xF, qi >> 4], axis=-1)
            amt = (idx << 2) & 0x1C
            mag = ((jnp.uint32(LUT) >> amt.astype(jnp.uint32)) & 0xF
                   ).astype(jnp.int32)
            s = -(idx >> 3)
            w = ((mag ^ s) - s).astype(jnp.bfloat16)
            sh = pltpu.repeat(sc_ref[...].astype(jnp.bfloat16), group, axis=1)
            out_ref[...] = jnp.sum(w * sh, axis=1, keepdims=True
                                   ).astype(jnp.float32)
        elif mode == "q4_i16":  # ladder in int16 lanes (2 elem/lane?)
            qi = q.astype(jnp.int16)
            lo = (qi & jnp.int16(0xF)).astype(jnp.bfloat16)
            hi = ((qi >> 4) & jnp.int16(0xF)).astype(jnp.bfloat16)
            w = jnp.concatenate([lo, hi], axis=-1)
            sh = pltpu.repeat(sc_ref[...].astype(jnp.bfloat16), group, axis=1)
            out_ref[...] = jnp.sum(w * sh, axis=1, keepdims=True
                                   ).astype(jnp.float32)
        elif mode == "q4_bf16_noscale":  # group-partial path's ladder:
            # nibble -> bf16, NO scale multiply (applied on (G,tn) partials)
            qi = q.astype(jnp.int32)
            lo = (qi & 0xF).astype(jnp.bfloat16)
            hi = (qi >> 4).astype(jnp.bfloat16)
            w = jnp.concatenate([lo, hi], axis=-1)
            out_ref[...] = jnp.sum(w, axis=1, keepdims=True
                                   ).astype(jnp.float32) + scbump
        else:
            raise ValueError(mode)

    return kernel


def _ar_kernel(group=32):
    """MXFP4 A/r split-plane unpack: A nibble plane holds (v>>1)+8
    (v in [-12,12] -> A in [2,14]), r bit plane holds v&1; v = 2A+r-16.
    Storage 5 bits/weight; no LUT, no variable shift."""

    def kernel(sc_ref, a_ref, r_ref, out_ref):
        qa = a_ref[...].astype(jnp.int32)
        alo = qa & 0xF
        ahi = qa >> 4
        a = jnp.concatenate([alo, ahi], axis=-1)  # (tn, K)
        qr = r_ref[...].astype(jnp.int32)
        rbits = jnp.concatenate(
            [(qr >> j) & 1 for j in range(8)], axis=-1)  # (tn, K)
        v = ((a << 1) + rbits - 16).astype(jnp.bfloat16)
        sh = pltpu.repeat(sc_ref[...].astype(jnp.bfloat16), group, axis=1)
        out_ref[...] = jnp.sum(v * sh, axis=1, keepdims=True
                               ).astype(jnp.float32)

    return kernel


def probe_ar():
    N, K = 2048, 4096
    a = jnp.asarray(np.random.randint(0, 256, (N, K // 2)), jnp.uint8)
    r = jnp.asarray(np.random.randint(0, 256, (N, K // 8)), jnp.uint8)
    sc = jnp.asarray(np.random.randn(N, K // 32) * 0.1, jnp.bfloat16)
    tn = 256
    f = lambda sc, a, r: pl.pallas_call(
        _ar_kernel(),
        grid=(N // tn,),
        in_specs=[
            pl.BlockSpec((tn, K // 32), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, K // 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, K // 8), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tn, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, 1), jnp.float32),
        compiler_params=CP,
    )(sc, a, r)
    try:
        s, _ = timeit(f, sc, a, r)
        emit("unpack mxfp4_Ar_split", s, N * (K * 5 // 8),
             extra=f"({N * K / s / 1e9:.1f} Gelem/s)")
    except Exception as e:
        import traceback
        traceback.print_exc()


def probe_unpack():
    N, K = 2048, 4096
    q = jnp.asarray(np.random.randint(0, 256, (N, K // 2)), jnp.uint8)
    sc = jnp.asarray(np.random.randn(N, K // 32) * 0.1, jnp.bfloat16)
    for mode in ("v0_bf16", "q4_to_i8", "mxfp4_lut",
                 "mxfp4_lut_shift", "q4_i16", "q4_bf16_noscale"):
        kern = _unpack_kernel(mode)
        tn = 256
        f = lambda sc, q: pl.pallas_call(
            kern,
            grid=(N // tn,),
            in_specs=[
                pl.BlockSpec((tn, K // 32), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tn, K // 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tn, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, 1), jnp.float32),
            compiler_params=CP,
        )(sc, q)
        try:
            s, _ = timeit(f, sc, q)
            emit(f"unpack {mode}", s, N * K // 2,
                 extra=f"({N * K / s / 1e9:.1f} Gelem/s)")
        except Exception as e:
            print(f"[unpack {mode}] FAILED: {type(e).__name__}: {str(e)[:160]}")


# ---------------------------------------------------------------- probe 4
def probe_dense_int8(T=1):
    """End-to-end integer-dot group-partial kernel vs production v0 at the
    llama-8B fused gate_up decode shape."""
    N, K, group = 28672, 4096, 32
    G = K // group
    rng = np.random.default_rng(0)
    q4 = jnp.asarray(rng.integers(0, 256, (N, K // 2)), jnp.uint8)
    sc = jnp.asarray(rng.standard_normal((N, G)) * 0.01, jnp.bfloat16)
    mn = jnp.asarray(rng.standard_normal((N, G)) * 0.01, jnp.bfloat16)
    nbytes = N * K // 2 + N * G * 4

    # --- production path baseline
    from tpullama.gguf.constants import GGMLType
    from tpullama.ops.pallas.qmm import quantized_matmul

    x = jnp.asarray(rng.standard_normal((T, K)), jnp.float32)
    f0 = functools.partial(
        quantized_matmul, ggml_type=GGMLType.Q4_K, group=group, n_out=N, n_in=K)
    s, _ = timeit(lambda x: f0(x, {"q4": q4, "scale": sc, "minv": mn}), x)
    emit(f"dense v0 Q4_K T={T}", s, nbytes)

    # --- integer path: X' (G*T, K) i8 built outside (cheap, K elements),
    # kernel: unpack->i8, dot (G,K)@(K,tn) per stripe half, rescale on VPU
    tn = 2048

    def int_kernel(xp_ref, xs_ref, xg_ref, q_ref, sc_ref, mn_ref, out_ref):
        qi = q_ref[...].astype(jnp.int32)
        lo = (qi & 0xF).astype(jnp.int8)  # (tn, K/2) stored stripes
        hi = (qi >> 4).astype(jnp.int8)
        xp = xp_ref[...]  # (G*T, K) int8 expanded activations
        # two half dots: stored lo stripe covers elements [0, K/2)
        acc = jax.lax.dot_general(
            xp[:, : K // 2], lo, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        acc += jax.lax.dot_general(
            xp[:, K // 2:], hi, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        # acc: (G*T, tn) int32 per-group partials; rescale + reduce over G
        accf = acc.astype(jnp.float32) * xs_ref[...]  # act scales (G*T,1)
        # weight scales: sc (tn, G) -> (G, tn)
        y = jax.lax.dot_general(
            accf.reshape(G, T * tn) if T == 1 else accf, sc_ref[...].astype(jnp.float32),
            (((0,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        ) if False else jnp.sum(
            accf.reshape(G, tn) * sc_ref[...].astype(jnp.float32).T, axis=0,
            keepdims=True)
        y = y - jax.lax.dot_general(
            xg_ref[...], mn_ref[...].astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        out_ref[...] = y

    def int_path(x, q4, sc, mn):
        # host-side prep (XLA ops, tiny): permute to stored order, group
        # quantize to i8
        xg = x.reshape(T, G, group)
        xs = jnp.max(jnp.abs(xg), axis=2) / 127.0  # (T, G)
        xi = jnp.round(xg / xs[:, :, None]).astype(jnp.int8)
        xgs = jnp.sum(xg, axis=2)  # (T, G) f32 for min term
        # expanded X': (G, K) — row g holds group g's elements at their
        # stored positions, zero elsewhere. Stored order: p = j*G + g
        # (group-transposed), so row g = scatter of xi[:, g, :]
        xp = jnp.zeros((G, G, group), jnp.int8).at[jnp.arange(G), jnp.arange(G), :].set(
            xi.reshape(G, group)).reshape(G, group * G)
        # stored order is j*G + g: transpose (G_row, j, g) -> need cols p=j*G+g
        # xp above lays cols as (g, j); rebuild properly:
        xp = jnp.swapaxes(xp.reshape(G, G, group), 1, 2).reshape(G, K)
        return pl.pallas_call(
            int_kernel,
            grid=(N // tn,),
            in_specs=[
                pl.BlockSpec((G, K), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((G, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((T, G), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tn, K // 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tn, G), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tn, G), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((T, tn), lambda i: (0, i), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T, N), jnp.float32),
            compiler_params=CP,
        )(xp, (xs.reshape(G, 1) * 1.0), xgs, q4, sc, mn)

    try:
        s, c = timeit(int_path, x, q4, sc, mn)
        emit(f"dense int8 group-partial T={T}", s, nbytes, extra=f"compile {c:.0f}s")
    except Exception as e:
        import traceback
        traceback.print_exc()
        print(f"[dense int8] FAILED: {type(e).__name__}: {str(e)[:200]}")


# ---------------------------------------------------------------- probe 5
def probe_moe_tiles():
    from tpullama.gguf.constants import GGMLType
    from tpullama.ops.pallas.qmm import quantized_matmul_gathered

    rng = np.random.default_rng(0)
    E, K, slots = 32, 2880, 4
    x = jnp.asarray(rng.standard_normal((slots, K)), jnp.float32)
    sel = jnp.asarray([3, 11, 19, 27], jnp.int32)

    def build(rows_p, gpad):
        q = jnp.asarray(rng.integers(0, 256, (E, K // 2, rows_p)), jnp.uint8)
        sc = jnp.asarray(rng.standard_normal((E, gpad, rows_p)) * 0.01, jnp.bfloat16)
        return {"q4_lut": q, "scale": sc}

    nbytes_per = K // 2 * 2880 + 96 * 2880 * 2  # true streamed approx

    for rows_p, tile_n, tag in ((2944, 128, "cur 2944/tn128"),
                                (2944, 2944, "cur 2944/full"),
                                (3072, 384, "pad 3072/tn384"),
                                (3072, 512, "pad 3072/tn512"),
                                (3072, 1024, "pad 3072/tn1024"),
                                (3072, 3072, "pad 3072/full"),
                                (6144, 512, "fused 6144/tn512"),
                                (6144, 768, "fused 6144/tn768"),
                                (6144, 1024, "fused 6144/tn1024")):
        fields = build(rows_p, 96)
        mult = 2 if rows_p == 6144 else 1
        f = functools.partial(
            quantized_matmul_gathered, ggml_type=GGMLType.MXFP4, group=32,
            n_out=rows_p, n_in=K, tile_n=tile_n, planes_t=True)
        try:
            os.environ["TPULLAMA_GMM_TILE_N"] = str(tile_n)
            s, _ = timeit(lambda x: f(x, fields, sel), x)
            emit(f"moe {tag}", s, slots * nbytes_per * mult)
        except Exception as e:
            print(f"[moe {tag}] FAILED: {type(e).__name__}: {str(e)[:160]}")
        finally:
            os.environ.pop("TPULLAMA_GMM_TILE_N", None)


PROBES = {
    "ar": probe_ar,
    "mscale": probe_mscale,
    "i8dot": probe_i8dot,
    "unpack": probe_unpack,
    "dense_int8": probe_dense_int8,
    "moe_tiles": probe_moe_tiles,
}



# ---------------------------------------------------------------- probe 6
def probe_v1():
    """A/B the v0 (f32 ladder) vs v1 (all-bf16) dequant in the production
    kernels at decode shapes."""
    from tpullama.gguf.constants import GGMLType
    from tpullama.ops.pallas import qmm as qmm_mod

    rng = np.random.default_rng(0)
    # dense gate_up + ffn_down shapes (llama-8B)
    for name, N, K in (("gateup", 28672, 4096), ("down", 4096, 14336)):
        q4 = jnp.asarray(rng.integers(0, 256, (N, K // 2)), jnp.uint8)
        sc = jnp.asarray(rng.standard_normal((N, K // 32)) * 0.01, jnp.bfloat16)
        mn = jnp.asarray(rng.standard_normal((N, K // 32)) * 0.01, jnp.bfloat16)
        x = jnp.asarray(rng.standard_normal((1, K)), jnp.float32)
        nbytes = N * K // 2 + N * (K // 32) * 4
        for mode in ("v0", "v1"):
            os.environ["TPULLAMA_QMM_UNPACK"] = mode
            f = functools.partial(
                qmm_mod.quantized_matmul, ggml_type=GGMLType.Q4_K, group=32,
                n_out=N, n_in=K)
            s, _ = timeit(lambda x: f(x, {"q4": q4, "scale": sc, "minv": mn}), x)
            emit(f"dense {name} Q4_K {mode}", s, nbytes)
    os.environ.pop("TPULLAMA_QMM_UNPACK", None)
    # gathered transposed MXFP4 (gpt-oss expert shape); v1 is in-kernel
    # default now — A/B by monkeypatching exactness of the dtype choice
    from tpullama.ops.pallas.qmm import quantized_matmul_gathered

    E, K, slots, rows_p = 32, 2880, 4, 2944
    qf = jnp.asarray(rng.integers(0, 256, (E, K // 2, rows_p)), jnp.uint8)
    scf = jnp.asarray(rng.standard_normal((E, 96, rows_p)) * 0.01, jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((slots, K)), jnp.float32)
    sel = jnp.asarray([3, 11, 19, 27], jnp.int32)
    f = functools.partial(
        quantized_matmul_gathered, ggml_type=GGMLType.MXFP4, group=32,
        n_out=rows_p, n_in=K, planes_t=True)
    s, _ = timeit(lambda x: f(x, {"q4_lut": qf, "scale": scf}, sel), x)
    emit("moe_t MXFP4 v1", s, slots * (K // 2 * 2880 + 96 * 2880 * 2))

PROBES["v1"] = probe_v1  # defined after the dict literal



# ---------------------------------------------------------------- probe 7
def probe_i8unpack():
    """Native int8-lane bitwise ops: if Mosaic runs i8 elementwise at
    packed (4/lane) rate, the unpack ladder quarters."""
    N, K = 2048, 4096
    q = jnp.asarray(np.random.randint(0, 256, (N, K // 2)), jnp.uint8)
    sc = jnp.asarray(np.random.randn(N, K // 32) * 0.1, jnp.bfloat16)
    tn = 256

    def kern_i8(sc_ref, q_ref, out_ref):
        qb = q_ref[...]
        lo = (qb & jnp.uint8(0xF)).astype(jnp.int8).astype(jnp.float32)
        hi = (qb >> 4).astype(jnp.int8).astype(jnp.float32)
        w = jnp.concatenate([lo, hi], axis=-1)
        sh = pltpu.repeat(sc_ref[...].astype(jnp.float32), 32, axis=1)
        out_ref[...] = jnp.sum(w * sh, axis=1, keepdims=True
                               ).astype(jnp.float32)

    def kern_u4(sc_ref, q_ref, out_ref):
        q4 = pltpu.bitcast(q_ref[...], jnp.uint4)  # sublane-doubled
        w = q4.astype(jnp.bfloat16)  # one wide convert op?
        scbump = sc_ref[0:1, 0:1].astype(jnp.float32)
        out_ref[...] = (jnp.sum(w.astype(jnp.float32),
                                axis=1)[:w.shape[0] // 2, None][
                        :out_ref.shape[0]] + scbump)

    for name, kern in (("i8native", kern_i8), ("u4cast", kern_u4)):
        f = lambda sc, q, kern=kern: pl.pallas_call(
            kern,
            grid=(N // tn,),
            in_specs=[
                pl.BlockSpec((tn, K // 32), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tn, K // 2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tn, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, 1), jnp.float32),
            compiler_params=CP,
        )(sc, q)
        try:
            s, _ = timeit(f, sc, q)
            emit(f"unpack {name}", s, N * K // 2,
                 extra=f"({N * K / s / 1e9:.1f} Gelem/s)")
        except Exception as e:
            print(f"[unpack {name}] FAILED: {type(e).__name__}: {str(e)[:140]}",
                  flush=True)


# ---------------------------------------------------------------- probe 8
def probe_moe_batch():
    """B=32 MoE shapes: gathered tiles (tile_t 8/16) vs ONE dense
    full-stack matmul over all experts (every expert is hit at B=32, so
    streaming + unpacking the whole stack once is the same bytes/VPU —
    but through the dense kernel's pipeline)."""
    from tpullama.gguf.constants import GGMLType
    from tpullama.ops.pallas.qmm import (quantized_matmul,
                                         quantized_matmul_gathered)

    rng = np.random.default_rng(0)
    E, K, F2 = 32, 2880, 6144  # fused gateup rows (padded)
    S = 128  # B=32 * topk 4
    x = jnp.asarray(rng.standard_normal((S, K)), jnp.float32)
    nbytes = E * (K // 2 * F2 + 96 * F2 * 2)

    # gathered transposed (current production path)
    qf = jnp.asarray(rng.integers(0, 256, (E, K // 2, F2)), jnp.uint8)
    scf = jnp.asarray(rng.standard_normal((E, 96, F2)) * 0.01, jnp.bfloat16)
    for tt in (8, 16):
        P_rows = E * tt
        xg = jnp.zeros((P_rows, K), jnp.float32).at[:S].set(x)
        sel = jnp.repeat(jnp.arange(E, dtype=jnp.int32), 1)
        f = functools.partial(
            quantized_matmul_gathered, ggml_type=GGMLType.MXFP4, group=32,
            n_out=F2, n_in=K, tile_t=tt, planes_t=True)
        try:
            s, _ = timeit(lambda xg: f(xg, {"q4_lut": qf, "scale": scf}, sel),
                          xg, scan_len=8)
            emit(f"moe-b32 gathered tt={tt}", s, nbytes)
        except Exception as e:
            print(f"[moe-b32 tt={tt}] FAILED: {type(e).__name__}: {str(e)[:140]}")

    # dense full-stack: (S, K) @ (E*F2, K)^T row-major planes
    qd = jnp.asarray(rng.integers(0, 256, (E * F2, K // 2)), jnp.uint8)
    scd = jnp.asarray(rng.standard_normal((E * F2, K // 32)) * 0.01,
                      jnp.bfloat16)
    for tn in (512, 1024, 2048):
        f = functools.partial(
            quantized_matmul, ggml_type=GGMLType.MXFP4, group=32,
            n_out=E * F2, n_in=K, tile_n=tn)
        try:
            os.environ["TPULLAMA_QMM_TILE_N"] = str(tn)
            s, _ = timeit(lambda x: f(x, {"q4_lut": qd, "scale": scd}), x,
                          scan_len=8)
            emit(f"moe-b32 dense tn={tn}", s, nbytes)
        except Exception as e:
            print(f"[moe-b32 dense tn={tn}] FAILED: {type(e).__name__}: {str(e)[:140]}")
        finally:
            os.environ.pop("TPULLAMA_QMM_TILE_N", None)


PROBES["i8unpack"] = probe_i8unpack
PROBES["moe_batch"] = probe_moe_batch

if __name__ == "__main__":
    names = sys.argv[1:] or list(PROBES)
    print(f"device: {jax.devices()}", flush=True)
    for n in names:
        print(f"--- {n} ---", flush=True)
        try:
            PROBES[n]()
        except Exception as e:
            import traceback
            traceback.print_exc()
