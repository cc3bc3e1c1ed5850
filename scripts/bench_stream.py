"""Diagnostic: raw HBM streaming rate of a pallas kernel vs XLA on the
axon TPU.

The tunnel costs ~22ms per jit invocation, so each measurement runs R
rounds over a 256MB working set (too big for VMEM caching) inside one
jit, and the difference between R=2 and R=10 cancels the fixed cost.
Each round takes the previous round's scalar as an operand so XLA cannot
CSE the rounds into one.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

L = 16
N, KB = 4096, 4096  # uint8 16 MiB per array; 256 MiB total
rng = np.random.default_rng(0)
ws = jnp.asarray(rng.integers(0, 255, size=(L, N, KB), dtype=np.uint8))
R1, R2 = 2, 10


def reduce_kernel(s_ref, w_ref, o_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        o_ref[0, 0] = s_ref[0, 0]

    o_ref[0, 0] += jnp.sum(w_ref[...].astype(jnp.int32))


def pallas_reduce(w, seed, tn):
    return pl.pallas_call(
        reduce_kernel,
        grid=(N // tn,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((tn, KB), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
    )(seed.reshape(1, 1), w)[0, 0]


def rounds_time(make_round):
    def run(r):
        def f(ws):
            acc = jnp.int32(1)
            for j in range(r):
                acc = make_round(ws, acc)
            return acc

        g = jax.jit(f)
        np.asarray(g(ws))
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            np.asarray(g(ws))
            best = min(best, time.perf_counter() - t0)
        return best

    return (run(R2) - run(R1)) / (R2 - R1)


nbytes = L * N * KB

for tn in (512, 4096):
    def mk(ws, acc, tn=tn):
        for i in range(L):
            acc = pallas_reduce(ws[i], acc, tn)
        return acc

    dt = rounds_time(mk)
    print(f"pallas reduce tn={tn:5d}: {dt*1e3:7.2f} ms/round  {nbytes/dt/1e9:6.1f} GB/s", flush=True)


def mk_xla(ws, acc):
    for i in range(L):
        acc = acc + jnp.sum((ws[i] ^ (acc & 0).astype(jnp.uint8)).astype(jnp.int32))
    return acc


dt = rounds_time(mk_xla)
print(f"xla reduce            : {dt*1e3:7.2f} ms/round  {nbytes/dt/1e9:6.1f} GB/s", flush=True)
