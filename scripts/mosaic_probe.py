"""Probe which data-movement primitives the current Mosaic compiler
accepts inside a TPU kernel — the candidates for a lane-shuffle-free
in-kernel group permute (ops/pallas/fused_layer.py needs
(1,K) -> group-transposed order; the naive reshape (1,K)->(K/g,g) is
rejected with "infer-vector-layout: unsupported shape cast").

Each case compiles (and runs) a one-op pallas kernel; prints OK/FAIL.
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

K = 4096
G = 32
INTERPRET = os.environ.get("PROBE_INTERPRET", "0") == "1"


def run(name, kernel, in_shapes, out_shape, check=None):
    try:
        args = [jnp.asarray(np.random.default_rng(0).standard_normal(s),
                            jnp.float32) for s in in_shapes]
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            interpret=INTERPRET,
        )(*args)
        out = jax.block_until_ready(out)
        status = "OK"
        if check is not None:
            ok = check(*[np.asarray(a) for a in args], np.asarray(out))
            status = "OK exact" if ok else "OK WRONG-VALUES"
        print(f"[{name}] {status}")
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e).split("\n")[0][:140]
        print(f"[{name}] FAIL: {msg}")
        return False


# 1. split reshape (1,K) -> (K/128, 128)
run("split_128", lambda x, o: o.__setitem__((...,), x[...].reshape(K // 128, 128)),
    [(1, K)], (K // 128, 128),
    check=lambda x, o: np.allclose(o, x.reshape(K // 128, 128)))

# 2. collapse reshape (K/128, 128) -> (1, K)
run("collapse_128", lambda x, o: o.__setitem__((...,), x[...].reshape(1, K)),
    [(K // 128, 128)], (1, K),
    check=lambda x, o: np.allclose(o, x.reshape(1, K)))

# 3. 2D transpose (32,128) -> (128,32)
run("transpose_32x128", lambda x, o: o.__setitem__((...,), x[...].T),
    [(32, 128)], (128, 32),
    check=lambda x, o: np.allclose(o, x.T))

# 4. 2D transpose square (32,32)
run("transpose_32x32", lambda x, o: o.__setitem__((...,), x[...].T),
    [(32, 32)], (32, 32),
    check=lambda x, o: np.allclose(o, x.T))

# 5. collapse (32, 448) -> (1, 14336) (non-128 minor collapse)
run("collapse_448",
    lambda x, o: o.__setitem__((...,), x[...].reshape(1, 32 * 448)),
    [(32, 448)], (1, 32 * 448),
    check=lambda x, o: np.allclose(o, x.reshape(1, -1)))

# 6. 3D reshape (N, K) -> (N, 32, K/32) with minor 128: (256,4096)->(256,32,128)
run("split3d", lambda x, o: o.__setitem__((...,), x[...].reshape(256, 32, 128)),
    [(256, K)], (256, 32, 128),
    check=lambda x, o: np.allclose(o, x.reshape(256, 32, 128)))

# 7. 3D elementwise broadcast (256,32,128)*(1,1,128)
def bc3(x, s, o):
    o[...] = x[...] * s[...]
run("bcast3d", bc3, [(256, 32, 128), (1, 1, 128)], (256, 32, 128),
    check=lambda x, s, o: np.allclose(o, x * s))

# 8. dot_general 2 contracting dims: (32,128)x(256,32,128) -> (256,)
def dot2c(x, w, o):
    acc = jax.lax.dot_general(
        x[...], w[...], (((0, 1), (1, 2)), ((), ())),
        preferred_element_type=jnp.float32)
    o[...] = acc.reshape(1, 256)
run("dot_2contract", dot2c, [(32, 128), (256, 32, 128)], (1, 256),
    check=lambda x, w, o: np.allclose(
        o, np.einsum("rq,nrq->n", x, w).reshape(1, 256), rtol=3e-5, atol=3e-4))

# 9. lane roll (pltpu.roll)
def roll_k(x, o):
    o[...] = pltpu.roll(x[...], 32, axis=1)
run("roll_lanes", roll_k, [(1, K)], (1, K),
    check=lambda x, o: np.allclose(o, np.roll(x, 32, axis=1)))

# 10. strided lane slice x[:, ::32]
def stride_k(x, o):
    o[...] = x[..., ::32]
run("strided_slice", stride_k, [(1, K)], (1, K // 32),
    check=lambda x, o: np.allclose(o, x[:, ::32]))

# 11. the illegal baseline, for reference
run("reshape_1K_to_KgG", lambda x, o: o.__setitem__((...,), x[...].reshape(K // G, G)),
    [(1, K)], (K // G, G),
    check=lambda x, o: np.allclose(o, x.reshape(K // G, G)))

# 12. concat of transposed 32-col slices: the 4-block permute plan
def four_block(x, o):
    y = x[...].reshape(32, 128)
    parts = [y[:, 32 * m:32 * (m + 1)].T for m in range(4)]
    o[...] = jnp.concatenate(parts, axis=1)
run("fourblock_T", four_block, [(1, K)], (32, 128),
    check=lambda x, o: np.allclose(
        o, np.concatenate([x.reshape(32, 128)[:, 32 * m:32 * (m + 1)].T
                           for m in range(4)], axis=1)))

# 13. nonsquare transpose (112, 32) -> (32, 112) (the Fd=14336 case)
run("transpose_112x32", lambda x, o: o.__setitem__((...,), x[...].T),
    [(112, 32)], (32, 112),
    check=lambda x, o: np.allclose(o, x.T))

# 14. full fourblock permute + flatten for K=4096 (the E-case chain)
def four_flat(x, o):
    y = x[...].reshape(32, 128)
    parts = [y[:, 32 * m:32 * (m + 1)].T for m in range(4)]
    o[...] = jnp.concatenate(parts, axis=1).reshape(1, K)
def four_flat_np(x):
    y = x.reshape(32, 128)
    return np.concatenate([y[:, 32 * m:32 * (m + 1)].T for m in range(4)],
                          axis=1).reshape(1, K)
run("fourblock_flat_4096", four_flat, [(1, K)], (1, K),
    check=lambda x, o: np.allclose(o, four_flat_np(x)))

# 15. full fourblock chain for K=14336 (collapse minor 448)
K2 = 14336
def four_flat2(x, o):
    y = x[...].reshape(K2 // 128, 128)
    parts = [y[:, 32 * m:32 * (m + 1)].T for m in range(4)]
    o[...] = jnp.concatenate(parts, axis=1).reshape(1, K2)
def four_flat2_np(x):
    y = x.reshape(K2 // 128, 128)
    return np.concatenate([y[:, 32 * m:32 * (m + 1)].T for m in range(4)],
                          axis=1).reshape(1, K2)
run("fourblock_flat_14336", four_flat2, [(1, K2)], (1, K2),
    check=lambda x, o: np.allclose(o, four_flat2_np(x)))

# 16. column-sum of the fourblock view (group sums): (32,448)->(1,448)
def colsum(x, o):
    y = x[...].reshape(K2 // 128, 128)
    parts = [y[:, 32 * m:32 * (m + 1)].T for m in range(4)]
    o[...] = jnp.sum(jnp.concatenate(parts, axis=1), axis=0, keepdims=True)
run("fourblock_colsum_448", colsum, [(1, K2)], (1, K2 // 32),
    check=lambda x, o: np.allclose(
        o, np.concatenate(
            [x.reshape(K2 // 128, 128)[:, 32 * m:32 * (m + 1)].T
             for m in range(4)], axis=1).sum(0, keepdims=True), rtol=1e-5,
        atol=1e-4))

# 17. 32 accumulated row-dots (flatten-free fallback):
#     acc[n] = sum_a dot(XP[a], V[:, a, :])
def rowdots(x, w, o):
    acc = jnp.zeros((1, 256), jnp.float32)
    xp = x[...]
    for a in range(8):  # 8 rows is enough to prove lowering
        acc = acc + jax.lax.dot_general(
            xp[a:a + 1, :], w[...][:, a, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    o[...] = acc
run("rowdots_8", rowdots, [(32, 128), (256, 32, 128)], (1, 256),
    check=lambda x, w, o: np.allclose(
        o, np.einsum("aq,naq->n", x[:8], w[:, :8, :]).reshape(1, 256),
        rtol=3e-5, atol=3e-3))
