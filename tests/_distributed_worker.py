"""Worker for test_distributed.py: one process of a 2-process
jax.distributed CPU cluster running the sharded TP forward.

argv: process_id num_processes coordinator_port gguf_path
Prints "LOGITS <sha256 of logits bytes> <first8 values>" on success.
"""

import hashlib
import os
import sys

pid, nprocs, port, gguf_path = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
)

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=nprocs, process_id=pid
)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from tpullama.models import load_model  # noqa: E402
from tpullama.parallel.distributed import global_mesh  # noqa: E402
from tpullama.parallel.sharding import param_shardings  # noqa: E402
from tpullama.parallel.tp import make_tp_forward  # noqa: E402

assert jax.process_count() == nprocs, jax.process_count()
assert jax.device_count() == 4 * nprocs

m = load_model(gguf_path)
hp = m.hparams
mesh = global_mesh(n_dp=1, n_tp=jax.device_count())

B, T, S = 1, 4, 16


def to_global(host_array, sharding):
    a = np.asarray(host_array)
    return jax.make_array_from_callback(a.shape, sharding, lambda idx: a[idx])


# every host holds the full weights host-side; device placement takes only
# each host's addressable shards (per-host HBM holds 1/n of each sharded
# tensor — the multi-host memory split)
shardings = param_shardings(m.params, mesh)
params = jax.tree.map(to_global, m.params, shardings)

rng = np.random.default_rng(0)
tokens = rng.integers(3, 200, size=(B, T)).astype(np.int32)
positions = np.tile(np.arange(T, dtype=np.int32), (B, 1))
causal = np.where(np.arange(S)[None, :] <= np.arange(T)[:, None], 0.0, -1e30)
causal[:, T:] = -1e30
mask = np.broadcast_to(causal, (B, 1, T, S)).astype(np.float32).copy()
kv = np.zeros((hp.n_layer, B, hp.n_head_kv, S, hp.n_embd_head_k), np.float32)

repl2 = NamedSharding(mesh, P())
kv_sh = NamedSharding(mesh, P(None, "dp", None, "tp", None))
args = (
    to_global(tokens, repl2),
    to_global(positions, repl2),
    to_global(kv, kv_sh),
    to_global(kv, kv_sh),
    to_global(positions, repl2),
    to_global(mask, repl2),
)

fwd = make_tp_forward(mesh, hp, m.quant_meta, params_tree=m.params, kv_tree=kv)
logits, _ = jax.jit(fwd)(params, *args)

from jax.experimental import multihost_utils  # noqa: E402

arr = np.asarray(multihost_utils.process_allgather(logits, tiled=True)).astype(
    np.float32
)
digest = hashlib.sha256(np.round(arr, 4).tobytes()).hexdigest()[:16]
print("LOGITS", digest, " ".join(f"{v:.4f}" for v in arr.reshape(-1)[:8]), flush=True)
