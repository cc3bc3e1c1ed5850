"""Training / finetuning hooks.

The analog of the reference's opt stack (ggml/src/ggml-opt.cpp +
llama_opt_init / llama_opt_epoch, include/llama.h:1422-1431), built the
TPU way: the functional forward differentiates directly with jax.grad
and optimizers come from optax (AdamW & SGD, matching the reference's
two step ops, ggml.h:561-562). Dataset batching mirrors ggml_opt_dataset
(sliding windows of n_ctx tokens with shift-by-one labels; train/eval
split by fraction).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.llama import llama_forward


@dataclass
class OptParams:
    """llama_opt_params analog."""

    n_ctx: int = 128
    n_batch: int = 4
    lr: float = 1e-4
    optimizer: str = "adamw"  # or "sgd"
    weight_decay: float = 0.0
    val_split: float = 0.05
    param_filter: str | None = None  # regex on param path; None = all
    remat: bool = False  # gradient-checkpoint each layer (memory ∝ 1 layer)
    mesh: object = None  # jax Mesh for sharded training (dp batch axis +
    # Megatron tp weight shards; parallel.sharding specs)


def make_dataset(tokens: list[int], n_ctx: int, stride: int | None = None):
    """Sliding windows of n_ctx+1 tokens (ggml_opt_dataset semantics)."""
    stride = stride or n_ctx
    toks = np.asarray(tokens, np.int32)
    windows = []
    for start in range(0, len(toks) - n_ctx - 1 + 1, stride):
        windows.append(toks[start : start + n_ctx + 1])
    if not windows:
        raise ValueError(f"dataset too small: {len(toks)} tokens < n_ctx+1")
    return np.stack(windows)  # (n_windows, n_ctx+1)


def _causal_mask(T: int, S: int):
    i = np.arange(T)
    c = np.arange(S)
    vis = (c[None, :] <= i[:, None]) & (c[None, :] < T)
    return jnp.asarray(np.where(vis, 0.0, -1e30).astype(np.float32))[None, None]


class Trainer:
    """llama_opt_init + llama_opt_epoch analog."""

    def __init__(self, model, params: OptParams | None = None):
        import optax

        self.model = model
        self.hp = model.hparams
        self.p = params or OptParams()
        if self.p.optimizer == "adamw":
            self.tx = optax.adamw(self.p.lr, weight_decay=self.p.weight_decay)
        elif self.p.optimizer == "sgd":
            self.tx = optax.sgd(self.p.lr)
        else:
            raise ValueError(f"unknown optimizer {self.p.optimizer!r}")
        if any(isinstance(v, dict) for v in model.params.get("layers", {}).values()):
            raise ValueError("training requires dense weights (packed=False)")
        if self.p.param_filter:
            # freeze everything not matching the regex (optax.masked):
            # paths look like "layers/attn_q", "tok_embd", ...
            import re as _re

            import optax

            rx = _re.compile(self.p.param_filter)

            def labels(params, prefix=""):
                if isinstance(params, dict):
                    return {
                        k: labels(v, f"{prefix}{k}/") for k, v in params.items()
                    }
                return "train" if rx.search(prefix.rstrip("/")) else "freeze"

            self.tx = optax.multi_transform(
                {"train": self.tx, "freeze": optax.set_to_zero()},
                labels(model.params),
            )
        self.train_params = model.params
        if self.p.mesh is not None:
            from ..parallel.sharding import param_shardings

            sh = param_shardings(model.params, self.p.mesh)
            self.train_params = jax.tree.map(
                jax.device_put, model.params, sh
            )
        self.opt_state = self.tx.init(self.train_params)
        self._step = jax.jit(self._step_impl)
        self._eval = jax.jit(self._loss)

    def _loss(self, params, batch):
        """Mean cross-entropy of next-token prediction. batch: (B, n_ctx+1)."""
        hp = self.hp
        B = batch.shape[0]
        T = batch.shape[1] - 1
        S = T + 1
        inputs = batch[:, :T]
        targets = batch[:, 1 : T + 1]
        kv_k = jnp.zeros((hp.n_layer, B, hp.n_head_kv, S, hp.n_embd_head_k), jnp.float32)
        kv_v = jnp.zeros((hp.n_layer, B, hp.n_head_kv, S, hp.n_embd_head_v), jnp.float32)
        pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
        mask = _causal_mask(T, S)
        logits, _ = llama_forward(params, hp, inputs, pos, kv_k, kv_v, pos, mask,
                                  remat=self.p.remat)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        return nll.mean()

    def _step_impl(self, params, opt_state, batch):
        loss, grads = jax.value_and_grad(self._loss)(params, batch)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        import optax

        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def epoch(self, dataset: np.ndarray, shuffle_seed: int | None = None):
        """One epoch over the train split; returns (train_loss, val_loss).
        (llama_opt_epoch semantics: leading (1-val_split) fraction trains,
        the rest evaluates.)"""
        n = len(dataset)
        n_val = int(n * self.p.val_split)
        n_train = n - n_val
        order = np.arange(n_train)
        if shuffle_seed is not None:
            np.random.default_rng(shuffle_seed).shuffle(order)
        B = self.p.n_batch
        train_losses = []

        def put(b):
            if self.p.mesh is not None and "dp" in self.p.mesh.shape:
                from jax.sharding import NamedSharding, PartitionSpec as P

                return jax.device_put(
                    jnp.asarray(b), NamedSharding(self.p.mesh, P("dp"))
                )
            return jnp.asarray(b)

        for i in range(0, n_train - B + 1, B):
            batch = put(dataset[order[i : i + B]])
            self.train_params, self.opt_state, loss = self._step(
                self.train_params, self.opt_state, batch
            )
            train_losses.append(float(loss))
        val_losses = []
        for i in range(n_train, n - B + 1, B):
            val_losses.append(float(self._eval(self.train_params, jnp.asarray(dataset[i : i + B]))))
        return (
            float(np.mean(train_losses)) if train_losses else float("nan"),
            float(np.mean(val_losses)) if val_losses else float("nan"),
        )

    def finish(self):
        """Write trained params back onto the model."""
        self.model.params = self.train_params
        return self.model


class LoraTrainer:
    """LoRA finetuning: train low-rank A/B factors on frozen base weights
    (the finetune-with-adapters workflow; adapter format matches
    src/llama-adapter.cpp so the result loads with runtime.lora).

    The merged weight W + (alpha/rank)·s·B@A is formed inside the loss
    from the frozen base (a non-differentiated argument), so gradients
    and optimizer state exist only for the rank-r factors."""

    def __init__(self, model, params: OptParams | None = None,
                 rank: int = 8, alpha: float = 16.0,
                 targets: tuple = ("attn_q", "attn_k", "attn_v",
                                   "attn_output"),
                 seed: int = 0):
        import optax

        self.model = model
        self.hp = model.hparams
        self.p = params or OptParams()
        self.rank = rank
        self.alpha = alpha
        self.targets = tuple(targets)
        if any(isinstance(v, dict) for v in model.params.get("layers", {}).values()):
            raise ValueError("lora training requires dense weights (packed=False)")
        key = jax.random.PRNGKey(seed)
        self.lora = {}
        for t in self.targets:
            w = model.params["layers"].get(t)
            if w is None:
                continue
            L, n_out, n_in = w.shape
            key, k1 = jax.random.split(key)
            # A ~ kaiming-ish small init, B zeros (standard LoRA init:
            # the adapter starts as a no-op)
            self.lora[t] = {
                "a": jax.random.normal(k1, (L, rank, n_in), jnp.float32) * 0.01,
                "b": jnp.zeros((L, n_out, rank), jnp.float32),
            }
        if not self.lora:
            raise ValueError(f"no trainable targets found among {targets}")
        self.tx = (
            optax.adamw(self.p.lr, weight_decay=self.p.weight_decay)
            if self.p.optimizer == "adamw"
            else optax.sgd(self.p.lr)
        )
        self.opt_state = self.tx.init(self.lora)
        self._step = jax.jit(self._step_impl)
        self._eval = jax.jit(self._loss)

    def _merged(self, base, lora):
        s = self.alpha / self.rank
        layers = dict(base["layers"])
        for t, ab in lora.items():
            delta = jnp.einsum("lor,lri->loi", ab["b"], ab["a"]) * s
            layers[t] = base["layers"][t] + delta.astype(base["layers"][t].dtype)
        return {**base, "layers": layers}

    def _loss(self, lora, batch):
        hp = self.hp
        params = self._merged(self.model.params, lora)
        B = batch.shape[0]
        T = batch.shape[1] - 1
        S = T + 1
        inputs = batch[:, :T]
        targets = batch[:, 1 : T + 1]
        kv_k = jnp.zeros((hp.n_layer, B, hp.n_head_kv, S, hp.n_embd_head_k), jnp.float32)
        kv_v = jnp.zeros((hp.n_layer, B, hp.n_head_kv, S, hp.n_embd_head_v), jnp.float32)
        pos = jnp.broadcast_to(jnp.arange(T, dtype=jnp.int32), (B, T))
        mask = _causal_mask(T, S)
        logits, _ = llama_forward(params, hp, inputs, pos, kv_k, kv_v, pos, mask,
                                  remat=self.p.remat)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        return nll.mean()

    def _step_impl(self, lora, opt_state, batch):
        import optax

        loss, grads = jax.value_and_grad(self._loss)(lora, batch)
        updates, opt_state = self.tx.update(grads, opt_state, lora)
        lora = optax.apply_updates(lora, updates)
        return lora, opt_state, loss

    def epoch(self, dataset: np.ndarray, shuffle_seed: int | None = None):
        n = len(dataset)
        n_val = int(n * self.p.val_split)
        n_train = n - n_val
        order = np.arange(n_train)
        if shuffle_seed is not None:
            np.random.default_rng(shuffle_seed).shuffle(order)
        B = self.p.n_batch
        train_losses = []
        for i in range(0, n_train - B + 1, B):
            self.lora, self.opt_state, loss = self._step(
                self.lora, self.opt_state, jnp.asarray(dataset[order[i : i + B]])
            )
            train_losses.append(float(loss))
        val_losses = [
            float(self._eval(self.lora, jnp.asarray(dataset[i : i + B])))
            for i in range(n_train, n - B + 1, B)
        ]
        return (
            float(np.mean(train_losses)) if train_losses else float("nan"),
            float(np.mean(val_losses)) if val_losses else float("nan"),
        )

    def export_adapter(self, dest):
        """Write the trained factors as a loadable LoRA GGUF
        (adapter.type/lora.alpha + blk.N.<t>.weight.lora_{a,b})."""
        from ..gguf import GGMLType, GGUFWriter

        w = GGUFWriter()
        w.add_str("adapter.type", "lora")
        w.add_f32("adapter.lora.alpha", float(self.alpha))
        w.add_str("general.architecture", self.hp.arch)
        for t, ab in self.lora.items():
            a = np.asarray(ab["a"])
            b = np.asarray(ab["b"])
            for il in range(a.shape[0]):
                w.add_tensor(f"blk.{il}.{t}.weight.lora_a", a[il], GGMLType.F32)
                w.add_tensor(f"blk.{il}.{t}.weight.lora_b", b[il], GGMLType.F32)
        w.write(dest)
        return dest


def save_finetuned(model, dest: str):
    """llama_model_save_to_file analog: re-emit the source GGUF with the
    trained dense weights written back (updated tensors stored F32, the
    rest copied verbatim from the reader). Requires a dense
    (packed=False) load with the reader still attached."""
    from ..gguf import GGMLType, GGUFWriter
    from ..models.loader import _LAYER_TENSORS

    r = model.reader
    if r is None:
        raise ValueError("model has no reader attached (in-memory build?)")
    layers = model.params.get("layers", {})
    suffix_of_key = {}
    for sfx, key in _LAYER_TENSORS.items():
        suffix_of_key.setdefault(key, sfx)
    top_map = {"token_embd.weight": "tok_embd", "output.weight": "output",
               "output_norm.weight": "output_norm"}

    w = GGUFWriter(alignment=r.alignment)
    for k, v in r.kv.items():
        w.add_kv(k, v)
    for name in r.tensors:
        new = None
        if name.startswith("blk."):
            _, idx, rest = name.split(".", 2)
            key = _LAYER_TENSORS.get(rest)
            arr = layers.get(key) if key else None
            if arr is not None and not isinstance(arr, dict):
                new = np.asarray(arr[int(idx)], np.float32)
        elif name in top_map:
            arr = model.params.get(top_map[name])
            if arr is not None and not isinstance(arr, dict):
                new = np.asarray(arr, np.float32)
        info = r.tensors[name]
        if new is not None and tuple(new.shape) == tuple(
                int(s) for s in info.shape):
            w.add_tensor(name, new, GGMLType.F32)
        else:
            w.add_tensor(name, np.empty(info.shape),
                         ggml_type=info.ggml_type,
                         raw=np.asarray(r.tensor_raw(name)))
    w.write(dest)
    return dest
