"""Context/sequence state serialization (checkpoint & resume).

The capability analog of the reference's three mechanisms (SURVEY.md §5):
 1. whole-context state blobs (llama_state_get/set_data, llama.h:736-761)
 2. session files with a token prefix enabling prompt-cache reuse across
    runs (GGSN v9, llama.h:764-788)
 3. per-sequence state files for server slot save/restore (GGSQ v2,
    llama.h:791-852)

Format: magic TPSN/TPSQ + JSON header (versioned, with model/shape
fingerprint) + raw little-endian arrays. Restore validates the
fingerprint the way the reference validates n_embd/arch on session load.
"""

from __future__ import annotations

import io
import json
import struct

import jax.numpy as jnp
import numpy as np

MAGIC_CTX = b"TPSN"
MAGIC_SEQ = b"TPSQ"
VERSION = 1


def _leaves(tag: str, tree) -> dict:
    """Flatten a (possibly nested-dict) cache tree to 'tag/path' -> array."""
    out = {}
    if isinstance(tree, dict):
        for k in sorted(tree):
            out.update(_leaves(f"{tag}/{k}", tree[k]))
    else:
        out[tag] = tree
    return out


def _rebuild(tag: str, template, arrays: dict, leaf):
    """Rebuild a tree shaped like `template` from flattened arrays,
    applying `leaf(old_leaf, saved_np_array)` at each leaf."""
    if isinstance(template, dict):
        return {
            k: _rebuild(f"{tag}/{k}", template[k], arrays, leaf)
            for k in template
        }
    return leaf(template, arrays[tag])


def _fingerprint(ctx) -> dict:
    hp = ctx.hp
    import jax

    kv_leaf = jax.tree.leaves(ctx.kv_k)[0]
    return {
        "arch": hp.arch,
        "n_layer": hp.n_layer,
        "n_head_kv": hp.n_head_kv,
        "n_embd_head_k": hp.n_embd_head_k,
        "n_embd_head_v": hp.n_embd_head_v,
        "n_ctx": ctx.p.n_ctx,
        "kv_dtype": str(np.dtype(kv_leaf.dtype)),
    }


def _write(f, magic: bytes, header: dict, arrays: dict):
    f.write(magic)
    f.write(struct.pack("<I", VERSION))
    hdr = dict(header)
    hdr["arrays"] = {
        k: {"shape": list(a.shape), "dtype": str(a.dtype)} for k, a in arrays.items()
    }
    hb = json.dumps(hdr).encode()
    f.write(struct.pack("<Q", len(hb)))
    f.write(hb)
    for a in arrays.values():
        f.write(np.ascontiguousarray(a).tobytes())


def _read(f, magic: bytes) -> tuple[dict, dict]:
    m = f.read(4)
    if m != magic:
        raise ValueError(f"state file: bad magic {m!r}, expected {magic!r}")
    (ver,) = struct.unpack("<I", f.read(4))
    if ver > VERSION:
        raise ValueError(f"state file: unsupported version {ver}")
    (hlen,) = struct.unpack("<Q", f.read(8))
    hdr = json.loads(f.read(hlen))
    arrays = {}
    for name, meta in hdr["arrays"].items():
        dt = np.dtype(meta["dtype"])
        n = int(np.prod(meta["shape"])) if meta["shape"] else 1
        raw = f.read(n * dt.itemsize)
        arrays[name] = np.frombuffer(raw, dtype=dt).reshape(meta["shape"])
    return hdr, arrays


def state_save(ctx, dest, tokens: list[int] | None = None) -> None:
    """Save the whole context state (+ optional session token prefix)."""
    arrays = {
        k: np.asarray(v)
        for k, v in {
            **_leaves("kv_k", ctx.kv_k),
            **_leaves("kv_v", ctx.kv_v),
            **_leaves("kv_pos", ctx.kv_pos),
        }.items()
    }
    arrays["pos_host"] = np.asarray(ctx._pos_host)
    arrays["n_past"] = np.asarray(ctx.n_past)
    if tokens is not None:
        arrays["tokens"] = np.asarray(tokens, np.int32)
    header = {"fingerprint": _fingerprint(ctx)}
    if hasattr(dest, "write"):
        _write(dest, MAGIC_CTX, header, arrays)
    else:
        with open(dest, "wb") as f:
            _write(f, MAGIC_CTX, header, arrays)


def state_load(ctx, src) -> list[int] | None:
    """Restore whole-context state. Returns the saved session tokens (for
    prompt-prefix reuse) or None."""
    if hasattr(src, "read"):
        hdr, arrays = _read(src, MAGIC_CTX)
    else:
        with open(src, "rb") as f:
            hdr, arrays = _read(f, MAGIC_CTX)
    fp = hdr["fingerprint"]
    want = _fingerprint(ctx)
    if fp != want:
        raise ValueError(f"state file: model/context mismatch: {fp} != {want}")
    full = lambda _old, a: jnp.asarray(a)
    ctx.kv_k = _rebuild("kv_k", ctx.kv_k, arrays, full)
    ctx.kv_v = _rebuild("kv_v", ctx.kv_v, arrays, full)
    ctx.kv_pos = _rebuild("kv_pos", ctx.kv_pos, arrays, full)
    kp_main = arrays.get("kv_pos", arrays.get("kv_pos/full"))
    ctx._pos_host[:] = arrays.get("pos_host", np.asarray(kp_main))
    ctx.n_past[:] = arrays["n_past"]
    toks = arrays.get("tokens")
    return list(toks) if toks is not None else None


def seq_save(ctx, seq_id: int, dest, tokens: list[int] | None = None) -> None:
    """Save one sequence lane (server slot save, llama.h:791-852)."""
    import jax

    arrays = {
        k: np.asarray(v[:, seq_id])
        for k, v in {
            **_leaves("kv_k", ctx.kv_k),
            **_leaves("kv_v", ctx.kv_v),
        }.items()
    }
    arrays.update(
        {
            k: np.asarray(v[seq_id])
            for k, v in _leaves("kv_pos", ctx.kv_pos).items()
        }
    )
    arrays["pos_host"] = np.asarray(ctx._pos_host[seq_id])
    arrays["n_past"] = np.asarray([ctx.n_past[seq_id]])
    if tokens is not None:
        arrays["tokens"] = np.asarray(tokens, np.int32)
    header = {"fingerprint": _fingerprint(ctx)}
    if hasattr(dest, "write"):
        _write(dest, MAGIC_SEQ, header, arrays)
    else:
        with open(dest, "wb") as f:
            _write(f, MAGIC_SEQ, header, arrays)


def seq_load(ctx, seq_id: int, src) -> list[int] | None:
    """Restore one sequence lane into slot seq_id."""
    if hasattr(src, "read"):
        hdr, arrays = _read(src, MAGIC_SEQ)
    else:
        with open(src, "rb") as f:
            hdr, arrays = _read(f, MAGIC_SEQ)
    fp = hdr["fingerprint"]
    want = _fingerprint(ctx)
    if fp != want:
        raise ValueError(f"state file: model/context mismatch: {fp} != {want}")
    lane = lambda old, a: old.at[:, seq_id].set(jnp.asarray(a))
    ctx.kv_k = _rebuild("kv_k", ctx.kv_k, arrays, lane)
    ctx.kv_v = _rebuild("kv_v", ctx.kv_v, arrays, lane)
    ctx.kv_pos = _rebuild(
        "kv_pos", ctx.kv_pos, arrays,
        lambda old, a: old.at[seq_id].set(jnp.asarray(a)),
    )
    kp_main = arrays.get("kv_pos", arrays.get("kv_pos/full"))
    ctx._pos_host[seq_id] = arrays.get("pos_host", np.asarray(kp_main))
    ctx.n_past[seq_id] = int(arrays["n_past"][0])
    toks = arrays.get("tokens")
    return list(toks) if toks is not None else None
