"""Activation / GLU ops (reference: ggml unary ops ggml.h:570-592 and
GLU ops ggml.h:597-604; swiglu_oai semantics from src/llama-graph.cpp
build_moe_ffn :1059-1094)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def silu(x):
    return x * jax.nn.sigmoid(x)


def gelu(x):
    # ggml uses tanh-approx gelu (GGML_OP_GELU)
    return jax.nn.gelu(x, approximate=True)


def gelu_erf(x):
    return jax.nn.gelu(x, approximate=False)


def swiglu(gate, up):
    """SwiGLU: silu(gate) * up (ggml_swiglu split form)."""
    return silu(gate) * up


def geglu(gate, up):
    return gelu(gate) * up


def reglu(gate, up):
    return jnp.maximum(gate, 0) * up


def swiglu_oai(gate, up, alpha: float = 1.702, limit: float = 7.0):
    """gpt-oss gated activation (ggml_swiglu_oai; llama-graph.cpp:1078):
    clamp gate to max=limit, up to [-limit, limit];
    out = gate * sigmoid(alpha * gate) * (up + 1)."""
    g = jnp.minimum(gate, limit)
    u = jnp.clip(up, -limit, limit)
    return g * jax.nn.sigmoid(alpha * g) * (u + 1.0)
