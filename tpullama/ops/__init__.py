"""Compute ops: jnp reference implementations + Pallas TPU kernels.

The jnp functions are the numerical reference (the role the CPU backend
plays in the reference's test-backend-ops.cpp); Pallas kernels in
`tpullama.ops.pallas` are tested against them and used on the hot path.
"""

from .activations import geglu, gelu, reglu, silu, swiglu, swiglu_oai
from .norms import l2_norm, layer_norm, rms_norm
from .rope import RopeParams, apply_rope, rope_cache

__all__ = [
    "rms_norm",
    "layer_norm",
    "l2_norm",
    "silu",
    "gelu",
    "swiglu",
    "geglu",
    "reglu",
    "swiglu_oai",
    "RopeParams",
    "rope_cache",
    "apply_rope",
]
