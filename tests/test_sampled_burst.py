"""On-device fused sampling (device_sample + Context sampled burst).

The common temp/top-k/top-p/min-p/dist chain runs inside the decode scan
(no per-token host round-trip); the host chain stays authoritative for
stateful samplers. RNG stream is jax threefry (documented divergence from
the reference's mt19937 — the *distribution*, not the stream, matches)."""

import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from tpullama.runtime.sampling import (
    DeviceSamplerSpec,
    SamplerChain,
    as_device_spec,
    device_sample,
)


def test_spec_mapping():
    assert as_device_spec(SamplerChain.std(temp=0.7, top_k=50)) == \
        DeviceSamplerSpec(0.7, 50, 0.95, 0.05, 42)
    assert as_device_spec(SamplerChain.greedy()).temp == 0.0
    # stateful members force host fallback
    assert as_device_spec(SamplerChain.std(temp=0.7, penalty_repeat=1.2)) is None
    from tpullama.runtime.sampling import MirostatV2, Temp

    assert as_device_spec(SamplerChain([Temp(0.7), MirostatV2()])) is None


def test_device_sample_respects_topk_topp():
    logits = jnp.asarray(np.array([5.0, 4.0, 3.0, -10.0, -10.0] + [-20.0] * 27,
                                  np.float32))
    spec = DeviceSamplerSpec(temp=1.0, top_k=2, top_p=1.0, min_p=0.0, seed=0)
    draws = {
        int(device_sample(logits, jax.random.PRNGKey(i), spec)) for i in range(64)
    }
    assert draws <= {0, 1}, draws
    assert len(draws) == 2  # both top-2 tokens appear at p ratio e

    # top_p=0.5 with p0~0.72 keeps only token 0
    spec = DeviceSamplerSpec(temp=1.0, top_k=0, top_p=0.5, min_p=0.0, seed=0)
    draws = {
        int(device_sample(logits, jax.random.PRNGKey(i), spec)) for i in range(32)
    }
    assert draws == {0}, draws

    # min_p=0.5 keeps tokens with p >= 0.5*p_max -> {0, 1} (ratio e^-1)
    spec = DeviceSamplerSpec(temp=1.0, top_k=0, top_p=1.0, min_p=0.5, seed=0)
    draws = {
        int(device_sample(logits, jax.random.PRNGKey(i), spec)) for i in range(64)
    }
    assert draws == {0}, draws  # 1/e ~ 0.37 < 0.5 -> only argmax survives


def test_device_sample_greedy():
    logits = jnp.asarray(np.random.default_rng(0).standard_normal(64), jnp.float32)
    spec = DeviceSamplerSpec(0.0, 0, 1.0, 0.0, 0)
    tok = int(device_sample(logits, jax.random.PRNGKey(0), spec))
    assert tok == int(np.argmax(np.asarray(logits)))


def test_sampled_burst_deterministic_and_near_greedy():
    from tpullama.models import load_model
    from tpullama.models.testing import make_tiny_llama_gguf
    from tpullama.runtime.context import Context, ContextParams

    path = tempfile.mktemp(suffix=".gguf")
    make_tiny_llama_gguf(path)
    m = load_model(path)

    def gen(sampler, burst):
        ctx = Context(m, ContextParams(n_ctx=96))
        return ctx.generate([5, 6, 7], n_predict=16, sampler=sampler, burst=burst)

    greedy = gen(None, 8)
    # near-zero temperature device sampling follows greedy exactly
    cold = gen(SamplerChain.std(temp=1e-4, top_k=1), 8)
    assert cold == greedy, (cold, greedy)
    # fixed seed -> deterministic fused sampled decode
    a = gen(SamplerChain.std(temp=0.9, seed=7), 8)
    b = gen(SamplerChain.std(temp=0.9, seed=7), 8)
    assert a == b
    assert len(a) == 16
