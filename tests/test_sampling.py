"""Sampler tests (the test-sampling.cpp deterministic-distribution
pattern)."""

import numpy as np
import pytest

from tpullama.runtime.sampling import (
    Candidates,
    Dist,
    Dry,
    Greedy,
    LogitBias,
    MinP,
    MirostatV1,
    MirostatV2,
    Penalties,
    SamplerChain,
    Temp,
    TempExt,
    TopK,
    TopNSigma,
    TopP,
    Typical,
    Xtc,
)


def cands(logits):
    return Candidates.from_logits(np.asarray(logits, np.float32))


def test_top_k():
    c = cands([0.1, 5.0, 2.0, 3.0])
    TopK(2).apply(c)
    assert set(c.ids.tolist()) == {1, 3}


def test_top_p():
    c = cands(np.log([0.5, 0.3, 0.15, 0.05]))
    TopP(0.79).apply(c)
    assert set(c.ids.tolist()) == {0, 1}


def test_min_p():
    c = cands(np.log([0.6, 0.3, 0.05, 0.005]))
    MinP(0.2).apply(c)  # keep p >= 0.2 * 0.6 = 0.12
    assert set(c.ids.tolist()) == {0, 1}


def test_typical_keeps_probable():
    c = cands(np.log([0.97, 0.01, 0.01, 0.01]))
    Typical(0.5).apply(c)
    assert 0 in c.ids.tolist()


def test_temp_zero_is_greedy():
    c = cands([1.0, 9.0, 3.0])
    Temp(0).apply(c)
    assert int(np.argmax(c.logits)) == 1
    assert np.isinf(c.logits[0]) and c.logits[0] < 0


def test_temp_scales():
    c = cands([2.0, 4.0])
    Temp(2.0).apply(c)
    np.testing.assert_allclose(c.logits, [1.0, 2.0])


def test_penalties():
    p = Penalties(last_n=8, repeat=2.0, freq=0.1, present=0.5)
    for t in [1, 1, 2]:
        p.accept(t)
    c = cands([1.0, 1.0, 1.0, 1.0])
    p.apply(c)
    # token 1: /2 then -2*0.1 -0.5 = -0.2; token 2: /2 -0.1-0.5
    np.testing.assert_allclose(c.logits[1], 1.0 / 2 - 0.2 - 0.5, rtol=1e-6)
    np.testing.assert_allclose(c.logits[2], 1.0 / 2 - 0.1 - 0.5, rtol=1e-6)
    assert c.logits[0] == 1.0


def test_dist_deterministic():
    a = Dist(seed=7)
    b = Dist(seed=7)
    c1 = cands(np.random.default_rng(0).normal(size=50))
    c2 = cands(np.random.default_rng(0).normal(size=50))
    assert a.apply(c1) == b.apply(c2)


def test_logit_bias():
    c = cands([0.0, 0.0])
    LogitBias({1: 5.0}).apply(c)
    assert c.logits[1] == 5.0


def test_top_n_sigma():
    c = cands([10.0, 9.9, 0.0, -5.0])
    TopNSigma(1.0).apply(c)
    kept = c.ids[np.isfinite(c.logits)].tolist() if not c.sorted else c.ids.tolist()
    assert 0 in kept and 1 in kept


def test_mirostat_v2_adapts():
    m = MirostatV2(seed=3, tau=2.0)
    mu0 = m.mu
    logits = np.random.default_rng(1).normal(size=100).astype(np.float32)
    m.apply(cands(logits))
    assert m.mu != mu0


def test_mirostat_v1():
    m = MirostatV1(n_vocab=100, seed=3)
    idx = m.apply(cands(np.random.default_rng(1).normal(size=100)))
    assert idx is not None


def test_dry_penalizes_repeats():
    d = Dry(multiplier=1.0, base=2.0, allowed_length=2, penalty_last_n=64)
    for t in [5, 6, 7, 5, 6, 7, 5, 6]:
        d.accept(t)
    c = cands(np.zeros(10))
    d.apply(c)
    assert c.logits[7] < -1.0  # would extend the 5,6,7 repeat
    assert c.logits[3] == 0.0


def test_dry_respects_allowed_length():
    d = Dry(multiplier=1.0, base=2.0, allowed_length=10, penalty_last_n=64)
    for t in [5, 6, 5, 6]:
        d.accept(t)
    c = cands(np.zeros(10))
    d.apply(c)
    assert (c.logits == 0).all()


def test_chain_std_deterministic():
    chain_a = SamplerChain.std(seed=11, temp=0.7)
    chain_b = SamplerChain.std(seed=11, temp=0.7)
    logits = np.random.default_rng(2).normal(size=200).astype(np.float32)
    seq_a = [chain_a.sample(logits) for _ in range(5)]
    seq_b = [chain_b.sample(logits) for _ in range(5)]
    assert seq_a == seq_b


def test_chain_greedy():
    logits = np.zeros(10, np.float32)
    logits[4] = 1.0
    assert SamplerChain.greedy().sample(logits) == 4


# ----------------------------------------------------------------- infill

class _FakeVocab:
    """Minimal vocab for Infill: 0:'he' 1:'hello' 2:'wor' 3:EOG 4:'x'."""

    eos_id = 3
    eot_id = 3

    def __init__(self, pieces=None, eog=(3,)):
        self.pieces = pieces or {0: "he", 1: "hello", 2: "wor", 3: "", 4: "x"}
        self.eog = set(eog)

    def is_eog(self, t):
        return t in self.eog

    def token_to_piece(self, t, special=False):
        return self.pieces.get(t, "")


def test_infill_eog_dominance_keeps_only_eog():
    from tpullama.runtime.sampling import Infill

    # EOG prob high relative to text: 3*p_eog*n > p_txt
    cur = cands([1.0, 1.0, 1.0, 5.0, 1.0])  # token 3 is EOG and dominant
    Infill(_FakeVocab()).apply(cur)
    assert list(cur.ids) == [3]


def test_infill_prefix_merge_and_threshold():
    from tpullama.runtime.sampling import Infill

    # 'he' (p small) is a prefix of 'hello' (p large): merged into 'hello';
    # 'wor' keeps enough mass to survive; EOG prob tiny
    cur = cands([3.0, 4.0, 4.0, -8.0, -8.0])
    Infill(_FakeVocab()).apply(cur)
    ids = set(int(t) for t in cur.ids)
    assert 1 in ids and 2 in ids  # hello + wor survive
    assert 0 not in ids  # 'he' merged away
    assert np.isclose(cur.probs.sum(), 1.0)


def test_infill_all_below_threshold_falls_back_to_eot():
    from tpullama.runtime.sampling import Infill

    # many equally-unlikely text tokens, each p < 0.2, no EOG mass
    v = _FakeVocab(pieces={i: f"t{i}" for i in range(10)}, eog=(9,))
    v.eos_id = v.eot_id = 9
    cur = cands([1.0] * 9 + [-20.0])
    Infill(v).apply(cur)
    assert list(cur.ids) == [9]
    assert cur.probs[0] == 1.0
