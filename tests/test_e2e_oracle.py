"""End-to-end oracle tests: our engine vs the reference's compiled
llama-cli on identical GGUF files (the tiny-real-model CI pattern of
SURVEY.md §4, with the reference binary as the oracle).

Greedy decode (--temp 0) must produce identical text for fp32 and for
every quantized weight type on the decode path.
"""

import os
import subprocess

import numpy as np
import pytest

from tpullama.gguf import GGMLType
from tpullama.models import load_model
from tpullama.models.testing import make_tiny_llama_gguf
from tpullama.runtime import Context, ContextParams

LLAMA_CLI = os.environ.get("TPULLAMA_REF_CLI", "/tmp/refbuild/bin/llama-cli")

needs_cli = pytest.mark.skipif(
    not os.path.exists(LLAMA_CLI), reason="reference llama-cli not built"
)

PROMPT = "Once upon a time"
N_PREDICT = 24


def run_reference(model_path: str, extra_args: tuple = ()) -> bytes:
    out = subprocess.run(
        [
            LLAMA_CLI, "-m", model_path, "-p", PROMPT, "-n", str(N_PREDICT),
            "--temp", "0", "-no-cnv", "--no-warmup", "--seed", "42",
            *extra_args,
        ],
        capture_output=True,
        timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    data = out.stdout
    # llama-cli echoes the prompt then generation (raw bytes: a random
    # model emits arbitrary byte tokens)
    idx = data.find(PROMPT.encode())
    assert idx >= 0, data
    return data[idx + len(PROMPT.encode()) :].rstrip(b"\n")


def _pieces_bytes(vocab, tokens) -> bytes:
    from tpullama.tokenizer.vocab import TokenAttr

    out = bytearray()
    for t in tokens:
        data = vocab.id_to_token[t]
        if data.attr & TokenAttr.BYTE:
            out.append(int(data.text[3:5], 16))
        else:
            out += vocab.token_to_piece(t, special=False).encode("utf-8")
    return bytes(out)


def run_ours(model_path: str) -> bytes:
    m = load_model(model_path)
    ctx = Context(m, ContextParams(n_ctx=128))
    toks = m.vocab.tokenize(PROMPT, add_special=True)
    out = ctx.generate(toks, n_predict=N_PREDICT)
    return _pieces_bytes(m.vocab, out)


@needs_cli
@pytest.mark.parametrize(
    "qtype,n_embd,n_ff",
    [
        (GGMLType.F32, 64, 128),
        (GGMLType.F16, 64, 128),
        (GGMLType.Q8_0, 64, 128),
        (GGMLType.Q4_0, 64, 128),
        (GGMLType.Q5_0, 64, 128),
        (GGMLType.Q4_K, 256, 256),
        (GGMLType.Q5_K, 256, 256),
        (GGMLType.Q6_K, 256, 256),
    ],
    ids=lambda v: v.name if isinstance(v, GGMLType) else str(v),
)
def test_greedy_matches_reference(tmp_path, qtype, n_embd, n_ff):
    path = str(tmp_path / f"tiny_{qtype.name}.gguf")
    make_tiny_llama_gguf(path, n_embd=n_embd, n_ff=n_ff, n_layer=2, qtype=qtype, seed=3)
    ref = run_reference(path)
    ours = run_ours(path)
    if qtype in (GGMLType.F32, GGMLType.F16):
        assert ours == ref, f"{qtype.name}: ours={ours!r} ref={ref!r}"
    else:
        # llama.cpp's CPU path quantizes *activations* to int8 for its
        # quantized dots; we compute exact fp32 on dequantized weights, so
        # occasional argmax flips from quantization noise are legitimate
        # and compound in free-running generation. Teacher-force the
        # reference's tokens instead and require near-total agreement.
        ref_toks = _bytes_to_byte_tokens(ref)
        m = load_model(path)
        ctx = Context(m, ContextParams(n_ctx=128))
        toks = m.vocab.tokenize(PROMPT, add_special=True)
        logits = ctx.decode(np.asarray(toks), n_logits=1)[-1]
        agree = 0
        for rt in ref_toks:
            agree += int(np.argmax(logits)) == rt
            logits = ctx.decode(np.asarray([rt]), n_logits=1)[-1]
        assert agree >= len(ref_toks) - 2, (
            f"{qtype.name}: teacher-forced agreement {agree}/{len(ref_toks)}; "
            f"ours={ours!r} ref={ref!r}"
        )


def _bytes_to_byte_tokens(data: bytes) -> list[int]:
    """Map reference output bytes back to the byte-vocab token ids
    (byte tokens are ids 3..258; '▁' (e2 96 81) is id 259)."""
    toks = []
    i = 0
    while i < len(data):
        if data[i : i + 3] == "▁".encode():
            toks.append(259)
            i += 3
        else:
            toks.append(3 + data[i])
            i += 1
    return toks


@needs_cli
def test_moe_matches_reference(tmp_path):
    """Mixtral-style MoE (arch 'llama' + expert tensors)."""
    path = str(tmp_path / "moe.gguf")
    make_tiny_llama_gguf(path, n_embd=64, n_layer=2, n_expert=4, n_expert_used=2, seed=5)
    assert run_ours(path) == run_reference(path)


@needs_cli
def test_qwen2_matches_reference(tmp_path):
    """Qwen2 arch: NEOX rope + QKV biases."""
    path = str(tmp_path / "qwen2.gguf")
    make_tiny_llama_gguf(path, n_embd=64, n_layer=2, seed=8, arch="qwen2")
    assert run_ours(path) == run_reference(path)


@needs_cli
@pytest.mark.parametrize("arch", ["qwen3", "phi3", "granite", "starcoder2", "olmo2",
                                  "internlm2", "orion", "stablelm", "mistral3"])
def test_new_archs_match_reference(tmp_path, arch):
    """qwen3: per-head q/k rms norm; phi3: fused qkv + fused swiglu;
    granite: embd/residual/attention/logit scales; starcoder2: LayerNorm
    with biases + non-gated GELU FFN; olmo2: post-norm blocks + full-width
    q/k norm.

    NUL bytes are stripped on both sides: llama-cli prints pieces with
    printf, so a generated <0x00> byte token produces no output there."""
    path = str(tmp_path / f"tiny_{arch}.gguf")
    make_tiny_llama_gguf(path, n_layer=2, arch=arch, seed=17)
    ours = run_ours(path).replace(b"\x00", b"")
    ref = run_reference(path).replace(b"\x00", b"")
    assert ours == ref


@needs_cli
@pytest.mark.parametrize("arch", ["gpt2", "falcon"])
def test_gpt2_falcon_match_reference(tmp_path, arch):
    """gpt2: learned positions + LN biases + fused qkv, no rope;
    falcon: parallel attn+ffn residual from the attn norm."""
    path = str(tmp_path / f"tiny_{arch}.gguf")
    make_tiny_llama_gguf(path, n_layer=2, arch=arch, seed=17, n_head_kv=4)
    ours = run_ours(path).replace(b"\x00", b"")
    ref = run_reference(path).replace(b"\x00", b"")
    assert ours == ref


@needs_cli
def test_phi2_matches_reference(tmp_path):
    """phi2: LN+biases, parallel attn/ffn from the attn norm, fused
    biased qkv, partial rope, biased lm head."""
    path = str(tmp_path / "tiny_phi2.gguf")
    make_tiny_llama_gguf(path, n_layer=2, arch="phi2", seed=17, n_head_kv=4)
    ours = run_ours(path).replace(b"\x00", b"")
    ref = run_reference(path).split(b" [end of text]")[0].replace(b"\x00", b"")
    assert ours == ref


@needs_cli
def test_gemma1_matches_reference(tmp_path):
    """Gemma v1: embd scale + GELU, tied output, MQA (1 kv head)."""
    path = str(tmp_path / "tiny_gemma.gguf")
    make_tiny_llama_gguf(path, n_layer=2, arch="gemma", seed=17, n_head_kv=1,
                         tied_output=True)
    ours = run_ours(path).replace(b"\x00", b"")
    ref = run_reference(path).replace(b"\x00", b"")
    assert ours == ref


@needs_cli
def test_qwen3moe_matches_reference(tmp_path):
    path = str(tmp_path / "tiny_qwen3moe.gguf")
    make_tiny_llama_gguf(path, n_layer=2, arch="qwen3moe", n_expert=4, seed=17)
    assert run_ours(path) == run_reference(path)


@needs_cli
def test_qwen2moe_matches_reference(tmp_path):
    """qwen2moe: un-renormalized top-k weights + sigmoid-gated shared
    expert. llama-cli prints a literal " [end of text]" marker on EOG."""
    path = str(tmp_path / "tiny_qwen2moe.gguf")
    make_tiny_llama_gguf(path, n_layer=2, arch="qwen2moe", n_expert=4, seed=17)
    ref = run_reference(path).split(b" [end of text]")[0]
    assert run_ours(path) == ref


@needs_cli
def test_gemma3_matches_reference(tmp_path):
    """Gemma3: embd scale, QK-norm, sandwich norms, alternating SWA with
    dual rope bases, GELU FFN."""
    path = str(tmp_path / "g3.gguf")
    make_tiny_llama_gguf(path, n_embd=64, n_layer=8, seed=70, arch="gemma3", n_ctx=256)
    assert run_ours(path) == run_reference(path)


def test_generate_deterministic(tmp_path):
    path = str(tmp_path / "tiny.gguf")
    make_tiny_llama_gguf(path, seed=5)
    m = load_model(path)
    toks = m.vocab.tokenize(PROMPT, add_special=True)
    outs = []
    for _ in range(2):
        ctx = Context(m, ContextParams(n_ctx=96))
        outs.append(ctx.generate(toks, n_predict=12))
    assert outs[0] == outs[1]


def test_prefill_decode_consistency(tmp_path):
    """Logits for the same token must agree whether it was processed in a
    prefill chunk or one-by-one decode (cache-correctness check)."""
    path = str(tmp_path / "tiny.gguf")
    make_tiny_llama_gguf(path, seed=7)
    m = load_model(path)
    toks = m.vocab.tokenize("The quick brown fox jumps", add_special=True)
    ctx_a = Context(m, ContextParams(n_ctx=96))
    la = ctx_a.decode(np.asarray(toks), n_logits=1)[-1]
    ctx_b = Context(m, ContextParams(n_ctx=96))
    for t in toks[:-1]:
        ctx_b.decode(np.asarray([t]), n_logits=1)
    lb = ctx_b.decode(np.asarray([toks[-1]]), n_logits=1)[-1]
    np.testing.assert_allclose(la, lb, rtol=2e-4, atol=2e-4)


def test_burst_matches_stepwise(tmp_path):
    """Fused on-device greedy bursts must equal step-by-step decoding."""
    path = str(tmp_path / "tiny.gguf")
    make_tiny_llama_gguf(path, seed=131)
    m = load_model(path)
    toks = m.vocab.tokenize(PROMPT, add_special=True)
    a = Context(m, ContextParams(n_ctx=96)).generate(toks, n_predict=18)
    b = Context(m, ContextParams(n_ctx=96)).generate(toks, n_predict=18, burst=7)
    assert a == b


@needs_cli
def test_gptoss_matches_reference(tmp_path):
    """gpt-oss (openai-moe): attention sinks, alternating SWA (pattern 2),
    qkv/o biases, router + per-expert biases, post-top-k softmax gating,
    swiglu_oai experts (models/openai-moe-iswa.cpp)."""
    path = str(tmp_path / "tiny_gptoss.gguf")
    make_tiny_llama_gguf(path, n_layer=4, arch="gpt-oss", n_expert=4, seed=23)
    ref = run_reference(path).split(b" [end of text]")[0]
    assert run_ours(path) == ref


@needs_cli
@pytest.mark.parametrize("arch,kw", [
    ("command-r", dict(tied_output=True)),
    ("cohere2", dict(tied_output=True, n_layer=5, n_ctx=256)),
    ("gptneox", dict(n_head_kv=4)),
    ("mpt", dict(n_head_kv=4, tied_output=True)),
    ("bloom", dict(n_head_kv=4, tied_output=True)),
])
def test_arch_batch_b_matches_reference(tmp_path, arch, kw):
    """command-r: LN + parallel residual + logit scale, tied head;
    cohere2: SWA pattern 4 with NoPE dense layers; gptneox: LN+bias,
    fused biased qkv, parallel residual with own ffn_norm, partial rope;
    mpt: ALiBi + clamp_kqv + full-width q/k LN; bloom: ALiBi + embedding
    LayerNorm."""
    path = str(tmp_path / f"tiny_{arch}.gguf")
    make_tiny_llama_gguf(path, n_layer=kw.pop("n_layer", 2), arch=arch, seed=29, **kw)
    ours = run_ours(path).replace(b"\x00", b"")
    ref = run_reference(path).split(b" [end of text]")[0].replace(b"\x00", b"")
    assert ours == ref


@needs_cli
@pytest.mark.parametrize("arch,kw", [
    ("olmo", dict(tied_output=True)),
    ("olmoe", dict(n_expert=4, n_head_kv=4)),
    ("nemotron", dict()),
    ("exaone", dict()),
    ("smollm3", dict(n_layer=5)),
    ("arcee", dict()),
    ("minicpm", dict(tied_output=True)),
])
def test_arch_batch_c_matches_reference(tmp_path, arch, kw):
    """olmo: non-parametric LayerNorm + clamp_kqv; olmoe: full-width q/k
    RMS norms + un-normalized MoE; nemotron: LN+bias + squared-relu FFN
    with biases; exaone: llama-like with NEOX rope; smollm3: NoPE every
    4th layer; arcee: squared-relu non-gated FFN; minicpm: granite scale
    stack with legacy defaults."""
    path = str(tmp_path / f"tiny_{arch}.gguf")
    make_tiny_llama_gguf(path, n_layer=kw.pop("n_layer", 2), arch=arch, seed=31, **kw)
    ours = run_ours(path).replace(b"\x00", b"")
    ref = run_reference(path).split(b" [end of text]")[0].replace(b"\x00", b"")
    assert ours == ref


@needs_cli
@pytest.mark.parametrize("arch,kw", [
    ("baichuan", dict(n_head_kv=4, n_layer=32)),
    ("baichuan", dict(n_head_kv=4, n_layer=40)),
    ("qwen", dict(n_head_kv=4)),
    ("starcoder", dict(n_head_kv=4, tied_output=True)),
    ("refact", dict(n_head_kv=4)),
    ("xverse", dict(n_head_kv=4)),
    ("ernie4_5", dict(n_head_kv=2)),
])
def test_arch_batch_d_matches_reference(tmp_path, arch, kw):
    """baichuan/xverse/ernie4_5: llama-like with NORM rope; qwen (v1):
    fused biased qkv + half-width gated FFN; starcoder (gpt-bigcode):
    learned positions + LN+bias + fused qkv; refact: ALiBi over RMS
    norms with gated silu."""
    path = str(tmp_path / f"tiny_{arch}.gguf")
    make_tiny_llama_gguf(path, n_layer=kw.pop("n_layer", 2), arch=arch, seed=37, **kw)
    ours = run_ours(path).replace(b"\x00", b"")
    ref = run_reference(path).split(b" [end of text]")[0].replace(b"\x00", b"")
    assert ours == ref


@needs_cli
@pytest.mark.parametrize("arch,kw", [
    ("chatglm", dict(n_head_kv=2)),
    ("glm4", dict(n_head_kv=2, tied_output=True)),
    ("seed_oss", dict(n_head_kv=2)),
    ("hunyuan-dense", dict(n_head_kv=2)),
])
def test_arch_batch_e_matches_reference(tmp_path, arch, kw):
    """chatglm: fused biased qkv + fused-swiglu FFN + half-dim NORM rope;
    glm4: post-attention/post-MLP norms; seed_oss: FFN pre-norm stored as
    post_attention_norm; hunyuan-dense: per-head q/k norms AFTER rope."""
    path = str(tmp_path / f"tiny_{arch}.gguf")
    make_tiny_llama_gguf(path, n_layer=kw.pop("n_layer", 2), arch=arch, seed=41, **kw)
    ours = run_ours(path).replace(b"\x00", b"")
    ref = run_reference(path).split(b" [end of text]")[0].replace(b"\x00", b"")
    assert ours == ref


@needs_cli
@pytest.mark.parametrize("arch,kw", [
    ("dbrx", dict(n_expert=4, n_head_kv=2)),
    ("jais", dict(n_head_kv=2)),
    ("grok", dict(n_expert=4, n_head_kv=2)),
    ("exaone4", dict(n_head_kv=2)),
    ("hunyuan-moe", dict(n_expert=4, n_head_kv=2)),
])
def test_arch_batch_f_matches_reference(tmp_path, arch, kw):
    """dbrx: LN + fused clamped qkv + softmax MoE with attn_output_norm as
    the FFN pre-norm; jais: ALiBi + fused biased qkv + gated FFN with
    gate/up/down biases + 1/D attention scale; grok: gelu MoE + parallel
    dense FFN at sqrt(2)/2, attention tanh softcap with output-scale,
    scaled embeddings/logits; exaone4: post-norm blocks with per-head qk
    norm; hunyuan-moe: post-rope qk norms + shared expert."""
    path = str(tmp_path / f"tiny_{arch}.gguf")
    make_tiny_llama_gguf(path, n_layer=kw.pop("n_layer", 2), arch=arch, seed=43, **kw)
    ours = run_ours(path).replace(b"\x00", b"")
    ref = run_reference(path).split(b" [end of text]")[0].replace(b"\x00", b"")
    assert ours == ref


@needs_cli
@pytest.mark.parametrize("arch,kw", [
    ("dots1", dict(n_expert=4, n_head_kv=4, n_layer=3)),  # dots1 wk/wv are full-width (MHA)
    ("glm4moe", dict(n_expert=4, n_head_kv=2, n_layer=3)),
    ("ernie4_5-moe", dict(n_expert=4, n_head_kv=2, n_layer=4)),
])
def test_arch_batch_g_matches_reference(tmp_path, arch, kw):
    """Heterogeneous dense/MoE stacks (per-layer list forward): dots1
    (dense lead + sigmoid gating + selection bias + shared expert),
    glm4moe (post_attention_norm as FFN norm, qkv biases, partial rope,
    trailing NextN layer skipped), ernie4_5-moe (interleaved MoE every
    2nd layer past the dense lead)."""
    path = str(tmp_path / f"tiny_{arch.replace('/', '_')}.gguf")
    make_tiny_llama_gguf(path, n_layer=kw.pop("n_layer", 2), arch=arch, seed=47, **kw)
    ours = run_ours(path).replace(b"\x00", b"")
    ref = run_reference(path).split(b" [end of text]")[0].replace(b"\x00", b"")
    assert ours == ref


@needs_cli
@pytest.mark.parametrize("arch,kw", [
    ("gemma2", dict(n_layer=4, tied_output=True)),
    ("arctic", dict(n_expert=4, n_head_kv=2)),
    ("bailingmoe", dict(n_expert=4, n_head_kv=2)),
    ("chameleon", dict(n_head_kv=2)),
    ("codeshell", dict(n_head_kv=2)),
])
def test_arch_batch_h_matches_reference(tmp_path, arch, kw):
    """gemma2: sandwich norms, alternating SWA, attn+final softcaps, GELU
    PAR FFN, tied output; arctic: parallel n_embd-wide dense FFN + MoE
    over the ffn_norm_exps-normed layer input; bailingmoe: n_rot head dim
    + softmax MoE (renormed, unscaled) + shared expert; chameleon:
    per-head LayerNorm qk norms pre-rope + image-logit suppression;
    codeshell: gpt2-style LN/biases but NEOX rope."""
    path = str(tmp_path / f"tiny_{arch}.gguf")
    make_tiny_llama_gguf(path, n_layer=kw.pop("n_layer", 2), arch=arch, seed=53, **kw)
    ours = run_ours(path).replace(b"\x00", b"")
    ref = run_reference(path).split(b" [end of text]")[0].replace(b"\x00", b"")
    assert ours == ref


@needs_cli
def test_chameleon_swin_matches_reference(tmp_path):
    """Chameleon swin_norm variant: attn/ffn norms applied to the block
    OUTPUTS before the residual adds (models/chameleon.cpp:27,107-136)."""
    path = str(tmp_path / "tiny_chameleon_swin.gguf")
    make_tiny_llama_gguf(path, n_layer=2, arch="chameleon", seed=54, n_head_kv=2,
                         extra_kv={"swin_norm": True})
    ours = run_ours(path).replace(b"\x00", b"")
    ref = run_reference(path).split(b" [end of text]")[0].replace(b"\x00", b"")
    assert ours == ref


@needs_cli
def test_openelm_matches_reference(tmp_path):
    """OpenELM: per-layer head counts and FFN widths (u32 arrays), fused
    head-major QKV, per-head-dim RMS qk norms, tied output."""
    from tpullama.models.testing import make_tiny_openelm_gguf

    path = str(tmp_path / "tiny_openelm.gguf")
    make_tiny_openelm_gguf(path, seed=55)
    ours = run_ours(path).replace(b"\x00", b"")
    ref = run_reference(path).split(b" [end of text]")[0].replace(b"\x00", b"")
    assert ours == ref


@needs_cli
def test_llama4_matches_reference(tmp_path):
    """Llama-4: interleaved MoE (sigmoid gating over raw-logit selection,
    input-side weights, shared expert), chunked-SWA pattern with NoPE
    every 4th layer, weightless post-rope qk norm."""
    path = str(tmp_path / "tiny_llama4.gguf")
    make_tiny_llama_gguf(path, n_layer=4, arch="llama4", seed=57, n_expert=4,
                         n_head_kv=2)
    ours = run_ours(path).replace(b"\x00", b"")
    ref = run_reference(path).split(b" [end of text]")[0].replace(b"\x00", b"")
    assert ours == ref


@needs_cli
def test_deci_matches_reference(tmp_path):
    """DeciLM / Nemotron-NAS: per-layer variable GQA with attention-free,
    linear-attention (wo only), and FFN-free (skipped) layers."""
    from tpullama.models.testing import make_tiny_deci_gguf

    path = str(tmp_path / "tiny_deci.gguf")
    make_tiny_deci_gguf(path, seed=58)
    ours = run_ours(path).replace(b"\x00", b"")
    ref = run_reference(path).split(b" [end of text]")[0].replace(b"\x00", b"")
    assert ours == ref


@needs_cli
@pytest.mark.parametrize("arch,kw", [
    ("plamo", dict(n_head_kv=4)),
    ("pangu-embedded", dict(n_head_kv=2)),
    ("smallthinker", dict(n_expert=4, n_head_kv=2, n_layer=8)),
])
def test_arch_batch_i_matches_reference(tmp_path, arch, kw):
    """plamo: parallel residual where the FFN reads the attn-norm output;
    pangu-embedded: required qkv/o biases; smallthinker: raw-layer-input
    MoE router, relu experts, il%4==0 NoPE + dense-first SWA."""
    path = str(tmp_path / f"tiny_{arch}.gguf")
    make_tiny_llama_gguf(path, n_layer=kw.pop("n_layer", 2), arch=arch, seed=63, **kw)
    ours = run_ours(path).replace(b"\x00", b"")
    ref = run_reference(path).split(b" [end of text]")[0].replace(b"\x00", b"")
    assert ours == ref


@needs_cli
@pytest.mark.parametrize("arch", ["plm", "minicpm3"])
def test_mla_lite_matches_reference(tmp_path, arch):
    """plm: MLA (plain Q) + relu^2 FFN; minicpm3: MLA (q-lora) + MiniCPM
    scale stack. Both tie the lm head."""
    from tpullama.models.testing import make_tiny_mla_lite_gguf

    path = str(tmp_path / f"tiny_{arch}.gguf")
    make_tiny_mla_lite_gguf(path, arch=arch, seed=64)
    ours = run_ours(path).replace(b"\x00", b"")
    # the reference's FA kernels reject these tiny MLA head dims; its
    # auto-probe asserts instead of falling back, so force FA off
    ref = run_reference(path, ("-fa", "off")).split(b" [end of text]")[0].replace(b"\x00", b"")
    assert ours == ref


@needs_cli
@pytest.mark.parametrize("arch,kw", [
    ("phimoe", dict(n_expert=4, n_head_kv=2)),
    ("minimax-m2", dict(n_expert=4, n_head_kv=2)),
    ("grovemoe", dict(n_expert=4, n_head_kv=2)),
    ("bailingmoe2", dict(n_expert=4, n_head_kv=2, n_layer=4)),
    ("afmoe", dict(n_expert=4, n_head_kv=2, n_layer=4)),
    ("apertus", dict(n_head_kv=2)),
])
def test_arch_batch_j_matches_reference(tmp_path, arch, kw):
    """phimoe: phi3 graph + biased RMS norms + softmax MoE; minimax-m2:
    full-width qk norms + selection-biased MoE; grovemoe: shared-router
    chunk adjustment experts (sigmoid selection, id division); bailingmoe2:
    fused qkv + qk norms + scaled MoE + NextN skip; afmoe: dual norms,
    gated attention output, NoPE/SWA pattern, dense lead; apertus:
    per-layer xIELU FFN."""
    path = str(tmp_path / f"tiny_{arch}.gguf")
    make_tiny_llama_gguf(path, n_layer=kw.pop("n_layer", 2), arch=arch, seed=67, **kw)
    ours = run_ours(path).replace(b"\x00", b"")
    ref = run_reference(path).split(b" [end of text]")[0].replace(b"\x00", b"")
    assert ours == ref


@needs_cli
def test_bitnet_matches_reference(tmp_path):
    """bitnet b1.58: scalar projection scales, attn/ffn sub-norms (RMS
    before the o/down projections), tied lm head."""
    path = str(tmp_path / "tiny_bitnet.gguf")
    make_tiny_llama_gguf(path, n_layer=2, arch="bitnet", seed=85, n_head_kv=2,
                         tied_output=True)
    ours = run_ours(path).replace(b"\x00", b"")
    ref = run_reference(path).split(b" [end of text]")[0].replace(b"\x00", b"")
    assert ours == ref


@needs_cli
def test_qwen2vl_text_matches_reference(tmp_path):
    """qwen2vl text path: M-RoPE with equal t/h/w positions reduces to
    NEOX rope; otherwise qwen2 (biased qkv)."""
    path = str(tmp_path / "tiny_qwen2vl.gguf")
    make_tiny_llama_gguf(path, n_layer=2, arch="qwen2vl", seed=87, n_head_kv=2)
    ours = run_ours(path).replace(b"\x00", b"")
    ref = run_reference(path).split(b" [end of text]")[0].replace(b"\x00", b"")
    assert ours == ref


@needs_cli
@pytest.mark.parametrize("arch,kw", [
    ("qwen3vl", dict(n_head_kv=2)),
    ("qwen3vlmoe", dict(n_expert=4, n_head_kv=2)),
])
def test_qwen3vl_text_matches_reference(tmp_path, arch, kw):
    """qwen3vl(-moe) text path: interleaved M-RoPE (IMROPE) — with text
    positions p_t=p_h=p_w and p_e=0 the rotation is NEOX with identity on
    the theta_e sectors; per-head qk norms (models/qwen3vl.cpp)."""
    path = str(tmp_path / f"tiny_{arch}.gguf")
    make_tiny_llama_gguf(path, n_layer=2, arch=arch, seed=91, **kw)
    ours = run_ours(path).replace(b"\x00", b"")
    ref = run_reference(path).split(b" [end of text]")[0].replace(b"\x00", b"")
    assert ours == ref


@needs_cli
def test_cogvlm_text_matches_reference(tmp_path):
    """cogvlm text path: fused unbiased wqkv (n_head_kv == n_head), NEOX
    rope, SwiGLU FFN; vision-expert tensors present but unused
    (models/cogvlm.cpp:32-44).

    Quirk: the reference's cogvlm builder never applies inp_out_ids
    (models/cogvlm.cpp has no get_rows on the last layer, unlike every
    other arch), so llama-cli samples the FIRST prompt position's logits
    for the first generated token. We keep the correct last-position
    behavior and mirror the quirk here by teacher-forcing the first token
    from our own row-0 logits — this still checks row-0 logit parity AND
    every subsequent decode step token-exactly."""
    path = str(tmp_path / "tiny_cogvlm.gguf")
    make_tiny_llama_gguf(path, n_layer=2, arch="cogvlm", seed=93, n_head_kv=4)

    m = load_model(path)
    ctx = Context(m, ContextParams(n_ctx=128))
    toks = m.vocab.tokenize(PROMPT, add_special=True)
    logits = ctx.decode(np.asarray(toks, np.int32), n_logits=len(toks))
    out = [int(np.argmax(logits[0]))]  # the reference's row-0 sample
    for _ in range(N_PREDICT - 1):
        lg = ctx.decode(np.asarray([out[-1]], np.int32), n_logits=1)
        out.append(int(np.argmax(lg[-1])))
    ours = _pieces_bytes(m.vocab, out).replace(b"\x00", b"")
    ref = run_reference(path).split(b" [end of text]")[0].replace(b"\x00", b"")
    assert ours == ref


@needs_cli
def test_gemma3n_matches_reference(tmp_path):
    """gemma3n: AltUp multi-stream residuals + LAUREL + per-layer input
    embeddings + activation sparsity + KV-cache sharing past layer 20
    (SWA layers reuse layer 18, full layers 19) + SWA pattern 5 with
    dual rope bases (models/gemma3n-iswa.cpp).

    A random gemma3n is numerically chaotic (the magnitude-ratio stream
    normalizations amplify rounding ~1e5x over 25 layers; the reference's
    OWN -fa on/off outputs diverge after ~11 greedy tokens), so this
    checks (a) exact agreement on an 8-token horizon — within the
    reference's self-agreement horizon — and (b) teacher-forced argmax
    agreement over 24 tokens with flips allowed only at noise-level
    top-2 gaps."""
    from tpullama.models.testing import make_tiny_gemma3n_gguf

    path = str(tmp_path / "tiny_gemma3n.gguf")
    make_tiny_gemma3n_gguf(path, seed=95)
    ref = run_reference(path).split(b" [end of text]")[0].replace(b"\x00", b"")
    m = load_model(path)
    ctx = Context(m, ContextParams(n_ctx=128))
    toks = m.vocab.tokenize(PROMPT, add_special=True)
    out = ctx.generate(list(toks), n_predict=N_PREDICT)
    ours = _pieces_bytes(m.vocab, out).replace(b"\x00", b"")
    assert ours[:8] == ref[:8], f"ours={ours!r} ref={ref!r}"

    ref_toks = _bytes_to_byte_tokens(ref)
    ctx2 = Context(m, ContextParams(n_ctx=128))
    logits = ctx2.decode(np.asarray(toks), n_logits=1)[-1]
    for step, rt in enumerate(ref_toks):
        srt = np.sort(logits)
        gap = float(srt[-1] - srt[-2])
        assert int(np.argmax(logits)) == rt or gap < 0.05, (
            f"step {step}: argmax {int(np.argmax(logits))} != ref {rt} "
            f"with top-2 gap {gap:.4f} (beyond noise)"
        )
        logits = ctx2.decode(np.asarray([rt]), n_logits=1)[-1]


@needs_cli
def test_granitemoe_matches_reference(tmp_path):
    """granitemoe: granite scale stack + softmax MoE with renormalized
    top-k and an ungated shared expert (models/granite.cpp:170-196)."""
    path = str(tmp_path / "tiny_granitemoe.gguf")
    make_tiny_llama_gguf(path, n_layer=2, arch="granitemoe", seed=97,
                         n_expert=4, n_head_kv=2)
    ours = run_ours(path).replace(b"\x00", b"")
    ref = run_reference(path).split(b" [end of text]")[0].replace(b"\x00", b"")
    assert ours == ref
