"""HF -> GGUF converter tests: the strongest oracle available — the
converted model's logits must match HF transformers' own forward pass
bit-for-bit-ish (<=1e-5), which pins down the rope permutation, name
mapping, and hparam plumbing. Also cross-checks the reference llama-cli
can load the produced file."""

import json
import os
import struct
import subprocess

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from tpullama.models import load_model  # noqa: E402
from tpullama.models.llama import llama_forward  # noqa: E402
from tpullama.tools.convert_hf import convert, parse_spm_model  # noqa: E402

LLAMA_CLI = os.environ.get("TPULLAMA_REF_CLI", "/tmp/refbuild/bin/llama-cli")


def _write_bpe_tokenizer(d):
    from tokenizers import Tokenizer, models, pre_tokenizers

    vocab = {chr(33 + i): i for i in range(256)}
    vocab.update({"<s>": 256, "</s>": 257})
    tok = Tokenizer(models.BPE(vocab=vocab, merges=[]))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.save(str(d) + "/tokenizer.json")
    json.dump({"add_bos_token": False}, open(str(d) + "/tokenizer_config.json", "w"))


def _logits_match(gguf_path, hf_model, ids):
    import jax.numpy as jnp

    with torch.no_grad():
        hf_logits = hf_model(torch.tensor([ids])).logits[0].numpy()
    m = load_model(gguf_path)
    hp = m.hparams
    B, T, S = 1, len(ids), 8
    kv_k = jnp.zeros((hp.n_layer, B, hp.n_head_kv, S, hp.n_embd_head_k), jnp.float32)
    kv_v = jnp.zeros((hp.n_layer, B, hp.n_head_kv, S, hp.n_embd_head_v), jnp.float32)
    toks = jnp.asarray([ids], jnp.int32)
    pos = jnp.arange(T, dtype=jnp.int32)[None]
    mask = jnp.where(
        jnp.arange(S)[None, None, None, :] <= pos[:, None, :, None], 0.0, -1e30
    ).astype(jnp.float32)
    mask = jnp.where(jnp.arange(S)[None, None, None, :] < T, mask, -1e30)
    if hp.n_swa and hp.swa_layers:
        # iswa models take (full, swa) masks; window >= seq here
        mask = (mask, mask)
    logits, _ = llama_forward(m.params, hp, toks, pos, kv_k, kv_v, pos, mask)
    ours = np.asarray(logits[0])
    assert np.abs(ours - hf_logits).max() < 1e-5
    assert (ours.argmax(-1) == hf_logits.argmax(-1)).all()


def _common_cfg(extra=None):
    base = dict(
        vocab_size=300, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, tie_word_embeddings=False,
    )
    base.update(extra or {})
    return base


@pytest.mark.parametrize("family", ["llama", "qwen3", "phi3"])
def test_convert_matches_transformers(tmp_path, family):
    torch.manual_seed(0)
    if family == "llama":
        from transformers import LlamaConfig, LlamaForCausalLM

        model = LlamaForCausalLM(LlamaConfig(**_common_cfg())).eval()
    elif family == "qwen3":
        from transformers import Qwen3Config, Qwen3ForCausalLM

        model = Qwen3ForCausalLM(Qwen3Config(**_common_cfg())).eval()
    else:
        from transformers import Phi3Config, Phi3ForCausalLM

        model = Phi3ForCausalLM(
            Phi3Config(**_common_cfg(dict(pad_token_id=0, bos_token_id=1,
                                          eos_token_id=2)))
        ).eval()
    d = tmp_path / family
    model.save_pretrained(str(d))
    _write_bpe_tokenizer(d)
    out = str(tmp_path / f"{family}.gguf")
    convert(str(d), out, outtype="f32", verbose=False)
    _logits_match(out, model, [5, 99, 200, 7, 42])


@pytest.mark.skipif(not os.path.exists(LLAMA_CLI), reason="reference cli not built")
def test_reference_loads_converted(tmp_path):
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    model = LlamaForCausalLM(LlamaConfig(**_common_cfg())).eval()
    d = tmp_path / "m"
    model.save_pretrained(str(d))
    _write_bpe_tokenizer(d)
    out = str(tmp_path / "m.gguf")
    convert(str(d), out, outtype="f16", verbose=False)
    r = subprocess.run(
        [LLAMA_CLI, "-m", out, "-p", "abc", "-n", "4", "--temp", "0",
         "-no-cnv", "--no-warmup"],
        capture_output=True, timeout=120,
    )
    assert r.returncode == 0, r.stderr[-1500:]


def test_spm_proto_parser(tmp_path):
    """Hand-encode a minimal sentencepiece ModelProto and parse it."""

    def varint(x):
        out = b""
        while True:
            b7 = x & 0x7F
            x >>= 7
            out += bytes([b7 | (0x80 if x else 0)])
            if not x:
                return out

    def piece(text, score, ptype):
        body = b"\x0a" + varint(len(text.encode())) + text.encode()
        body += b"\x15" + struct.pack("<f", score)
        body += b"\x18" + varint(ptype)
        return b"\x0a" + varint(len(body)) + body

    blob = piece("<unk>", 0.0, 2) + piece("<s>", 0.0, 3) + piece("hello", -2.5, 1)
    p = tmp_path / "tokenizer.model"
    p.write_bytes(blob)
    pieces = parse_spm_model(str(p))
    assert pieces == [("<unk>", 0.0, 2), ("<s>", 0.0, 3), ("hello", -2.5, 1)]


def test_unsupported_arch_raises(tmp_path):
    d = tmp_path / "x"
    d.mkdir()
    json.dump({"architectures": ["FrobnicatorForCausalLM"]}, open(d / "config.json", "w"))
    with pytest.raises(NotImplementedError, match="Frobnicator"):
        convert(str(d), str(tmp_path / "x.gguf"))


@pytest.mark.parametrize("family", ["gemma", "gemma2", "mixtral", "qwen2moe"])
def test_convert_new_families(tmp_path, family):
    torch.manual_seed(0)
    if family == "gemma":
        from transformers import GemmaConfig, GemmaForCausalLM

        model = GemmaForCausalLM(GemmaConfig(**_common_cfg(dict(
            head_dim=16, tie_word_embeddings=True)))).eval()
    elif family == "gemma2":
        from transformers import Gemma2Config, Gemma2ForCausalLM

        model = Gemma2ForCausalLM(Gemma2Config(**_common_cfg(dict(
            head_dim=16, tie_word_embeddings=True,
            query_pre_attn_scalar=16,  # = head_dim (the non-27B rule)
            sliding_window=256, attn_logit_softcapping=50.0,
            final_logit_softcapping=30.0)))).eval()
    elif family == "mixtral":
        from transformers import MixtralConfig, MixtralForCausalLM

        model = MixtralForCausalLM(MixtralConfig(**_common_cfg(dict(
            num_local_experts=4, num_experts_per_tok=2)))).eval()
    else:
        from transformers import Qwen2MoeConfig, Qwen2MoeForCausalLM

        model = Qwen2MoeForCausalLM(Qwen2MoeConfig(**_common_cfg(dict(
            num_experts=4, num_experts_per_tok=2, moe_intermediate_size=96,
            shared_expert_intermediate_size=128, norm_topk_prob=False,
            decoder_sparse_step=1)))).eval()
    d = tmp_path / family
    model.save_pretrained(str(d))
    _write_bpe_tokenizer(d)
    out = str(tmp_path / f"{family}.gguf")
    convert(str(d), out, outtype="f32", verbose=False)
    _logits_match(out, model, [5, 99, 200, 7, 42])


@pytest.mark.parametrize("family", ["mamba", "mamba2"])
def test_convert_ssm_matches_transformers(tmp_path, family):
    """Mamba/Mamba2 conversion: logits vs HF transformers' slow path
    (A_log -> -exp, conv1d squeeze, mamba2 head-shaped A/D + grouped
    ssm_norm)."""
    import jax.numpy as jnp

    from tpullama.models.mamba import init_states, mamba_forward

    torch.manual_seed(0)
    if family == "mamba":
        from transformers import MambaConfig, MambaForCausalLM

        model = MambaForCausalLM(MambaConfig(
            vocab_size=304, hidden_size=64, num_hidden_layers=2,
            state_size=16, conv_kernel=4)).eval()
    else:
        from transformers import Mamba2Config, Mamba2ForCausalLM

        model = Mamba2ForCausalLM(Mamba2Config(
            vocab_size=304, hidden_size=64, num_hidden_layers=2,
            head_dim=16, num_heads=8, n_groups=1, state_size=32,
            expand=2, conv_kernel=4)).eval()
    d = tmp_path / family
    model.save_pretrained(str(d))
    _write_bpe_tokenizer(d)
    out = str(tmp_path / f"{family}.gguf")
    convert(str(d), out, outtype="f32", verbose=False)

    ids = [5, 99, 200, 7, 42]
    with torch.no_grad():
        hf_logits = model(torch.tensor([ids])).logits[0].numpy()
    m = load_model(out)
    hp = m.hparams
    assert hp.arch == family and hp.is_recurrent
    assert hp.ssm_d_inner == 128
    conv, ssm = init_states(hp, 1)
    logits, _ = mamba_forward(
        m.params, hp, jnp.asarray([ids], jnp.int32), conv, ssm
    )
    ours = np.asarray(logits[0])
    assert np.abs(ours - hf_logits).max() < 1e-4
    assert (ours.argmax(-1) == hf_logits.argmax(-1)).all()


def test_convert_direct_to_quantized(tmp_path):
    """--outtype Q4_K_M produces the reference's per-tensor mix (output
    -> Q6_K, 1-D norms -> F32) and the file loads + runs."""
    from tpullama.gguf import GGUFReader
    from tpullama.gguf.constants import GGMLType
    from transformers import LlamaConfig, LlamaForCausalLM

    torch.manual_seed(0)
    # K-quant super-blocks need 256-divisible rows
    cfg = _common_cfg(dict(hidden_size=256, intermediate_size=512))
    model = LlamaForCausalLM(LlamaConfig(**cfg)).eval()
    d = tmp_path / "m"
    model.save_pretrained(str(d))
    _write_bpe_tokenizer(d)
    out = str(tmp_path / "m.q4km.gguf")
    convert(str(d), out, outtype="Q4_K_M", verbose=False)
    r = GGUFReader(out)
    # norms stay f32; attn_v upgrades (GQA 4/2 < 4 -> Q5_K); ffn_down
    # first 1/8 of layers upgrades to Q6_K
    assert r.tensors["blk.0.attn_norm.weight"].ggml_type == GGMLType.F32
    assert r.tensors["output.weight"].ggml_type == GGMLType.Q6_K
    assert r.tensors["blk.0.attn_v.weight"].ggml_type == GGMLType.Q5_K
    assert r.tensors["blk.0.ffn_down.weight"].ggml_type == GGMLType.Q6_K
    assert r.tensors["blk.1.ffn_down.weight"].ggml_type == GGMLType.Q4_K
    assert r.tensors["blk.0.attn_q.weight"].ggml_type == GGMLType.Q4_K
    m = load_model(out)
    assert m.hparams.n_layer == 2
