"""Converter parity vs the REFERENCE convert_hf_to_gguf.py: build a
synthetic HF checkpoint (raw safetensors — no transformers class
needed), convert it with BOTH converters, and compare the GGUFs
tensor-by-tensor and KV-by-KV. The strongest possible conversion
oracle, and it covers families transformers itself doesn't ship."""

import json
import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

from tpullama.gguf import GGUFReader
from tpullama.tools.convert_hf import convert

REF_CONVERT = "/root/reference/convert_hf_to_gguf.py"
REF_ENV = {**os.environ, "PYTHONPATH": "/root/reference/gguf-py"}

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_CONVERT), reason="reference converter absent"
)


def _write_bpe_tokenizer(d):
    sys.path.insert(0, os.path.dirname(__file__))
    from test_convert_hf_families import _write_bpe_tokenizer as w

    w(d)


def save_ckpt(d, config, tensors, vocab="bpe"):
    import torch
    from safetensors.torch import save_file

    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump(config, f)
    save_file({k: torch.tensor(np.ascontiguousarray(v))
               for k, v in tensors.items()},
              os.path.join(d, "model.safetensors"))
    from pathlib import Path

    if vocab == "bpe":
        _write_bpe_tokenizer(Path(d))
    elif vocab == "spm":
        write_spm_model(os.path.join(d, "tokenizer.model"),
                        spm_pieces(config.get("vocab_size", 261)))
    elif vocab == "none":
        pass


def ref_convert(d, out):
    shim = os.path.join(os.path.dirname(__file__), "_spshim")
    env = dict(REF_ENV)
    env["PYTHONPATH"] = f"/root/reference/gguf-py:{shim}"
    runner = os.path.join(shim, "run_ref_convert.py")
    r = subprocess.run(
        [sys.executable, runner, d, "--outfile", out, "--outtype", "f32"],
        capture_output=True, text=True, timeout=600, env=env,
    )
    if r.returncode != 0:
        raise AssertionError("reference converter failed:\n" + r.stderr[-2500:])
    return out


def _varint(n):
    out = b""
    while True:
        b = n & 0x7F
        n >>= 7
        out += bytes([b | (0x80 if n else 0)])
        if not n:
            return out


def write_spm_model(path, pieces):
    """Minimal sentencepiece ModelProto writer: repeated SentencePiece
    (field 1) with {1: piece, 2: score, 3: type}."""
    import struct

    blob = b""
    for piece, score, ptype in pieces:
        pb = piece.encode("utf-8")
        sub = (b"\x0a" + _varint(len(pb)) + pb
               + b"\x15" + struct.pack("<f", score)
               + b"\x18" + _varint(ptype))
        blob += b"\x0a" + _varint(len(sub)) + sub
    with open(path, "wb") as f:
        f.write(blob)


def spm_pieces(n_vocab=261):
    pieces = [("<unk>", 0.0, 2), ("<s>", 0.0, 3), ("</s>", 0.0, 3)]
    for b in range(256):
        pieces.append((f"<0x{b:02X}>", 0.0, 6))
    i = 0
    while len(pieces) < n_vocab:
        pieces.append((f"▁tok{i}", -float(i), 1))
        i += 1
    return pieces[:n_vocab]


SKIP_KV_PREFIXES = ("general.",)
# keys whose values are formatting/metadata choices, not model semantics
SKIP_KV = {"tokenizer.ggml.padding_token_id", "tokenizer.chat_template"}


def compare_ggufs(ref_path, our_path, rtol=1e-5, atol=1e-6):
    ref = GGUFReader(ref_path)
    ours = GGUFReader(our_path)
    problems = []
    for k, v in ref.kv.items():
        if k.startswith(SKIP_KV_PREFIXES) or k in SKIP_KV:
            continue
        if k == "tokenizer.ggml.pre" and v == "default":
            # the shim falls back to "default" for synthetic-vocab hashes
            # the reference can't know; ours keys pre off the arch
            continue
        ov = ours.kv.get(k, "<MISSING>")
        same = False
        try:
            if isinstance(v, (list, np.ndarray)):
                same = np.array_equal(np.asarray(v), np.asarray(ov))
            elif isinstance(v, float) or isinstance(ov, float):
                same = abs(float(v) - float(ov)) <= 1e-6 * max(1, abs(float(v)))
            else:
                same = v == ov
        except Exception:
            same = False
        if not same:
            problems.append(f"KV {k}: ref={v!r} ours={ov!r}")
    rn = set(ref.tensors)
    on = set(ours.tensors)
    for name in sorted(rn - on):
        problems.append(f"tensor only in ref: {name}")
    for name in sorted(on - rn):
        problems.append(f"tensor only in ours: {name}")
    for name in sorted(rn & on):
        a = ref.tensor_f32(name) if hasattr(ref, 'tensor_f32') else ref.tensor_dequant(name)
        b = ours.tensor_f32(name) if hasattr(ours, 'tensor_f32') else ours.tensor_dequant(name)
        if a.shape != b.shape:
            problems.append(f"{name}: shape ref={a.shape} ours={b.shape}")
        elif not np.allclose(np.asarray(a, np.float64),
                             np.asarray(b, np.float64), rtol=rtol, atol=atol):
            md = float(np.abs(np.asarray(a, np.float64)
                              - np.asarray(b, np.float64)).max())
            problems.append(f"{name}: value maxdiff {md}")
    assert not problems, "\n".join(problems[:40])


def rnd(rng, *shape, scale=0.05):
    return (rng.standard_normal(shape) * scale).astype(np.float32)


def llama_like_tensors(rng, L=2, V=261, E=64, H=4, KV=2, HD=16, F=128,
                       prefix="model.", bias=False, ln=False,
                       tied=False, qk_norm=False):
    t = {f"{prefix}embed_tokens.weight": rnd(rng, V, E),
         f"{prefix}norm.weight": 1.0 + rnd(rng, E)}
    if not tied:
        t["lm_head.weight"] = rnd(rng, V, E)
    for i in range(L):
        p = f"{prefix}layers.{i}."
        t[p + "input_layernorm.weight"] = 1.0 + rnd(rng, E)
        t[p + "post_attention_layernorm.weight"] = 1.0 + rnd(rng, E)
        t[p + "self_attn.q_proj.weight"] = rnd(rng, H * HD, E)
        t[p + "self_attn.k_proj.weight"] = rnd(rng, KV * HD, E)
        t[p + "self_attn.v_proj.weight"] = rnd(rng, KV * HD, E)
        t[p + "self_attn.o_proj.weight"] = rnd(rng, E, H * HD)
        t[p + "mlp.gate_proj.weight"] = rnd(rng, F, E)
        t[p + "mlp.up_proj.weight"] = rnd(rng, F, E)
        t[p + "mlp.down_proj.weight"] = rnd(rng, E, F)
        if ln:
            t[p + "input_layernorm.bias"] = rnd(rng, E)
            t[p + "post_attention_layernorm.bias"] = rnd(rng, E)
        if bias:
            for nm, n in (("q_proj", H * HD), ("k_proj", KV * HD),
                          ("v_proj", KV * HD), ("o_proj", E)):
                t[p + f"self_attn.{nm}.bias"] = rnd(rng, n)
        if qk_norm:
            t[p + "self_attn.q_norm.weight"] = 1.0 + rnd(rng, HD)
            t[p + "self_attn.k_norm.weight"] = 1.0 + rnd(rng, HD)
    if ln:
        t[f"{prefix}norm.bias"] = rnd(rng, E)
    return t


BASE_CFG = dict(
    vocab_size=261, hidden_size=64, num_hidden_layers=2,
    num_attention_heads=4, num_key_value_heads=2, intermediate_size=128,
    max_position_embeddings=256, rms_norm_eps=1e-5, rope_theta=10000.0,
    head_dim=16, bos_token_id=1, eos_token_id=2,
)


def run_case(tmp_path, name, config, tensors, vocab="bpe"):
    d = str(tmp_path / name)
    save_ckpt(d, config, tensors, vocab=vocab)
    ref_out = str(tmp_path / f"{name}_ref.gguf")
    our_out = str(tmp_path / f"{name}_ours.gguf")
    # ours first: the reference's in-place modify_tensors ops (e.g.
    # plamo2's `data_torch += 1.0`) write through its mmap'd
    # safetensors and would corrupt the checkpoint for the second run
    convert(d, our_out, outtype="f32", verbose=False)
    ref_convert(d, ref_out)
    compare_ggufs(ref_out, our_out)


def test_parity_llama(tmp_path):
    rng = np.random.default_rng(0)
    cfg = dict(BASE_CFG, architectures=["LlamaForCausalLM"],
               model_type="llama", tie_word_embeddings=False)
    run_case(tmp_path, "llama", cfg, llama_like_tensors(rng), vocab="spm")


def test_parity_xverse(tmp_path):
    rng = np.random.default_rng(1)
    cfg = dict(BASE_CFG, architectures=["XverseForCausalLM"],
               model_type="xverse", max_sequence_length=512,
               vocab_size=258)  # xverse's vocab walk indexes every id
    cfg.pop("head_dim")
    run_case(tmp_path, "xverse", cfg, llama_like_tensors(rng, V=258))


def test_parity_orion(tmp_path):
    rng = np.random.default_rng(2)
    cfg = dict(BASE_CFG, architectures=["OrionForCausalLM"],
               model_type="orion")
    cfg.pop("head_dim")
    run_case(tmp_path, "orion", cfg, llama_like_tensors(rng, ln=True),
             vocab="spm")


def test_parity_internlm3(tmp_path):
    rng = np.random.default_rng(3)
    cfg = dict(BASE_CFG, architectures=["InternLM3ForCausalLM"],
               model_type="internlm3")
    run_case(tmp_path, "internlm3", cfg, llama_like_tensors(rng),
             vocab="spm")


def test_parity_exaone(tmp_path):
    rng = np.random.default_rng(4)
    cfg = dict(vocab_size=261, hidden_size=64, num_layers=2,
               num_hidden_layers=2, num_attention_heads=4,
               num_key_value_heads=2, intermediate_size=128,
               max_position_embeddings=256, layer_norm_epsilon=1e-5,
               rope_theta=10000.0, activation_function="silu",
               architectures=["ExaoneForCausalLM"], model_type="exaone",
               bos_token_id=1, eos_token_id=2)
    t = {"transformer.wte.weight": rnd(rng, 261, 64),
         "transformer.ln_f.weight": 1.0 + rnd(rng, 64),
         "lm_head.weight": rnd(rng, 261, 64)}
    for i in range(2):
        p = f"transformer.h.{i}."
        t[p + "ln_1.weight"] = 1.0 + rnd(rng, 64)
        t[p + "ln_2.weight"] = 1.0 + rnd(rng, 64)
        t[p + "attn.attention.q_proj.weight"] = rnd(rng, 64, 64)
        t[p + "attn.attention.k_proj.weight"] = rnd(rng, 32, 64)
        t[p + "attn.attention.v_proj.weight"] = rnd(rng, 32, 64)
        t[p + "attn.attention.out_proj.weight"] = rnd(rng, 64, 64)
        t[p + "mlp.c_fc_0.weight"] = rnd(rng, 128, 64)
        t[p + "mlp.c_fc_1.weight"] = rnd(rng, 128, 64)
        t[p + "mlp.c_proj.weight"] = rnd(rng, 64, 128)
    run_case(tmp_path, "exaone", cfg, t)


def test_parity_pangu(tmp_path):
    rng = np.random.default_rng(5)
    cfg = dict(BASE_CFG, architectures=["PanguEmbeddedForCausalLM"],
               model_type="pangu_embedded")
    cfg.pop("head_dim")
    run_case(tmp_path, "pangu", cfg, llama_like_tensors(rng, bias=True),
             vocab="spm")


def test_parity_plm(tmp_path):
    rng = np.random.default_rng(6)
    kv_rank, qk_nope, qk_rope, v_hd, H = 32, 16, 8, 16, 4
    cfg = dict(vocab_size=261, hidden_size=64, num_hidden_layers=2,
               num_attention_heads=H, num_key_value_heads=H,
               intermediate_size=128, max_position_embeddings=256,
               rms_norm_eps=1e-5, rope_theta=10000.0,
               kv_lora_rank=kv_rank, qk_nope_head_dim=qk_nope,
               qk_rope_head_dim=qk_rope, v_head_dim=v_hd,
               architectures=["PLMForCausalLM"], model_type="plm",
               bos_token_id=1, eos_token_id=2)
    t = {"model.embed_tokens.weight": rnd(rng, 261, 64),
         "model.norm.weight": 1.0 + rnd(rng, 64),
         "lm_head.weight": rnd(rng, 261, 64)}
    for i in range(2):
        p = f"model.layers.{i}."
        t[p + "input_layernorm.weight"] = 1.0 + rnd(rng, 64)
        t[p + "post_attention_layernorm.weight"] = 1.0 + rnd(rng, 64)
        t[p + "self_attn.q_proj.weight"] = rnd(rng, H * (qk_nope + qk_rope), 64)
        t[p + "self_attn.kv_a_proj_with_mqa.weight"] = rnd(rng, kv_rank + qk_rope, 64)
        t[p + "self_attn.kv_a_layernorm.weight"] = 1.0 + rnd(rng, kv_rank)
        t[p + "self_attn.kv_b_proj.weight"] = rnd(rng, H * (qk_nope + v_hd), kv_rank)
        t[p + "self_attn.o_proj.weight"] = rnd(rng, 64, H * v_hd)
        t[p + "mlp.up_proj.weight"] = rnd(rng, 128, 64)
        t[p + "mlp.down_proj.weight"] = rnd(rng, 64, 128)
    run_case(tmp_path, "plm", cfg, t)


def test_parity_baichuan_wpack(tmp_path):
    rng = np.random.default_rng(7)
    cfg = dict(BASE_CFG, architectures=["BaiChuanForCausalLM"],
               model_type="baichuan", max_sequence_length=512,
               num_key_value_heads=4)
    cfg.pop("head_dim")
    t = llama_like_tensors(rng, KV=4)
    for i in range(2):
        p = f"model.layers.{i}.self_attn."
        q = t.pop(p + "q_proj.weight")
        k = t.pop(p + "k_proj.weight")
        v = t.pop(p + "v_proj.weight")
        t[p + "W_pack.weight"] = np.concatenate([q, k, v], axis=0)
    run_case(tmp_path, "baichuan", cfg, t, vocab="spm")


def test_parity_starcoder(tmp_path):
    rng = np.random.default_rng(8)
    E, H, L, V = 64, 4, 2, 261
    hd = E // H
    cfg = dict(vocab_size=V, n_embd=E, n_layer=L, n_head=H,
               n_positions=256, layer_norm_epsilon=1e-5, multi_query=True,
               architectures=["GPTBigCodeForCausalLM"],
               model_type="gpt_bigcode", bos_token_id=1, eos_token_id=2)
    t = {"transformer.wte.weight": rnd(rng, V, E),
         "transformer.wpe.weight": rnd(rng, 256, E),
         "transformer.ln_f.weight": 1.0 + rnd(rng, E),
         "transformer.ln_f.bias": rnd(rng, E),
         "lm_head.weight": rnd(rng, V, E)}
    for i in range(L):
        p = f"transformer.h.{i}."
        t[p + "ln_1.weight"] = 1.0 + rnd(rng, E)
        t[p + "ln_1.bias"] = rnd(rng, E)
        t[p + "ln_2.weight"] = 1.0 + rnd(rng, E)
        t[p + "ln_2.bias"] = rnd(rng, E)
        t[p + "attn.c_attn.weight"] = rnd(rng, E + 2 * hd, E)
        t[p + "attn.c_attn.bias"] = rnd(rng, E + 2 * hd)
        t[p + "attn.c_proj.weight"] = rnd(rng, E, E)
        t[p + "attn.c_proj.bias"] = rnd(rng, E)
        t[p + "mlp.c_fc.weight"] = rnd(rng, 4 * E, E)
        t[p + "mlp.c_fc.bias"] = rnd(rng, 4 * E)
        t[p + "mlp.c_proj.weight"] = rnd(rng, E, 4 * E)
        t[p + "mlp.c_proj.bias"] = rnd(rng, E)
    run_case(tmp_path, "starcoder", cfg, t)


def test_parity_refact(tmp_path):
    rng = np.random.default_rng(9)
    E, H, L, V = 64, 4, 2, 261
    hd = E // H
    ff = 256 * ((int(2 * (4 * E) / 3) + 255) // 256)
    cfg = dict(vocab_size=V, n_embd=E, n_layer=L, n_head=H,
               n_positions=256, layer_norm_epsilon=1e-5,
               architectures=["GPTRefactForCausalLM"], model_type="gpt_refact",
               bos_token_id=1, eos_token_id=2)
    t = {"transformer.wte.weight": rnd(rng, V, E),
         "transformer.ln_f.weight": 1.0 + rnd(rng, E),
         "lm_head.weight": rnd(rng, V, E)}
    for i in range(L):
        p = f"transformer.h.{i}."
        t[p + "ln_1.weight"] = 1.0 + rnd(rng, E)
        t[p + "ln_2.weight"] = 1.0 + rnd(rng, E)
        t[p + "attn.q.weight"] = rnd(rng, E, E)
        t[p + "attn.kv.weight"] = rnd(rng, 2 * hd, E)
        t[p + "attn.c_proj.weight"] = rnd(rng, E, E)
        t[p + "mlp.gate_up_proj.weight"] = rnd(rng, 2 * ff, E)
        t[p + "mlp.c_proj.weight"] = rnd(rng, E, ff)
    run_case(tmp_path, "refact", cfg, t)


def test_parity_jais(tmp_path):
    rng = np.random.default_rng(10)
    E, H, L, V = 64, 4, 2, 261
    cfg = dict(vocab_size=V, n_embd=E, n_layer=L, n_head=H,
               n_positions=256, n_inner=128, layer_norm_epsilon=1e-5,
               activation_function="swiglu", position_embedding_type="alibi",
               mup_embeddings_scale=2.0, mup_output_alpha=0.5,
               mup_width_scale=0.25,
               architectures=["JAISLMHeadModel"], model_type="jais",
               bos_token_id=1, eos_token_id=2)
    t = {"transformer.wte.weight": rnd(rng, V, E),
         "transformer.ln_f.weight": 1.0 + rnd(rng, E),
         "transformer.ln_f.bias": rnd(rng, E),
         "lm_head.weight": rnd(rng, V, E)}
    for i in range(L):
        p = f"transformer.h.{i}."
        t[p + "ln_1.weight"] = 1.0 + rnd(rng, E)
        t[p + "ln_1.bias"] = rnd(rng, E)
        t[p + "ln_2.weight"] = 1.0 + rnd(rng, E)
        t[p + "ln_2.bias"] = rnd(rng, E)
        # jais uses Conv1D layout (in, out) — stored transposed
        t[p + "attn.c_attn.weight"] = rnd(rng, E, 3 * E)
        t[p + "attn.c_attn.bias"] = rnd(rng, 3 * E)
        t[p + "attn.c_proj.weight"] = rnd(rng, E, E)
        t[p + "attn.c_proj.bias"] = rnd(rng, E)
        t[p + "mlp.c_fc.weight"] = rnd(rng, E, 128)
        t[p + "mlp.c_fc.bias"] = rnd(rng, 128)
        t[p + "mlp.c_fc2.weight"] = rnd(rng, E, 128)
        t[p + "mlp.c_fc2.bias"] = rnd(rng, 128)
        t[p + "mlp.c_proj.weight"] = rnd(rng, 128, E)
        t[p + "mlp.c_proj.bias"] = rnd(rng, E)
    run_case(tmp_path, "jais", cfg, t)


def test_parity_bitnet(tmp_path):
    rng = np.random.default_rng(11)
    cfg = dict(BASE_CFG, architectures=["BitnetForCausalLM"],
               model_type="bitnet")
    cfg.pop("head_dim")
    t = llama_like_tensors(rng, tied=True)
    for i in range(2):
        p = f"model.layers.{i}."
        t[p + "self_attn.inner_attn_ln.weight"] = 1.0 + rnd(rng, 64)
        t[p + "mlp.ffn_layernorm.weight"] = 1.0 + rnd(rng, 128)
    run_case(tmp_path, "bitnet", cfg, t, vocab="spm")


def test_parity_grok(tmp_path):
    rng = np.random.default_rng(12)
    E, H, L, V, F = 64, 4, 2, 261, 128
    cfg = dict(vocab_size=V, hidden_size=E, num_hidden_layers=L,
               num_attention_heads=H, num_key_value_heads=2,
               intermediate_size=F, max_position_embeddings=256,
               rms_norm_eps=1e-5, rope_theta=10000.0,
               num_local_experts=4, num_experts_per_tok=2,
               embedding_multiplier_scale=78.38, output_multiplier_scale=0.5,
               attn_output_multiplier=0.08838,
               architectures=["GrokForCausalLM"], model_type="grok-1",
               bos_token_id=1, eos_token_id=2)
    hd = E // H
    t = {"model.embed_tokens.weight": rnd(rng, V, E),
         "model.norm.weight": 1.0 + rnd(rng, E),
         "lm_head.weight": rnd(rng, V, E)}
    for i in range(L):
        p = f"model.layers.{i}."
        t[p + "pre_attn_norm.weight"] = 1.0 + rnd(rng, E)
        t[p + "post_attn_norm.weight"] = 1.0 + rnd(rng, E)
        t[p + "pre_moe_norm.weight"] = 1.0 + rnd(rng, E)
        t[p + "post_moe_norm.weight"] = 1.0 + rnd(rng, E)
        t[p + "self_attn.q_proj.weight"] = rnd(rng, H * hd, E)
        t[p + "self_attn.k_proj.weight"] = rnd(rng, 2 * hd, E)
        t[p + "self_attn.v_proj.weight"] = rnd(rng, 2 * hd, E)
        t[p + "self_attn.o_proj.weight"] = rnd(rng, E, H * hd)
        t[p + "block_sparse_moe.gate.weight"] = rnd(rng, 4, E)
        for x in range(4):
            q = f"{p}block_sparse_moe.experts.{x}."
            t[q + "w1.weight"] = rnd(rng, F, E)
            t[q + "w2.weight"] = rnd(rng, E, F)
            t[q + "w3.weight"] = rnd(rng, F, E)
    run_case(tmp_path, "grok", cfg, t, vocab="spm")


def test_parity_t5(tmp_path):
    rng = np.random.default_rng(13)
    D, H, DKV, FF, L, V = 64, 4, 16, 128, 2, 261
    cfg = dict(vocab_size=V, d_model=D, d_kv=DKV, d_ff=FF, num_layers=L,
               num_decoder_layers=L, num_heads=H,
               relative_attention_num_buckets=8,
               layer_norm_epsilon=1e-6, decoder_start_token_id=0,
               eos_token_id=2, pad_token_id=0, is_gated_act=False,
               feed_forward_proj="relu",
               architectures=["T5ForConditionalGeneration"], model_type="t5")
    t = {"shared.weight": rnd(rng, V, D),
         "encoder.final_layer_norm.weight": 1.0 + rnd(rng, D),
         "decoder.final_layer_norm.weight": 1.0 + rnd(rng, D),
         "lm_head.weight": rnd(rng, V, D)}
    for i in range(L):
        e = f"encoder.block.{i}."
        t[e + "layer.0.layer_norm.weight"] = 1.0 + rnd(rng, D)
        t[e + "layer.0.SelfAttention.q.weight"] = rnd(rng, H * DKV, D)
        t[e + "layer.0.SelfAttention.k.weight"] = rnd(rng, H * DKV, D)
        t[e + "layer.0.SelfAttention.v.weight"] = rnd(rng, H * DKV, D)
        t[e + "layer.0.SelfAttention.o.weight"] = rnd(rng, D, H * DKV)
        if i == 0:
            t[e + "layer.0.SelfAttention.relative_attention_bias.weight"] = \
                rnd(rng, 8, H)
        t[e + "layer.1.layer_norm.weight"] = 1.0 + rnd(rng, D)
        t[e + "layer.1.DenseReluDense.wi.weight"] = rnd(rng, FF, D)
        t[e + "layer.1.DenseReluDense.wo.weight"] = rnd(rng, D, FF)
        d = f"decoder.block.{i}."
        t[d + "layer.0.layer_norm.weight"] = 1.0 + rnd(rng, D)
        t[d + "layer.0.SelfAttention.q.weight"] = rnd(rng, H * DKV, D)
        t[d + "layer.0.SelfAttention.k.weight"] = rnd(rng, H * DKV, D)
        t[d + "layer.0.SelfAttention.v.weight"] = rnd(rng, H * DKV, D)
        t[d + "layer.0.SelfAttention.o.weight"] = rnd(rng, D, H * DKV)
        if i == 0:
            t[d + "layer.0.SelfAttention.relative_attention_bias.weight"] = \
                rnd(rng, 8, H)
        t[d + "layer.1.layer_norm.weight"] = 1.0 + rnd(rng, D)
        t[d + "layer.1.EncDecAttention.q.weight"] = rnd(rng, H * DKV, D)
        t[d + "layer.1.EncDecAttention.k.weight"] = rnd(rng, H * DKV, D)
        t[d + "layer.1.EncDecAttention.v.weight"] = rnd(rng, H * DKV, D)
        t[d + "layer.1.EncDecAttention.o.weight"] = rnd(rng, D, H * DKV)
        t[d + "layer.2.layer_norm.weight"] = 1.0 + rnd(rng, D)
        t[d + "layer.2.DenseReluDense.wi.weight"] = rnd(rng, FF, D)
        t[d + "layer.2.DenseReluDense.wo.weight"] = rnd(rng, D, FF)
    run_case(tmp_path, "t5", cfg, t, vocab="spm")


# --- round-3b tranche: MoE + diffusion families -------------------------

def moe_layer_tensors(rng, p, E=64, F=64, n_exp=4, module="mlp",
                      shared=False, chunk=False):
    """Per-expert gate/up/down + router for one MoE layer."""
    t = {f"model.layers.{p}.{module}.gate.weight": rnd(rng, n_exp, E)}
    for x in range(n_exp):
        q = f"model.layers.{p}.{module}.experts.{x}."
        t[q + "gate_proj.weight"] = rnd(rng, F, E)
        t[q + "up_proj.weight"] = rnd(rng, F, E)
        t[q + "down_proj.weight"] = rnd(rng, E, F)
    if shared:
        q = f"model.layers.{p}.{module}.shared_experts."
        t[q + "gate_proj.weight"] = rnd(rng, F, E)
        t[q + "up_proj.weight"] = rnd(rng, F, E)
        t[q + "down_proj.weight"] = rnd(rng, E, F)
    if chunk:
        for x in range(n_exp // 2):
            q = f"model.layers.{p}.{module}.chunk_experts.{x}."
            t[q + "gate_proj.weight"] = rnd(rng, F, E)
            t[q + "up_proj.weight"] = rnd(rng, F, E)
            t[q + "down_proj.weight"] = rnd(rng, E, F)
    return t


def test_parity_ernie45_moe(tmp_path):
    rng = np.random.default_rng(30)
    cfg = dict(BASE_CFG, architectures=["Ernie4_5_MoeForCausalLM"],
               model_type="ernie4_5_moe", moe_num_experts=4, moe_k=2,
               moe_layer_interval=1, moe_layer_start_index=1,
               moe_intermediate_size=64, moe_num_shared_experts=1,
               tie_word_embeddings=False)
    t = llama_like_tensors(rng)
    # layer 1 becomes MoE: drop its dense mlp, add router + experts
    for nm in ("gate_proj", "up_proj", "down_proj"):
        del t[f"model.layers.1.mlp.{nm}.weight"]
    t.update(moe_layer_tensors(rng, 1, shared=True))
    t["model.layers.1.mlp.moe_statics.e_score_correction_bias"] = \
        rnd(rng, 1, 4)
    run_case(tmp_path, "ernie45moe", cfg, t, vocab="spm")


def test_parity_bailingmoe(tmp_path):
    rng = np.random.default_rng(31)
    E, H, KV, HD = 64, 4, 2, 16
    cfg = dict(BASE_CFG, architectures=["BailingMoeForCausalLM"],
               model_type="bailing_moe", num_experts=4,
               num_experts_per_tok=2, moe_intermediate_size=64,
               num_shared_experts=1, first_k_dense_replace=0,
               norm_topk_prob=True, norm_head=True,
               tie_word_embeddings=False)
    t = {"model.word_embeddings.weight": rnd(rng, 261, E),
         "model.norm.weight": 1.0 + rnd(rng, E),
         "lm_head.weight": rnd(rng, 261, E)}
    for i in range(2):
        p = f"model.layers.{i}."
        t[p + "input_layernorm.weight"] = 1.0 + rnd(rng, E)
        t[p + "post_attention_layernorm.weight"] = 1.0 + rnd(rng, E)
        t[p + "attention.query_key_value.weight"] = \
            rnd(rng, (H + 2 * KV) * HD, E)
        t[p + "attention.dense.weight"] = rnd(rng, E, H * HD)
        t.update(moe_layer_tensors(rng, i, shared=True))
    run_case(tmp_path, "bailingmoe", cfg, t)


def test_parity_grovemoe(tmp_path):
    rng = np.random.default_rng(32)
    cfg = dict(BASE_CFG, architectures=["GroveMoeForCausalLM"],
               model_type="grove_moe", num_experts=4,
               num_experts_per_tok=2, moe_intermediate_size=64,
               tie_word_embeddings=False)
    t = llama_like_tensors(rng, qk_norm=True)
    for i in range(2):
        for nm in ("gate_proj", "up_proj", "down_proj"):
            del t[f"model.layers.{i}.mlp.{nm}.weight"]
        t.update(moe_layer_tensors(rng, i, chunk=True))
    run_case(tmp_path, "grovemoe", cfg, t)


def test_parity_afmoe(tmp_path):
    rng = np.random.default_rng(33)
    E, H, KV, HD, F = 64, 4, 2, 16, 64
    cfg = dict(BASE_CFG, architectures=["AfmoeForCausalLM"],
               model_type="afmoe", num_experts=4, num_experts_per_tok=2,
               moe_intermediate_size=64, num_shared_experts=1,
               num_dense_layers=1, route_norm=True, route_scale=2.5,
               sliding_window=128, tie_word_embeddings=False)
    t = {"model.embed_tokens.weight": rnd(rng, 261, E),
         "model.norm.weight": 1.0 + rnd(rng, E),
         "lm_head.weight": rnd(rng, 261, E)}
    for i in range(2):
        p = f"model.layers.{i}."
        t[p + "input_layernorm.weight"] = 1.0 + rnd(rng, E)
        t[p + "post_attention_layernorm.weight"] = 1.0 + rnd(rng, E)
        t[p + "pre_mlp_layernorm.weight"] = 1.0 + rnd(rng, E)
        t[p + "post_mlp_layernorm.weight"] = 1.0 + rnd(rng, E)
        t[p + "self_attn.q_proj.weight"] = rnd(rng, H * HD, E)
        t[p + "self_attn.k_proj.weight"] = rnd(rng, KV * HD, E)
        t[p + "self_attn.v_proj.weight"] = rnd(rng, KV * HD, E)
        t[p + "self_attn.o_proj.weight"] = rnd(rng, E, H * HD)
        t[p + "self_attn.gate_proj.weight"] = rnd(rng, H * HD, E)
        t[p + "self_attn.q_norm.weight"] = 1.0 + rnd(rng, HD)
        t[p + "self_attn.k_norm.weight"] = 1.0 + rnd(rng, HD)
        if i == 0:  # leading dense layer
            t[p + "mlp.gate_proj.weight"] = rnd(rng, F, E)
            t[p + "mlp.up_proj.weight"] = rnd(rng, F, E)
            t[p + "mlp.down_proj.weight"] = rnd(rng, E, F)
        else:
            t[p + "mlp.router.gate.weight"] = rnd(rng, 4, E)
            t[p + "mlp.expert_bias"] = rnd(rng, 4)
            for x in range(4):
                q = f"{p}mlp.experts.{x}."
                t[q + "gate_proj.weight"] = rnd(rng, F, E)
                t[q + "up_proj.weight"] = rnd(rng, F, E)
                t[q + "down_proj.weight"] = rnd(rng, E, F)
            q = f"{p}mlp.shared_experts."
            t[q + "gate_proj.weight"] = rnd(rng, F, E)
            t[q + "up_proj.weight"] = rnd(rng, F, E)
            t[q + "down_proj.weight"] = rnd(rng, E, F)
    run_case(tmp_path, "afmoe", cfg, t)


def test_parity_dream(tmp_path):
    rng = np.random.default_rng(34)
    cfg = dict(BASE_CFG, architectures=["DreamModel"],
               model_type="dream", mask_token_id=259,
               tie_word_embeddings=False)
    run_case(tmp_path, "dream", cfg, llama_like_tensors(rng, bias=True))


def test_parity_llada(tmp_path):
    rng = np.random.default_rng(35)
    E, H, KV, HD, F = 64, 4, 2, 16, 128
    cfg = dict(architectures=["LLaDAModelLM"], model_type="llada",
               vocab_size=261, d_model=E, n_layers=2, n_heads=H,
               n_kv_heads=KV, mlp_hidden_size=F,
               max_sequence_length=256, rms_norm_eps=1e-5,
               rope_theta=10000.0, bos_token_id=1, eos_token_id=2)
    t = {"model.transformer.wte.weight": rnd(rng, 261, E),
         "model.transformer.ln_f.weight": 1.0 + rnd(rng, E),
         "model.transformer.ff_out.weight": rnd(rng, 261, E)}
    for i in range(2):
        p = f"model.transformer.blocks.{i}."
        t[p + "attn_norm.weight"] = 1.0 + rnd(rng, E)
        t[p + "ff_norm.weight"] = 1.0 + rnd(rng, E)
        t[p + "q_proj.weight"] = rnd(rng, H * HD, E)
        t[p + "k_proj.weight"] = rnd(rng, KV * HD, E)
        t[p + "v_proj.weight"] = rnd(rng, KV * HD, E)
        t[p + "attn_out.weight"] = rnd(rng, E, H * HD)
        t[p + "ff_proj.weight"] = rnd(rng, F, E)
        t[p + "up_proj.weight"] = rnd(rng, F, E)
        t[p + "ff_out.weight"] = rnd(rng, E, F)
    run_case(tmp_path, "llada", cfg, t)


def test_parity_llada_moe(tmp_path):
    rng = np.random.default_rng(36)
    cfg = dict(BASE_CFG, architectures=["LLaDAMoEModel"],
               model_type="llada_moe", num_experts=4,
               num_experts_per_tok=2, expert_intermediate_size=64,
               tie_word_embeddings=False)
    t = llama_like_tensors(rng, qk_norm=True)
    for i in range(2):
        for nm in ("gate_proj", "up_proj", "down_proj"):
            del t[f"model.layers.{i}.mlp.{nm}.weight"]
        t.update(moe_layer_tensors(rng, i))
    run_case(tmp_path, "lladamoe", cfg, t)


def test_parity_openelm(tmp_path):
    rng = np.random.default_rng(37)
    E, HD = 64, 16
    n_q, n_kv = [4, 4], [2, 2]
    mult, div = [1.0, 2.0], 32
    cfg = dict(architectures=["OpenELMForCausalLM"], model_type="openelm",
               vocab_size=261, model_dim=E, num_transformer_layers=2,
               num_query_heads=n_q, num_kv_heads=n_kv, head_dim=HD,
               ffn_multipliers=mult, ffn_dim_divisor=div,
               max_context_length=256, rope_freq_constant=10000,
               bos_token_id=1, eos_token_id=2)
    ffn = [64, 128]  # make_divisible(m * E, 32)
    t = {"transformer.token_embeddings.weight": rnd(rng, 261, E),
         "transformer.norm.weight": 1.0 + rnd(rng, E)}
    for i in range(2):
        p = f"transformer.layers.{i}."
        t[p + "attn_norm.weight"] = 1.0 + rnd(rng, E)
        t[p + "ffn_norm.weight"] = 1.0 + rnd(rng, E)
        t[p + "attn.qkv_proj.weight"] = rnd(rng, (n_q[i] + 2 * n_kv[i]) * HD, E)
        t[p + "attn.out_proj.weight"] = rnd(rng, E, n_q[i] * HD)
        t[p + "attn.q_norm.weight"] = 1.0 + rnd(rng, HD)
        t[p + "attn.k_norm.weight"] = 1.0 + rnd(rng, HD)
        t[p + "ffn.proj_1.weight"] = rnd(rng, 2 * ffn[i], E)
        t[p + "ffn.proj_2.weight"] = rnd(rng, E, ffn[i])
    run_case(tmp_path, "openelm", cfg, t, vocab="spm")


def test_parity_nemotron_h(tmp_path):
    rng = np.random.default_rng(38)
    E, H, KV, HD = 64, 4, 2, 16
    d_state, n_group, n_sh, hd_ssm = 32, 1, 2, 64
    d_inner = n_sh * hd_ssm
    cfg = dict(architectures=["NemotronHForCausalLM"],
               model_type="nemotron_h", vocab_size=261, hidden_size=E,
               num_hidden_layers=3, num_attention_heads=H,
               num_key_value_heads=KV, intermediate_size=128,
               attention_head_dim=HD, hybrid_override_pattern="M*-",
               mamba_num_heads=n_sh, mamba_head_dim=hd_ssm,
               ssm_state_size=d_state, conv_kernel=4, n_groups=n_group,
               max_position_embeddings=4096, rms_norm_eps=1e-5,
               bos_token_id=1, eos_token_id=2, hidden_act="silu",
               tie_word_embeddings=False)
    conv_dim = d_inner + 2 * n_group * d_state
    t = {"backbone.embeddings.weight": rnd(rng, 264, E),
         "backbone.norm_f.weight": 1.0 + rnd(rng, E),
         "lm_head.weight": rnd(rng, 264, E)}
    for i in range(3):
        t[f"backbone.layers.{i}.norm.weight"] = 1.0 + rnd(rng, E)
    # layer 0: mamba2 mixer
    p = "backbone.layers.0.mixer."
    t[p + "in_proj.weight"] = rnd(rng, 2 * d_inner + 2 * n_group * d_state
                                  + n_sh, E)
    t[p + "conv1d.weight"] = rnd(rng, conv_dim, 1, 4)
    t[p + "conv1d.bias"] = rnd(rng, conv_dim)
    t[p + "dt_bias"] = rnd(rng, n_sh)
    t[p + "A_log"] = rnd(rng, n_sh)
    t[p + "D"] = rnd(rng, n_sh)
    t[p + "norm.weight"] = 1.0 + rnd(rng, d_inner)
    t[p + "out_proj.weight"] = rnd(rng, E, d_inner)
    # layer 1: attention
    p = "backbone.layers.1.mixer."
    t[p + "q_proj.weight"] = rnd(rng, H * HD, E)
    t[p + "k_proj.weight"] = rnd(rng, KV * HD, E)
    t[p + "v_proj.weight"] = rnd(rng, KV * HD, E)
    t[p + "o_proj.weight"] = rnd(rng, E, H * HD)
    # layer 2: relu2 MLP (up/down only)
    p = "backbone.layers.2.mixer."
    t[p + "up_proj.weight"] = rnd(rng, 128, E)
    t[p + "down_proj.weight"] = rnd(rng, E, 128)
    run_case(tmp_path, "nemotronh", cfg, t)


def test_parity_falcon_h1(tmp_path):
    rng = np.random.default_rng(39)
    E, H, KV, HD = 64, 4, 2, 16
    d_inner, d_state, n_group, d_head = 128, 32, 1, 32
    cfg = dict(architectures=["FalconH1ForCausalLM"],
               model_type="falcon_h1", vocab_size=261, hidden_size=E,
               num_hidden_layers=2, num_attention_heads=H,
               num_key_value_heads=KV, head_dim=HD, intermediate_size=128,
               mamba_d_ssm=d_inner, mamba_d_state=d_state,
               mamba_n_groups=n_group, mamba_d_head=d_head,
               mamba_d_conv=4, max_position_embeddings=512,
               rms_norm_eps=1e-5, rope_theta=10000.0,
               attention_in_multiplier=1.5, attention_out_multiplier=0.5,
               ssm_in_multiplier=1.25, ssm_out_multiplier=0.75,
               mlp_multipliers=[1.1, 0.9],
               ssm_multipliers=[1.0, 1.2, 0.8, 1.3, 0.7],
               key_multiplier=2.0, embedding_multiplier=3.0,
               lm_head_multiplier=0.25, hidden_act="silu",
               bos_token_id=1, eos_token_id=2, tie_word_embeddings=False)
    n_sh = d_inner // d_head
    conv_dim = d_inner + 2 * n_group * d_state
    t = {"model.embed_tokens.weight": rnd(rng, 261, E),
         "model.final_layernorm.weight": 1.0 + rnd(rng, E),
         "lm_head.weight": rnd(rng, 261, E)}
    for i in range(2):
        p = f"model.layers.{i}."
        t[p + "input_layernorm.weight"] = 1.0 + rnd(rng, E)
        t[p + "pre_ff_layernorm.weight"] = 1.0 + rnd(rng, E)
        t[p + "self_attn.q_proj.weight"] = rnd(rng, H * HD, E)
        t[p + "self_attn.k_proj.weight"] = rnd(rng, KV * HD, E)
        t[p + "self_attn.v_proj.weight"] = rnd(rng, KV * HD, E)
        t[p + "self_attn.o_proj.weight"] = rnd(rng, E, H * HD)
        t[p + "mlp.gate_proj.weight"] = rnd(rng, 128, E)
        t[p + "mlp.up_proj.weight"] = rnd(rng, 128, E)
        t[p + "mlp.down_proj.weight"] = rnd(rng, E, 128)
        q = p + "mamba."
        t[q + "in_proj.weight"] = rnd(rng, 2 * d_inner
                                      + 2 * n_group * d_state + n_sh, E)
        t[q + "conv1d.weight"] = rnd(rng, conv_dim, 1, 4)
        t[q + "conv1d.bias"] = rnd(rng, conv_dim)
        t[q + "dt_bias"] = rnd(rng, n_sh)
        t[q + "A_log"] = rnd(rng, n_sh)
        t[q + "D"] = rnd(rng, n_sh)
        t[q + "norm.weight"] = 1.0 + rnd(rng, d_inner)
        t[q + "out_proj.weight"] = rnd(rng, E, d_inner)
    run_case(tmp_path, "falconh1", cfg, t)


def test_parity_plamo2(tmp_path):
    rng = np.random.default_rng(40)
    E, H, KV, HD = 64, 4, 2, 16
    n_mh, d_state = 4, 32
    d_inner = n_mh * HD  # mamba inner = mamba_num_heads * hidden_size_per_head
    dt_rank = 8
    cfg = dict(architectures=["Plamo2ForCausalLM"], model_type="plamo2",
               vocab_size=300, hidden_size=E, num_hidden_layers=2,
               num_attention_heads=H, num_key_value_heads=KV,
               hidden_size_per_head=HD, intermediate_size=128,
               mamba_num_heads=n_mh, mamba_d_state=d_state,
               mamba_d_conv=4, mamba_step=2, mamba_enabled=True,
               max_position_embeddings=2048, rms_norm_eps=1e-6,
               rope_theta=10000.0, bos_token_id=1, eos_token_id=2)
    t = {"model.embed_tokens.weight": rnd(rng, 300, E),
         "model.norm.weight": rnd(rng, E),
         "lm_head.weight": rnd(rng, 300, E)}
    for i in range(2):
        p = f"model.layers.layers.{i}."
        t[p + "pre_mixer_norm.weight"] = rnd(rng, E)
        t[p + "post_mixer_norm.weight"] = rnd(rng, E)
        t[p + "pre_mlp_norm.weight"] = rnd(rng, E)
        t[p + "post_mlp_norm.weight"] = rnd(rng, E)
        t[p + "mlp.gate_up_proj.weight"] = rnd(rng, 2 * 128, E)
        t[p + "mlp.down_proj.weight"] = rnd(rng, E, 128)
    # layer 0: mamba mixer (i % 2 != 1)
    p = "model.layers.layers.0.mixer."
    t[p + "in_proj.weight"] = rnd(rng, 2 * d_inner, E)
    t[p + "conv1d.weight"] = rnd(rng, d_inner, 1, 4)
    t[p + "bcdt_proj.weight"] = rnd(rng, 2 * d_state + dt_rank, d_inner)
    t[p + "dt_proj.weight"] = rnd(rng, n_mh, dt_rank)
    t[p + "dt_bias"] = rnd(rng, n_mh)
    t[p + "dt_norm_weight"] = 1.0 + rnd(rng, dt_rank)
    t[p + "A_log"] = rnd(rng, n_mh)
    t[p + "B_norm_weight"] = 1.0 + rnd(rng, d_state)
    t[p + "C_norm_weight"] = 1.0 + rnd(rng, d_state)
    t[p + "D"] = rnd(rng, n_mh)
    t[p + "out_proj.weight"] = rnd(rng, E, d_inner)
    # layer 1: attention mixer
    p = "model.layers.layers.1.mixer."
    t[p + "qkv_proj.weight"] = rnd(rng, (H + 2 * KV) * HD, E)
    t[p + "o_proj.weight"] = rnd(rng, E, H * HD)
    t[p + "q_weight"] = 1.0 + rnd(rng, HD)
    t[p + "k_weight"] = 1.0 + rnd(rng, HD)
    d = str(tmp_path / "plamo2")
    save_ckpt(d, cfg, t, vocab="none")
    # plamo2 custom tokenizer.jsonl
    with open(os.path.join(d, "tokenizer.jsonl"), "w") as f:
        rows = [["<|plamo:unk|>", 0.0, "UNKNOWN"],
                ["<|plamo:bos|>", 0.0, "CONTROL"],
                ["<|plamo:eos|>", 0.0, "CONTROL"],
                ["<|plamo:pad|>", 0.0, "CONTROL"],
                ["<|plamo:op|>", 0.0, "CONTROL"]]
        for b in range(256):
            rows.append([f"<0x{b:02X}>", 0.0, "BYTE"])
        for i in range(36):
            rows.append([f"tok{i}", -float(i), "NORMAL"])
        for r in rows:
            f.write(json.dumps(r) + "\n")
    with open(os.path.join(d, "tokenizer_config.json"), "w") as f:
        json.dump({"bos_token": "<|plamo:bos|>", "eos_token": "<|plamo:eos|>",
                   "pad_token": "<|plamo:pad|>", "unk_token": "<|plamo:unk|>",
                   "tokenizer_class": "PreTrainedTokenizerFast"}, f)
    ref_out = str(tmp_path / "plamo2_ref.gguf")
    our_out = str(tmp_path / "plamo2_ours.gguf")
    convert(d, our_out, outtype="f32", verbose=False)
    ref_convert(d, ref_out)
    compare_ggufs(ref_out, our_out)


def test_parity_rwkv6(tmp_path):
    rng = np.random.default_rng(41)
    E, HS = 64, 16  # hidden, wkv head size
    tm_dim, td_dim = 32, 64  # lora dims for hidden != 4096
    L, inter = 2, 224  # (64*3.5)//32*32
    cfg = dict(architectures=["Rwkv6ForCausalLM"], model_type="rwkv6",
               vocab_size=300, hidden_size=E, num_hidden_layers=L,
               head_size=HS, layer_norm_epsilon=1e-5, rescale_every=2,
               intermediate_size=None, bos_token_id=0, eos_token_id=0)
    t = {"rwkv.embeddings.weight": rnd(rng, 300, E),
         "rwkv.blocks.0.pre_ln.weight": 1.0 + rnd(rng, E),
         "rwkv.blocks.0.pre_ln.bias": rnd(rng, E),
         "rwkv.ln_out.weight": 1.0 + rnd(rng, E),
         "rwkv.ln_out.bias": rnd(rng, E),
         "head.weight": rnd(rng, 300, E)}
    for i in range(L):
        p = f"rwkv.blocks.{i}."
        for ln in ("ln1", "ln2"):
            t[p + f"{ln}.weight"] = 1.0 + rnd(rng, E)
            t[p + f"{ln}.bias"] = rnd(rng, E)
        a = p + "attention."
        t[a + "time_maa_x"] = rnd(rng, 1, 1, E)
        for c in "wkvrg":
            t[a + f"time_maa_{c}"] = rnd(rng, 1, 1, E)
        t[a + "time_maa_w1"] = rnd(rng, E, tm_dim * 5)
        t[a + "time_maa_w2"] = rnd(rng, 5, tm_dim, E)
        t[a + "time_decay"] = rnd(rng, 1, 1, E)
        t[a + "time_decay_w1"] = rnd(rng, E, td_dim)
        t[a + "time_decay_w2"] = rnd(rng, td_dim, E)
        t[a + "time_faaaa"] = rnd(rng, E // HS, HS)
        for nm in ("key", "value", "receptance", "gate", "output"):
            t[a + f"{nm}.weight"] = rnd(rng, E, E)
        t[a + "ln_x.weight"] = 1.0 + rnd(rng, E)
        t[a + "ln_x.bias"] = rnd(rng, E)
        f = p + "feed_forward."
        t[f + "time_maa_k"] = rnd(rng, 1, 1, E)
        t[f + "time_maa_r"] = rnd(rng, 1, 1, E)
        t[f + "key.weight"] = rnd(rng, inter, E)
        t[f + "receptance.weight"] = rnd(rng, E, E)
        t[f + "value.weight"] = rnd(rng, E, inter)
    d = str(tmp_path / "rwkv6")
    save_ckpt(d, cfg, t, vocab="none")
    # rwkv world vocab: "<id> <repr> <len>" lines
    with open(os.path.join(d, "rwkv_vocab_v20230424.txt"), "w") as f:
        i = 1
        for b in range(193):
            f.write(f"{i} {bytes([b])!r} 1\n")
            i += 1
        for k in range(100):
            tok = f"tok{k}"
            f.write(f"{i} {tok!r} {len(tok)}\n")
            i += 1
    ref_out = str(tmp_path / "rwkv6_ref.gguf")
    our_out = str(tmp_path / "rwkv6_ours.gguf")
    convert(d, our_out, outtype="f32", verbose=False)
    ref_convert(d, ref_out)
    compare_ggufs(ref_out, our_out)


def test_parity_rwkv7(tmp_path):
    rng = np.random.default_rng(42)
    E, HS, L, inter = 64, 16, 2, 256
    rd, ra, rv, rg = 32, 32, 32, 32
    cfg = dict(architectures=["Rwkv7ForCausalLM"], model_type="rwkv7",
               vocab_size=300, hidden_size=E, num_hidden_layers=L,
               head_size=HS, layer_norm_epsilon=1e-5,
               intermediate_size=inter, lora_rank_decay=rd,
               lora_rank_iclr=ra, lora_rank_value_residual_mix=rv,
               lora_rank_gate=rg, wkv_has_gate=True,
               bos_token_id=0, eos_token_id=0)
    t = {"model.embeddings.weight": rnd(rng, 300, E),
         "model.pre_ln.weight": 1.0 + rnd(rng, E),
         "model.pre_ln.bias": rnd(rng, E),
         "model.ln_out.weight": 1.0 + rnd(rng, E),
         "model.ln_out.bias": rnd(rng, E),
         "head.weight": rnd(rng, 300, E)}
    for i in range(L):
        p = f"model.layers.{i}."
        for ln in ("ln1", "ln2"):
            t[p + f"{ln}.weight"] = 1.0 + rnd(rng, E)
            t[p + f"{ln}.bias"] = rnd(rng, E)
        a = p + "attention."
        for c in "rwkvag":
            t[a + f"x_{c}"] = rnd(rng, 1, 1, E)
        t[a + "w0"] = rnd(rng, 1, 1, E)
        t[a + "w1"] = rnd(rng, E, rd)
        t[a + "w2"] = rnd(rng, rd, E)
        t[a + "a0"] = rnd(rng, 1, 1, E)
        t[a + "a1"] = rnd(rng, E, ra)
        t[a + "a2"] = rnd(rng, ra, E)
        if i > 0:
            t[a + "v0"] = rnd(rng, 1, 1, E)
            t[a + "v1"] = rnd(rng, E, rv)
            t[a + "v2"] = rnd(rng, rv, E)
        t[a + "g1"] = rnd(rng, E, rg)
        t[a + "g2"] = rnd(rng, rg, E)
        t[a + "k_k"] = rnd(rng, 1, 1, E)
        t[a + "k_a"] = rnd(rng, 1, 1, E)
        t[a + "r_k"] = rnd(rng, E // HS, HS)
        for nm in ("key", "value", "receptance", "output"):
            t[a + f"{nm}.weight"] = rnd(rng, E, E)
        t[a + "ln_x.weight"] = 1.0 + rnd(rng, E)
        t[a + "ln_x.bias"] = rnd(rng, E)
        f = p + "feed_forward."
        t[f + "x_k"] = rnd(rng, 1, 1, E)
        t[f + "key.weight"] = rnd(rng, inter, E)
        t[f + "value.weight"] = rnd(rng, E, inter)
    d = str(tmp_path / "rwkv7")
    save_ckpt(d, cfg, t, vocab="none")
    with open(os.path.join(d, "rwkv_vocab_v20230424.txt"), "w") as f:
        i = 1
        for b in range(193):
            f.write(f"{i} {bytes([b])!r} 1\n")
            i += 1
        for k in range(100):
            tok = f"tok{k}"
            f.write(f"{i} {tok!r} {len(tok)}\n")
            i += 1
    ref_out = str(tmp_path / "rwkv7_ref.gguf")
    our_out = str(tmp_path / "rwkv7_ours.gguf")
    convert(d, our_out, outtype="f32", verbose=False)
    ref_convert(d, ref_out)
    compare_ggufs(ref_out, our_out)


def test_parity_bailingmoe2(tmp_path):
    rng = np.random.default_rng(43)
    E, H, KV, HD = 64, 4, 2, 16
    cfg = dict(BASE_CFG, architectures=["BailingMoeV2ForCausalLM"],
               model_type="bailing_moe_v2", num_experts=4,
               num_experts_per_tok=2, moe_intermediate_size=64,
               num_shared_experts=1, first_k_dense_replace=0,
               norm_topk_prob=True, routed_scaling_factor=2.5,
               partial_rotary_factor=0.5, num_nextn_predict_layers=1,
               tie_word_embeddings=False)
    t = {"model.word_embeddings.weight": rnd(rng, 261, E),
         "model.norm.weight": 1.0 + rnd(rng, E),
         "lm_head.weight": rnd(rng, 261, E)}
    for i in range(3):  # 2 normal + 1 nextn layer
        p = f"model.layers.{i}."
        t[p + "input_layernorm.weight"] = 1.0 + rnd(rng, E)
        t[p + "post_attention_layernorm.weight"] = 1.0 + rnd(rng, E)
        t[p + "attention.query_key_value.weight"] = \
            rnd(rng, (H + 2 * KV) * HD, E)
        t[p + "attention.dense.weight"] = rnd(rng, E, H * HD)
        t[p + "attention.query_layernorm.weight"] = 1.0 + rnd(rng, HD)
        t[p + "attention.key_layernorm.weight"] = 1.0 + rnd(rng, HD)
        t.update(moe_layer_tensors(rng, i, shared=True))
        t[p + "mlp.gate.expert_bias"] = rnd(rng, 4)
    # nextn (MTP) extras on the appended layer
    p = "model.layers.2."
    t[p + "eh_proj.weight"] = rnd(rng, E, 2 * E)
    t[p + "embed_tokens.weight"] = rnd(rng, 261, E)
    t[p + "enorm.weight"] = 1.0 + rnd(rng, E)
    t[p + "hnorm.weight"] = 1.0 + rnd(rng, E)
    t[p + "shared_head.head.weight"] = rnd(rng, 261, E)
    t[p + "shared_head.norm.weight"] = 1.0 + rnd(rng, E)
    t[p + "final_layernorm.weight"] = 1.0 + rnd(rng, E)
    run_case(tmp_path, "bailingmoe2", cfg, t)


def test_parity_rwkv6qwen2(tmp_path):
    rng = np.random.default_rng(44)
    E, H, KV = 64, 4, 2
    tm, td = 32, 64
    cfg = dict(architectures=["RWKV6Qwen2ForCausalLM"],
               model_type="rwkv6qwen2", vocab_size=261, hidden_size=E,
               num_hidden_layers=2, num_attention_heads=H,
               num_key_value_heads=KV, intermediate_size=128,
               rms_norm_eps=1e-5, bos_token_id=1, eos_token_id=2,
               tie_word_embeddings=False)
    t = {"model.embed_tokens.weight": rnd(rng, 261, E),
         "model.norm.weight": 1.0 + rnd(rng, E),
         "lm_head.weight": rnd(rng, 261, E)}
    for i in range(2):
        p = f"model.layers.{i}."
        t[p + "input_layernorm.weight"] = 1.0 + rnd(rng, E)
        t[p + "post_attention_layernorm.weight"] = 1.0 + rnd(rng, E)
        t[p + "mlp.gate_proj.weight"] = rnd(rng, 128, E)
        t[p + "mlp.up_proj.weight"] = rnd(rng, 128, E)
        t[p + "mlp.down_proj.weight"] = rnd(rng, E, 128)
        a = p + "self_attn."
        t[a + "time_maa_x"] = rnd(rng, 1, 1, E)
        for c in "wkvrg":
            t[a + f"time_maa_{c}"] = rnd(rng, 1, 1, E)
        t[a + "time_maa_w1"] = rnd(rng, E, tm * 5)
        t[a + "time_maa_w2"] = rnd(rng, 5, tm, E)
        t[a + "time_decay"] = rnd(rng, 1, 1, E)
        t[a + "time_decay_w1"] = rnd(rng, E, td)
        t[a + "time_decay_w2"] = rnd(rng, td, E)
        t[a + "k_proj.weight"] = rnd(rng, KV * 16, E)
        t[a + "k_proj.bias"] = rnd(rng, KV * 16)
        t[a + "v_proj.weight"] = rnd(rng, KV * 16, E)
        t[a + "v_proj.bias"] = rnd(rng, KV * 16)
        t[a + "q_proj.weight"] = rnd(rng, E, E)
        t[a + "q_proj.bias"] = rnd(rng, E)
        t[a + "gate.weight"] = rnd(rng, E, E)
        t[a + "o_proj.weight"] = rnd(rng, E, E)
    run_case(tmp_path, "rwkv6qwen2", cfg, t)


def test_parity_arwkv7(tmp_path):
    rng = np.random.default_rng(45)
    E, HS, L, inter = 64, 16, 2, 128
    rd, ra, rv, rg = 64, 64, 32, 128
    cfg = dict(architectures=["RwkvHybridForCausalLM"],
               model_type="rwkv_hybrid", vocab_size=261, hidden_size=E,
               num_hidden_layers=L, head_size=HS, rms_norm_eps=1e-5,
               intermediate_size=inter, wkv_has_gate=True, wkv_version=7,
               bos_token_id=1, eos_token_id=2, tie_word_embeddings=False)
    t = {"model.embed_tokens.weight": rnd(rng, 261, E),
         "model.norm.weight": 1.0 + rnd(rng, E),
         "lm_head.weight": rnd(rng, 261, E)}
    for i in range(L):
        p = f"model.layers.{i}."
        t[p + "input_layernorm.weight"] = 1.0 + rnd(rng, E)
        t[p + "post_attention_layernorm.weight"] = 1.0 + rnd(rng, E)
        t[p + "mlp.gate_proj.weight"] = rnd(rng, inter, E)
        t[p + "mlp.up_proj.weight"] = rnd(rng, inter, E)
        t[p + "mlp.down_proj.weight"] = rnd(rng, E, inter)
        a = p + "self_attn.time_mixer."
        for c in "rwkvag":
            t[a + f"x_{c}"] = rnd(rng, 1, 1, E)
        t[a + "w0"] = rnd(rng, 1, 1, E)
        t[a + "w1"] = rnd(rng, E, rd)
        t[a + "w2"] = rnd(rng, rd, E)
        t[a + "a0"] = rnd(rng, 1, 1, E)
        t[a + "a1"] = rnd(rng, E, ra)
        t[a + "a2"] = rnd(rng, ra, E)
        if i > 0:
            t[a + "v0"] = rnd(rng, 1, 1, E)
            t[a + "v1"] = rnd(rng, E, rv)
            t[a + "v2"] = rnd(rng, rv, E)
        t[a + "g1"] = rnd(rng, E, rg)
        t[a + "g2"] = rnd(rng, rg, E)
        t[a + "k_k"] = rnd(rng, 1, 1, E)
        t[a + "k_a"] = rnd(rng, 1, 1, E)
        t[a + "r_k"] = rnd(rng, E // HS, HS)
        for nm in ("key", "value", "receptance", "output"):
            t[a + f"{nm}.weight"] = rnd(rng, E, E)
        t[a + "ln_x.weight"] = 1.0 + rnd(rng, E)
        t[a + "ln_x.bias"] = rnd(rng, E)
    run_case(tmp_path, "arwkv7", cfg, t)


def test_parity_llama31_rope_freqs(tmp_path):
    """llama3-type rope scaling: the generated rope_freqs.weight factor
    tensor must match LlamaModel.generate_extra_tensors (convert_hf:2497)."""
    rng = np.random.default_rng(41)
    cfg = dict(BASE_CFG, architectures=["LlamaForCausalLM"],
               model_type="llama", tie_word_embeddings=False,
               rope_scaling={"rope_type": "llama3", "factor": 8.0,
                             "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                             "original_max_position_embeddings": 128},
               original_max_position_embeddings=128)
    run_case(tmp_path, "llama31", cfg, llama_like_tensors(rng), vocab="spm")


def test_parity_llava_text(tmp_path):
    """LlavaForConditionalGeneration: text part converts as llama with
    the language_model. prefix stripped and vision tensors skipped."""
    rng = np.random.default_rng(42)
    t = llama_like_tensors(rng, prefix="language_model.model.")
    t["language_model.lm_head.weight"] = t.pop("lm_head.weight")
    t["vision_tower.something.weight"] = rnd(rng, 8, 8)
    t["multi_modal_projector.linear_1.weight"] = rnd(rng, 8, 8)
    text_cfg = dict(BASE_CFG)
    cfg = dict(architectures=["LlavaForConditionalGeneration"],
               model_type="llava", text_config=text_cfg,
               vision_config={"hidden_size": 8},
               **{k: v for k, v in BASE_CFG.items()})
    run_case(tmp_path, "llava", cfg, t, vocab="spm")


def test_parity_llama4(tmp_path):
    """Llama4ForCausalLM: pre-stacked fused-gate_up experts split +
    transposed, interleave_moe_layer_step, NO q/k permute
    (Llama4Model, convert_hf:2742-2790)."""
    rng = np.random.default_rng(43)
    L, V, E, H, KV, HD, F, FM, NE = 2, 261, 64, 4, 2, 16, 128, 96, 4
    t = {"model.embed_tokens.weight": rnd(rng, V, E),
         "model.norm.weight": 1.0 + rnd(rng, E),
         "lm_head.weight": rnd(rng, V, E)}
    for i in range(L):
        p = f"model.layers.{i}."
        t[p + "input_layernorm.weight"] = 1.0 + rnd(rng, E)
        t[p + "post_attention_layernorm.weight"] = 1.0 + rnd(rng, E)
        for nm, n in (("q_proj", H * HD), ("k_proj", KV * HD),
                      ("v_proj", KV * HD)):
            t[p + f"self_attn.{nm}.weight"] = rnd(rng, n, E)
        t[p + "self_attn.o_proj.weight"] = rnd(rng, E, H * HD)
        t[p + "feed_forward.router.weight"] = rnd(rng, NE, E)
        t[p + "feed_forward.experts.gate_up_proj"] = rnd(rng, NE, E, 2 * FM)
        t[p + "feed_forward.experts.down_proj"] = rnd(rng, NE, FM, E)
        t[p + "feed_forward.shared_expert.gate_proj.weight"] = rnd(rng, FM, E)
        t[p + "feed_forward.shared_expert.up_proj.weight"] = rnd(rng, FM, E)
        t[p + "feed_forward.shared_expert.down_proj.weight"] = rnd(rng, E, FM)
    text_cfg = dict(BASE_CFG, model_type="llama4_text",
                    intermediate_size_mlp=128, intermediate_size=FM,
                    num_local_experts=NE, num_experts_per_tok=1,
                    interleave_moe_layer_step=1, tie_word_embeddings=False,
                    attention_chunk_size=512, no_rope_layers=[1] * L,
                    use_qk_norm=False)
    cfg = dict(architectures=["Llama4ForCausalLM"], model_type="llama4",
               text_config=text_cfg, vocab_size=261)
    run_case(tmp_path, "llama4", cfg, t)


def _deci_tensors(rng, kv_heads, ffn_dims, H=4, HD=16, E=64, V=261):
    t = {"model.embed_tokens.weight": rnd(rng, V, E),
         "model.norm.weight": 1.0 + rnd(rng, E),
         "lm_head.weight": rnd(rng, V, E)}
    for i, (kv, ff) in enumerate(zip(kv_heads, ffn_dims)):
        p = f"model.layers.{i}."
        t[p + "input_layernorm.weight"] = 1.0 + rnd(rng, E)
        t[p + "post_attention_layernorm.weight"] = 1.0 + rnd(rng, E)
        if kv:
            t[p + "self_attn.q_proj.weight"] = rnd(rng, H * HD, E)
            t[p + "self_attn.k_proj.weight"] = rnd(rng, kv * HD, E)
            t[p + "self_attn.v_proj.weight"] = rnd(rng, kv * HD, E)
            t[p + "self_attn.o_proj.weight"] = rnd(rng, E, H * HD)
        if ff:
            t[p + "mlp.gate_proj.weight"] = rnd(rng, ff, E)
            t[p + "mlp.up_proj.weight"] = rnd(rng, ff, E)
            t[p + "mlp.down_proj.weight"] = rnd(rng, E, ff)
    return t


def test_parity_deci_block_configs(tmp_path):
    """DeciLM (Nemotron-51B form): per-layer head/kv/ffn arrays from
    block_configs; per-layer permute (DeciModel, convert_hf:2855-2998)."""
    rng = np.random.default_rng(44)
    E = 64
    # ffn_mult chosen so _ffn_mult_to_intermediate_size -> 256
    bc = [
        {"attention": {"n_heads_in_group": 2, "replace_with_linear": False},
         "ffn": {"ffn_mult": 6.0}},
        {"attention": {"n_heads_in_group": 4, "replace_with_linear": False},
         "ffn": {"ffn_mult": 6.0}},
    ]
    kv_heads = [2, 1]
    ffn = 256
    # vocab_size == 128256 selects the gpt2-BPE vocab path (DeciModel
    # .set_vocab); smaller sizes need the LlamaHfVocab tokenizer.json
    t = _deci_tensors(rng, kv_heads, [ffn, ffn], E=E, V=128256)
    cfg = dict(BASE_CFG, architectures=["DeciLMForCausalLM"],
               model_type="nemotron-nas", block_configs=bc,
               tie_word_embeddings=False, vocab_size=128256)
    cfg.pop("num_key_value_heads")
    cfg.pop("head_dim")
    cfg.pop("intermediate_size")
    run_case(tmp_path, "deci_bc", cfg, t)


def test_parity_deci_7b(tmp_path):
    """DeciLM-7B form: num_key_value_heads_per_layer array."""
    rng = np.random.default_rng(45)
    kv_heads = [2, 1]
    t = _deci_tensors(rng, kv_heads, [128, 128], V=128256)
    cfg = dict(BASE_CFG, architectures=["DeciLMForCausalLM"],
               model_type="deci", num_key_value_heads_per_layer=kv_heads,
               tie_word_embeddings=False, vocab_size=128256)
    cfg.pop("num_key_value_heads")
    cfg.pop("head_dim")
    run_case(tmp_path, "deci7b", cfg, t, vocab="bpe")


def test_parity_phi3_longrope(tmp_path):
    """Phi3: fused qkv/gate_up + longrope factor tensors + attn_factor +
    sliding window (Phi3MiniModel, convert_hf:4513-4687)."""
    rng = np.random.default_rng(46)
    L, V, E, H, KV, HD, F = 2, 261, 64, 4, 2, 16, 128
    t = {"model.embed_tokens.weight": rnd(rng, V, E),
         "model.norm.weight": 1.0 + rnd(rng, E),
         "lm_head.weight": rnd(rng, V, E)}
    for i in range(L):
        p = f"model.layers.{i}."
        t[p + "input_layernorm.weight"] = 1.0 + rnd(rng, E)
        t[p + "post_attention_layernorm.weight"] = 1.0 + rnd(rng, E)
        t[p + "self_attn.qkv_proj.weight"] = rnd(rng, (H + 2 * KV) * HD, E)
        t[p + "self_attn.o_proj.weight"] = rnd(rng, E, H * HD)
        t[p + "mlp.gate_up_proj.weight"] = rnd(rng, 2 * F, E)
        t[p + "mlp.down_proj.weight"] = rnd(rng, E, F)
    cfg = dict(BASE_CFG, architectures=["Phi3ForCausalLM"],
               model_type="phi3", tie_word_embeddings=False,
               original_max_position_embeddings=128,
               max_position_embeddings=1024, sliding_window=256,
               rope_scaling={"type": "longrope",
                             "long_factor": [1.5] * (HD // 2),
                             "short_factor": [1.0] * (HD // 2)})
    cfg.pop("head_dim")
    run_case(tmp_path, "phi3lr", cfg, t, vocab="spm")


def test_parity_minicpm3(tmp_path):
    """MiniCPM3: MLA-lite (q/kv lora ranks, qk nope+rope key length,
    longrope factor tensors, NO freq_base — MiniCPM3Model convert_hf:3302)."""
    rng = np.random.default_rng(47)
    L, V, E, H, F = 2, 261, 64, 4, 128
    qk_nope, qk_rope, vdim = 16, 8, 16
    q_rank, kv_rank = 32, 16
    hd = qk_nope + qk_rope
    t = {"model.embed_tokens.weight": rnd(rng, V, E),
         "model.norm.weight": 1.0 + rnd(rng, E),
         "lm_head.weight": rnd(rng, V, E)}
    for i in range(L):
        p = f"model.layers.{i}."
        t[p + "input_layernorm.weight"] = 1.0 + rnd(rng, E)
        t[p + "post_attention_layernorm.weight"] = 1.0 + rnd(rng, E)
        t[p + "self_attn.q_a_proj.weight"] = rnd(rng, q_rank, E)
        t[p + "self_attn.q_a_layernorm.weight"] = 1.0 + rnd(rng, q_rank)
        t[p + "self_attn.q_b_proj.weight"] = rnd(rng, H * hd, q_rank)
        t[p + "self_attn.kv_a_proj_with_mqa.weight"] = rnd(
            rng, kv_rank + qk_rope, E)
        t[p + "self_attn.kv_a_layernorm.weight"] = 1.0 + rnd(rng, kv_rank)
        t[p + "self_attn.kv_b_proj.weight"] = rnd(rng, H * (qk_nope + vdim),
                                                  kv_rank)
        t[p + "self_attn.o_proj.weight"] = rnd(rng, E, H * vdim)
        t[p + "mlp.gate_proj.weight"] = rnd(rng, F, E)
        t[p + "mlp.up_proj.weight"] = rnd(rng, F, E)
        t[p + "mlp.down_proj.weight"] = rnd(rng, E, F)
    cfg = dict(BASE_CFG, architectures=["MiniCPM3ForCausalLM"],
               model_type="minicpm3", tie_word_embeddings=False,
               q_lora_rank=q_rank, kv_lora_rank=kv_rank,
               qk_nope_head_dim=qk_nope, qk_rope_head_dim=qk_rope,
               v_head_dim=vdim,
               rope_scaling={"type": "longrope",
                             "long_factor": [1.5] * (qk_rope // 2),
                             "short_factor": [1.0] * (qk_rope // 2)})
    cfg.pop("head_dim")
    run_case(tmp_path, "minicpm3", cfg, t, vocab="spm")


def test_parity_arctic(tmp_path):
    """Arctic: parallel dense residual_mlp + MoE branch
    (residual_layernorm->ffn_norm, post_attention_layernorm->
    ffn_norm_exps), spm vocab with added_tokens_decoder overrides
    (ArcticModel, convert_hf:6920)."""
    rng = np.random.default_rng(48)
    L, V, E, H, KV, HD, F, NE = 2, 261, 64, 4, 2, 16, 128, 4
    t = {"model.embed_tokens.weight": rnd(rng, V, E),
         "model.norm.weight": 1.0 + rnd(rng, E),
         "lm_head.weight": rnd(rng, V, E)}
    for i in range(L):
        p = f"model.layers.{i}."
        t[p + "input_layernorm.weight"] = 1.0 + rnd(rng, E)
        t[p + "post_attention_layernorm.weight"] = 1.0 + rnd(rng, E)
        t[p + "residual_layernorm.weight"] = 1.0 + rnd(rng, E)
        for nm, n in (("q_proj", H * HD), ("k_proj", KV * HD),
                      ("v_proj", KV * HD)):
            t[p + f"self_attn.{nm}.weight"] = rnd(rng, n, E)
        t[p + "self_attn.o_proj.weight"] = rnd(rng, E, H * HD)
        t[p + "residual_mlp.w1.weight"] = rnd(rng, F, E)
        t[p + "residual_mlp.w3.weight"] = rnd(rng, F, E)
        t[p + "residual_mlp.w2.weight"] = rnd(rng, E, F)
        t[p + "block_sparse_moe.gate.weight"] = rnd(rng, NE, E)
        for x in range(NE):
            t[p + f"block_sparse_moe.experts.{x}.w1.weight"] = rnd(rng, F, E)
            t[p + f"block_sparse_moe.experts.{x}.w2.weight"] = rnd(rng, E, F)
            t[p + f"block_sparse_moe.experts.{x}.w3.weight"] = rnd(rng, F, E)
    cfg = dict(BASE_CFG, architectures=["ArcticForCausalLM"],
               model_type="arctic", tie_word_embeddings=False,
               num_local_experts=NE, num_experts_per_tok=2)
    d = str(tmp_path / "arctic")
    save_ckpt(d, cfg, t, vocab="spm")
    json.dump({"add_bos_token": True, "unk_token": "<unk>",
               "added_tokens_decoder": {
                   "259": {"content": "<|im_start|>", "special": True},
                   "260": {"content": "casual", "special": False}}},
              open(os.path.join(d, "tokenizer_config.json"), "w"))
    ref_out = str(tmp_path / "arctic_ref.gguf")
    our_out = str(tmp_path / "arctic_ours.gguf")
    convert(d, our_out, outtype="f32", verbose=False)
    ref_convert(d, ref_out)
    compare_ggufs(ref_out, our_out)


def test_parity_codeshell(tmp_path):
    """CodeShell: gpt2-style keys, kv from num_query_groups, ff=4*n_embd,
    linear rope scaling 1.0 (CodeShellModel, convert_hf:4965)."""
    rng = np.random.default_rng(49)
    L, V, E, H, KV, HD = 2, 261, 64, 4, 2, 16
    t = {"transformer.wte.weight": rnd(rng, V, E),
         "transformer.ln_f.weight": 1.0 + rnd(rng, E),
         "transformer.ln_f.bias": rnd(rng, E),
         "lm_head.weight": rnd(rng, V, E)}
    for i in range(L):
        p = f"transformer.h.{i}."
        t[p + "ln_1.weight"] = 1.0 + rnd(rng, E)
        t[p + "ln_1.bias"] = rnd(rng, E)
        t[p + "ln_2.weight"] = 1.0 + rnd(rng, E)
        t[p + "ln_2.bias"] = rnd(rng, E)
        t[p + "attn.c_attn.weight"] = rnd(rng, (H + 2 * KV) * HD, E)
        t[p + "attn.c_attn.bias"] = rnd(rng, (H + 2 * KV) * HD)
        t[p + "attn.c_proj.weight"] = rnd(rng, E, H * HD)
        t[p + "attn.c_proj.bias"] = rnd(rng, E)
        t[p + "mlp.c_fc.weight"] = rnd(rng, 4 * E, E)
        t[p + "mlp.c_fc.bias"] = rnd(rng, 4 * E)
        t[p + "mlp.c_proj.weight"] = rnd(rng, E, 4 * E)
        t[p + "mlp.c_proj.bias"] = rnd(rng, E)
    cfg = dict(architectures=["CodeShellForCausalLM"], model_type="codeshell",
               vocab_size=V, n_embd=E, n_layer=L, n_head=H,
               num_query_groups=KV, n_positions=256,
               layer_norm_epsilon=1e-5, bos_token_id=1, eos_token_id=2)
    run_case(tmp_path, "codeshell", cfg, t, vocab="bpe")


def test_parity_rnd1(tmp_path):
    """RND1: qwen2moe-shaped diffusion LM — bidirectional attention flag +
    mask token (RND1Model, convert_hf:4262)."""
    rng = np.random.default_rng(50)
    L, V, E, H, KV, HD, F, NE = 2, 261, 64, 4, 2, 16, 64, 4
    t = llama_like_tensors(rng, L=L, V=V, E=E, H=H, KV=KV, HD=HD, F=F)
    for i in range(L):
        p = f"model.layers.{i}."
        for nm in ("gate_proj", "up_proj", "down_proj"):
            t.pop(p + f"mlp.{nm}.weight")
        t[p + "mlp.gate.weight"] = rnd(rng, NE, E)
        for x in range(NE):
            t[p + f"mlp.experts.{x}.gate_proj.weight"] = rnd(rng, F, E)
            t[p + f"mlp.experts.{x}.up_proj.weight"] = rnd(rng, F, E)
            t[p + f"mlp.experts.{x}.down_proj.weight"] = rnd(rng, E, F)
    cfg = dict(BASE_CFG, architectures=["RND1"], model_type="rnd1",
               tie_word_embeddings=False, num_experts=NE,
               num_experts_per_tok=2, moe_intermediate_size=F,
               norm_topk_prob=True, mask_token_id=5)
    run_case(tmp_path, "rnd1", cfg, t, vocab="bpe")


def test_parity_lfm2moe(tmp_path):
    """Lfm2Moe: hybrid shortconv/attention + sigmoid MoE with w1/w2/w3
    expert merging + expert selection bias (LFM2MoeModel, convert_hf:9633)."""
    rng = np.random.default_rng(51)
    L, V, E, H, KV, HD, F, FM, NE = 4, 261, 64, 4, 2, 16, 128, 64, 4
    lt = ["conv", "full_attention", "conv", "full_attention"]
    t = {"model.embed_tokens.weight": rnd(rng, V, E),
         "model.embedding_norm.weight": 1.0 + rnd(rng, E)}
    for i in range(L):
        p = f"model.layers.{i}."
        t[p + "operator_norm.weight"] = 1.0 + rnd(rng, E)
        t[p + "ffn_norm.weight"] = 1.0 + rnd(rng, E)
        if lt[i] == "conv":
            t[p + "conv.in_proj.weight"] = rnd(rng, 3 * E, E)
            t[p + "conv.conv.weight"] = rnd(rng, E, 1, 3)
            t[p + "conv.out_proj.weight"] = rnd(rng, E, E)
        else:
            t[p + "self_attn.q_proj.weight"] = rnd(rng, H * HD, E)
            t[p + "self_attn.k_proj.weight"] = rnd(rng, KV * HD, E)
            t[p + "self_attn.v_proj.weight"] = rnd(rng, KV * HD, E)
            t[p + "self_attn.out_proj.weight"] = rnd(rng, E, H * HD)
            t[p + "self_attn.q_layernorm.weight"] = 1.0 + rnd(rng, HD)
            t[p + "self_attn.k_layernorm.weight"] = 1.0 + rnd(rng, HD)
        if i == 0:  # leading dense layer
            t[p + "feed_forward.w1.weight"] = rnd(rng, F, E)
            t[p + "feed_forward.w3.weight"] = rnd(rng, F, E)
            t[p + "feed_forward.w2.weight"] = rnd(rng, E, F)
        else:
            t[p + "feed_forward.gate.weight"] = rnd(rng, NE, E)
            t[p + "feed_forward.expert_bias"] = rnd(rng, NE)
            for x in range(NE):
                t[p + f"feed_forward.experts.{x}.w1.weight"] = rnd(rng, FM, E)
                t[p + f"feed_forward.experts.{x}.w2.weight"] = rnd(rng, E, FM)
                t[p + f"feed_forward.experts.{x}.w3.weight"] = rnd(rng, FM, E)
    cfg = dict(architectures=["Lfm2MoeForCausalLM"], model_type="lfm2_moe",
               vocab_size=V, hidden_size=E, num_hidden_layers=L,
               num_attention_heads=H, num_key_value_heads=KV,
               intermediate_size=F, moe_intermediate_size=FM,
               num_experts=NE, num_experts_per_tok=2, num_dense_layers=1,
               norm_topk_prob=True, conv_L_cache=3, layer_types=lt,
               max_position_embeddings=256, norm_eps=1e-5,
               rope_theta=1000000.0, bos_token_id=1, eos_token_id=2)
    run_case(tmp_path, "lfm2moe", cfg, t, vocab="bpe")


_QWEN_TOK_STUB = '''
import base64
import os

from transformers import PreTrainedTokenizer


class QWenTokenizer(PreTrainedTokenizer):
    vocab_files_names = {"vocab_file": "qwen.tiktoken"}

    def __init__(self, vocab_file=None, **kwargs):
        self.mergeable_ranks = {}
        for line in open(vocab_file, "rb").read().splitlines():
            if line:
                b, r = line.split()
                self.mergeable_ranks[base64.b64decode(b)] = int(r)
        specials = (["<|endoftext|>", "<|im_start|>", "<|im_end|>"]
                    + [f"<|extra_{i}|>" for i in range(205)])
        self.special_tokens = {
            s: len(self.mergeable_ranks) + i for i, s in enumerate(specials)
        }
        super().__init__(**kwargs)

    @property
    def vocab_size(self):
        return len(self.mergeable_ranks) + len(self.special_tokens)

    def get_vocab(self):
        return {**{t.decode("latin-1"): r
                   for t, r in self.mergeable_ranks.items()},
                **self.special_tokens}

    def encode(self, *a, **k):
        return [0]

    def _tokenize(self, text):
        return []

    def _convert_token_to_id(self, token):
        return 0

    def _convert_id_to_token(self, index):
        return ""
'''


def _write_tiktoken_ckpt(d, extra_merged=()):
    """qwen.tiktoken with all single bytes + a few merged tokens, plus a
    minimal trust_remote_code tokenizer stub for the REFERENCE converter
    (the real tokenization_qwen.py needs the tiktoken package)."""
    import base64

    lines = []
    for b in range(256):
        lines.append(base64.b64encode(bytes([b])) + b" " + str(b).encode())
    for i, tok in enumerate(extra_merged):
        lines.append(base64.b64encode(tok) + b" " + str(256 + i).encode())
    with open(os.path.join(d, "qwen.tiktoken"), "wb") as f:
        f.write(b"\n".join(lines) + b"\n")
    with open(os.path.join(d, "tokenization_qwen.py"), "w") as f:
        f.write(_QWEN_TOK_STUB)
    json.dump({"tokenizer_class": "QWenTokenizer",
               "auto_map": {"AutoTokenizer":
                            ["tokenization_qwen.QWenTokenizer", None]}},
              open(os.path.join(d, "tokenizer_config.json"), "w"))


def test_parity_qwen_v1(tmp_path):
    """QWen v1 (QWenLMHeadModel, convert_hf:3355): tiktoken-rank vocab
    with re-derived BPE merges, fused c_attn, mlp.w1->up / w2->gate,
    no kv-head / vocab-size keys."""
    rng = np.random.default_rng(52)
    L, E, H, HD = 2, 64, 4, 16
    V = 256 + 2 + 208  # bytes + merged + qwen specials
    t = {"transformer.wte.weight": rnd(rng, V, E),
         "transformer.ln_f.weight": 1.0 + rnd(rng, E),
         "lm_head.weight": rnd(rng, V, E)}
    for i in range(L):
        p = f"transformer.h.{i}."
        t[p + "ln_1.weight"] = 1.0 + rnd(rng, E)
        t[p + "ln_2.weight"] = 1.0 + rnd(rng, E)
        t[p + "attn.c_attn.weight"] = rnd(rng, 3 * H * HD, E)
        t[p + "attn.c_attn.bias"] = rnd(rng, 3 * H * HD)
        t[p + "attn.c_proj.weight"] = rnd(rng, E, H * HD)
        t[p + "mlp.w1.weight"] = rnd(rng, 128, E)
        t[p + "mlp.w2.weight"] = rnd(rng, 128, E)
        t[p + "mlp.c_proj.weight"] = rnd(rng, E, 128)
    cfg = dict(architectures=["QWenLMHeadModel"], model_type="qwen",
               vocab_size=V, hidden_size=E, num_hidden_layers=L,
               num_attention_heads=H, intermediate_size=256,
               max_position_embeddings=256, rotary_emb_base=10000.0,
               layer_norm_epsilon=1e-6, bos_token_id=None,
               eos_token_id=256)
    d = str(tmp_path / "qwen1")
    save_ckpt(d, cfg, t, vocab="none")
    _write_tiktoken_ckpt(d, extra_merged=(b"ab", b"abc"))
    ref_out = str(tmp_path / "qwen1_ref.gguf")
    our_out = str(tmp_path / "qwen1_ours.gguf")
    convert(d, our_out, outtype="f32", verbose=False)
    ref_convert(d, ref_out)
    compare_ggufs(ref_out, our_out)


def test_parity_hunyuan_moe(tmp_path):
    """HunYuanMoE (convert_hf:9146): tiktoken vocab (lenient merges),
    shared-expert MLP + qk layernorms, per-layer-uniform expert arrays,
    hardcoded <|bos|> 127959, NTK dynamic rope baked into freq_base."""
    rng = np.random.default_rng(53)
    L, E, H, KV, HD, F, FM, NE = 2, 64, 4, 2, 16, 128, 64, 4
    V = 256 + 2 + 208
    t = {"model.embed_tokens.weight": rnd(rng, V, E),
         "model.norm.weight": 1.0 + rnd(rng, E),
         "lm_head.weight": rnd(rng, V, E)}
    for i in range(L):
        p = f"model.layers.{i}."
        t[p + "input_layernorm.weight"] = 1.0 + rnd(rng, E)
        t[p + "post_attention_layernorm.weight"] = 1.0 + rnd(rng, E)
        for nm, n in (("q_proj", H * HD), ("k_proj", KV * HD),
                      ("v_proj", KV * HD)):
            t[p + f"self_attn.{nm}.weight"] = rnd(rng, n, E)
        t[p + "self_attn.o_proj.weight"] = rnd(rng, E, H * HD)
        t[p + "self_attn.query_layernorm.weight"] = 1.0 + rnd(rng, HD)
        t[p + "self_attn.key_layernorm.weight"] = 1.0 + rnd(rng, HD)
        t[p + "mlp.gate.wg.weight"] = rnd(rng, NE, E)
        t[p + "mlp.shared_mlp.gate_proj.weight"] = rnd(rng, F, E)
        t[p + "mlp.shared_mlp.up_proj.weight"] = rnd(rng, F, E)
        t[p + "mlp.shared_mlp.down_proj.weight"] = rnd(rng, E, F)
        for x in range(NE):
            t[p + f"mlp.experts.{x}.gate_proj.weight"] = rnd(rng, FM, E)
            t[p + f"mlp.experts.{x}.up_proj.weight"] = rnd(rng, FM, E)
            t[p + f"mlp.experts.{x}.down_proj.weight"] = rnd(rng, E, FM)
    cfg = dict(architectures=["HunYuanMoEV1ForCausalLM"],
               model_type="hunyuan", vocab_size=V, hidden_size=E,
               num_hidden_layers=L, num_attention_heads=H,
               num_key_value_heads=KV, head_dim=HD, intermediate_size=F,
               moe_intermediate_size=[FM, FM], moe_topk=[2, 2],
               num_shared_expert=[1, 1], num_experts=NE,
               max_position_embeddings=256, rms_norm_eps=1e-5,
               rope_theta=10000.0, bos_token_id=1, eos_token_id=2,
               tie_word_embeddings=False)
    d = str(tmp_path / "hymoe")
    save_ckpt(d, cfg, t, vocab="none")
    _write_tiktoken_ckpt(d, extra_merged=(b"ab", b"abc"))
    ref_out = str(tmp_path / "hymoe_ref.gguf")
    our_out = str(tmp_path / "hymoe_ours.gguf")
    convert(d, our_out, outtype="f32", verbose=False)
    ref_convert(d, ref_out)
    compare_ggufs(ref_out, our_out)


def _wp_vocab(d, as_json=False):
    toks = (["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"]
            + [f"tok{i}" for i in range(20)] + [f"##s{i}" for i in range(5)])
    if as_json:  # WordPiece tokenizer.json (nomic checkpoints)
        tj = {"version": "1.0",
              "normalizer": {"type": "BertNormalizer", "clean_text": True,
                             "handle_chinese_chars": True,
                             "strip_accents": None, "lowercase": True},
              "pre_tokenizer": {"type": "BertPreTokenizer"},
              "model": {"type": "WordPiece",
                        "vocab": {t: i for i, t in enumerate(toks)},
                        "unk_token": "[UNK]",
                        "continuing_subword_prefix": "##",
                        "max_input_chars_per_word": 100},
              "added_tokens": [
                  {"id": i, "content": t, "special": True,
                   "single_word": False, "lstrip": False, "rstrip": False,
                   "normalized": False}
                  for i, t in enumerate(toks[:5])]}
        json.dump(tj, open(os.path.join(d, "tokenizer.json"), "w"))
        # the slow BertTokenizer (AutoTokenizer fallback) reads vocab.txt
        open(os.path.join(d, "vocab.txt"), "w").write("\n".join(toks) + "\n")
    else:
        open(os.path.join(d, "vocab.txt"), "w").write("\n".join(toks) + "\n")
    json.dump({"tokenizer_class": "BertTokenizer"},
              open(os.path.join(d, "tokenizer_config.json"), "w"))
    return len(toks)


def _bert_case(tmp_path, name, cfg, tensors, vocab_json=False):
    d = str(tmp_path / name)
    save_ckpt(d, cfg, tensors, vocab="none")
    _wp_vocab(d, as_json=vocab_json)
    ref_out = str(tmp_path / f"{name}_ref.gguf")
    our_out = str(tmp_path / f"{name}_ours.gguf")
    convert(d, our_out, outtype="f32", verbose=False)
    ref_convert(d, ref_out)
    compare_ggufs(ref_out, our_out)


def test_parity_bert_wordpiece(tmp_path):
    """Plain bert: phantom-space vocab, causal=false, token_type_count
    (BertModel, convert_hf:5224)."""
    rng = np.random.default_rng(54)
    L, V, E, H, F = 2, 30, 32, 4, 64
    t = {"embeddings.word_embeddings.weight": rnd(rng, V, E),
         "embeddings.token_type_embeddings.weight": rnd(rng, 2, E),
         "embeddings.position_embeddings.weight": rnd(rng, 64, E),
         "embeddings.LayerNorm.weight": 1.0 + rnd(rng, E),
         "embeddings.LayerNorm.bias": rnd(rng, E)}
    for i in range(L):
        p = f"encoder.layer.{i}."
        for nm in ("query", "key", "value"):
            t[p + f"attention.self.{nm}.weight"] = rnd(rng, E, E)
            t[p + f"attention.self.{nm}.bias"] = rnd(rng, E)
        t[p + "attention.output.dense.weight"] = rnd(rng, E, E)
        t[p + "attention.output.dense.bias"] = rnd(rng, E)
        t[p + "attention.output.LayerNorm.weight"] = 1.0 + rnd(rng, E)
        t[p + "attention.output.LayerNorm.bias"] = rnd(rng, E)
        t[p + "intermediate.dense.weight"] = rnd(rng, F, E)
        t[p + "intermediate.dense.bias"] = rnd(rng, F)
        t[p + "output.dense.weight"] = rnd(rng, E, F)
        t[p + "output.dense.bias"] = rnd(rng, E)
        t[p + "output.LayerNorm.weight"] = 1.0 + rnd(rng, E)
        t[p + "output.LayerNorm.bias"] = rnd(rng, E)
    cfg = dict(architectures=["BertModel"], model_type="bert", vocab_size=V,
               hidden_size=E, num_hidden_layers=L, num_attention_heads=H,
               intermediate_size=F, max_position_embeddings=64,
               layer_norm_eps=1e-12, type_vocab_size=2, hidden_act="gelu")
    _bert_case(tmp_path, "bertwp", cfg, t)


def test_parity_nomic_bert_moe(tmp_path):
    """nomic-bert-moe (NomicBertModel, convert_hf:5506): fused Wqkv,
    rope, gelu MoE every 2nd layer with flat w1/w2 expert reshape."""
    rng = np.random.default_rng(55)
    L, V, E, H, F, NE = 2, 30, 32, 4, 64, 4
    t = {"embeddings.word_embeddings.weight": rnd(rng, V, E),
         "embeddings.token_type_embeddings.weight": rnd(rng, 2, E),
         "emb_ln.weight": 1.0 + rnd(rng, E),
         "emb_ln.bias": rnd(rng, E)}
    for i in range(L):
        p = f"encoder.layers.{i}."
        t[p + "attn.Wqkv.weight"] = rnd(rng, 3 * E, E)
        t[p + "attn.Wqkv.bias"] = rnd(rng, 3 * E)
        t[p + "attn.out_proj.weight"] = rnd(rng, E, E)
        t[p + "attn.out_proj.bias"] = rnd(rng, E)
        t[p + "norm1.weight"] = 1.0 + rnd(rng, E)
        t[p + "norm1.bias"] = rnd(rng, E)
        t[p + "norm2.weight"] = 1.0 + rnd(rng, E)
        t[p + "norm2.bias"] = rnd(rng, E)
        if i % 2 == 1:  # moe layer
            t[p + "mlp.router.layer.weight"] = rnd(rng, NE, E)
            t[p + "mlp.experts.mlp.w1"] = rnd(rng, NE * F, E)
            t[p + "mlp.experts.mlp.w2"] = rnd(rng, NE * F, E)
            t[p + "mlp.experts.bias"] = rnd(rng, NE)
        else:
            # gelu MLP on dense layers of the moe variant (no gate half)
            t[p + "mlp.fc11.weight"] = rnd(rng, F, E)
            t[p + "mlp.fc2.weight"] = rnd(rng, E, F)
    cfg = dict(architectures=["NomicBertModel"], model_type="nomic_bert",
               vocab_size=V, n_embd=E, n_layer=L, n_head=H, n_inner=F,
               n_positions=8192, max_trained_positions=2048,
               rotary_emb_base=1000.0, layer_norm_epsilon=1e-12,
               type_vocab_size=2, moe_every_n_layers=2, num_experts=NE,
               moe_top_k=2, activation_function="gelu", causal=False,
               qkv_proj_bias=True, mlp_fc1_bias=True, mlp_fc2_bias=True,
               prenorm=False, rotary_emb_fraction=1.0,
               rotary_emb_interleaved=False, rotary_emb_scale_base=None)
    _bert_case(tmp_path, "nomicmoe", cfg, t, vocab_json=True)


def test_parity_neo_bert(tmp_path):
    """neo-bert (NeoBert, convert_hf:5588): pre-RMS blocks, fused qkv +
    w12, 2/3 ffn length, enc.output_norm, CLS pooling."""
    rng = np.random.default_rng(56)
    L, V, E, H, F = 2, 30, 32, 4, 96
    t = {"model.encoder.weight": rnd(rng, V, E),
         "model.layer_norm.weight": 1.0 + rnd(rng, E),
         "decoder.weight": rnd(rng, V, E)}
    for i in range(L):
        p = f"model.transformer_encoder.{i}."
        t[p + "attention_norm.weight"] = 1.0 + rnd(rng, E)
        t[p + "qkv.weight"] = rnd(rng, 3 * E, E)
        t[p + "wo.weight"] = rnd(rng, E, E)
        t[p + "ffn_norm.weight"] = 1.0 + rnd(rng, E)
        t[p + "ffn.w12.weight"] = rnd(rng, 2 * (2 * F // 3), E)
        t[p + "ffn.w3.weight"] = rnd(rng, E, 2 * F // 3)
    cfg = dict(architectures=["NeoBERT"], model_type="neobert",
               vocab_size=V, hidden_size=E, num_hidden_layers=L,
               num_attention_heads=H, intermediate_size=F,
               max_position_embeddings=64, norm_eps=1e-6)
    _bert_case(tmp_path, "neobert", cfg, t)


def test_parity_jina_bert_v2(tmp_path):
    """jina-bert-v2 (JinaBertV2Model, convert_hf:6827): GEGLU
    gated_layers + mlp.layernorm over the bert-style encoder."""
    rng = np.random.default_rng(57)
    L, V, E, H, F = 2, 30, 32, 4, 64
    t = {"embeddings.word_embeddings.weight": rnd(rng, V, E),
         "embeddings.token_type_embeddings.weight": rnd(rng, 2, E),
         "embeddings.LayerNorm.weight": 1.0 + rnd(rng, E),
         "embeddings.LayerNorm.bias": rnd(rng, E)}
    for i in range(L):
        p = f"encoder.layer.{i}."
        for nm in ("query", "key", "value"):
            t[p + f"attention.self.{nm}.weight"] = rnd(rng, E, E)
            t[p + f"attention.self.{nm}.bias"] = rnd(rng, E)
        t[p + "attention.output.dense.weight"] = rnd(rng, E, E)
        t[p + "attention.output.dense.bias"] = rnd(rng, E)
        t[p + "attention.output.LayerNorm.weight"] = 1.0 + rnd(rng, E)
        t[p + "attention.output.LayerNorm.bias"] = rnd(rng, E)
        t[p + "mlp.gated_layers.weight"] = rnd(rng, 2 * F, E)
        t[p + "mlp.wo.weight"] = rnd(rng, E, F)
        t[p + "mlp.wo.bias"] = rnd(rng, E)
        t[p + "mlp.layernorm.weight"] = 1.0 + rnd(rng, E)
        t[p + "mlp.layernorm.bias"] = rnd(rng, E)
    cfg = dict(architectures=["JinaBertForMaskedLM"], model_type="bert",
               vocab_size=V, hidden_size=E, num_hidden_layers=L,
               num_attention_heads=H, intermediate_size=F,
               max_position_embeddings=64, layer_norm_eps=1e-12,
               type_vocab_size=2, hidden_act="gelu",
               position_embedding_type="alibi")
    _bert_case(tmp_path, "jinav2", cfg, t)


# ---------------------------------------------------------------- round 4:
# multimodal text parts + tail archs


def test_parity_qwen2vl(tmp_path):
    rng = np.random.default_rng(40)
    cfg = dict(BASE_CFG, architectures=["Qwen2VLForConditionalGeneration"],
               model_type="qwen2_vl",
               rope_scaling={"type": "mrope", "mrope_section": [4, 2, 2]},
               vision_config={"depth": 2, "hidden_size": 32},
               tie_word_embeddings=False)
    t = llama_like_tensors(rng, bias=True)
    # vision tower must be skipped by the text conversion
    t["visual.blocks.0.attn.qkv.weight"] = rnd(rng, 96, 32)
    run_case(tmp_path, "qwen2vl", cfg, t)


def test_parity_qwen3vl(tmp_path):
    rng = np.random.default_rng(41)
    cfg = dict(BASE_CFG, architectures=["Qwen3VLForConditionalGeneration"],
               model_type="qwen3_vl", tie_word_embeddings=False)
    cfg["text_config"] = dict(
        BASE_CFG,
        rope_scaling={"rope_type": "default", "mrope_section": [4, 2, 2]},
    )
    cfg["vision_config"] = {"depth": 2, "hidden_size": 32,
                            "deepstack_visual_indexes": [0, 1]}
    t = llama_like_tensors(rng, qk_norm=True)
    t["model.visual.patch_embed.proj.weight"] = rnd(rng, 32, 3 * 2 * 8 * 8)
    run_case(tmp_path, "qwen3vl", cfg, t)


def test_parity_gemma3_cond(tmp_path):
    rng = np.random.default_rng(42)
    text = dict(vocab_size=261, hidden_size=64, num_hidden_layers=2,
                num_attention_heads=4, num_key_value_heads=2,
                intermediate_size=128, head_dim=16,
                max_position_embeddings=256, rms_norm_eps=1e-6,
                rope_theta=1000000.0, query_pre_attn_scalar=16,
                sliding_window=64)
    cfg = dict(architectures=["Gemma3ForConditionalGeneration"],
               model_type="gemma3", text_config=text,
               vision_config={"hidden_size": 48, "num_hidden_layers": 2},
               mm_tokens_per_image=16)
    t = {}
    pre = "language_model.model."
    t[pre + "embed_tokens.weight"] = rnd(rng, 261, 64)
    t[pre + "norm.weight"] = 1.0 + rnd(rng, 64)
    for i in range(2):
        p = f"{pre}layers.{i}."
        for nm, shp in (("self_attn.q_proj", (64, 64)),
                        ("self_attn.k_proj", (32, 64)),
                        ("self_attn.v_proj", (32, 64)),
                        ("self_attn.o_proj", (64, 64)),
                        ("mlp.gate_proj", (128, 64)),
                        ("mlp.up_proj", (128, 64)),
                        ("mlp.down_proj", (64, 128))):
            t[p + nm + ".weight"] = rnd(rng, *shp)
        for nm in ("input_layernorm", "post_attention_layernorm",
                   "pre_feedforward_layernorm", "post_feedforward_layernorm"):
            t[p + nm + ".weight"] = 1.0 + rnd(rng, 64)
        t[p + "self_attn.q_norm.weight"] = 1.0 + rnd(rng, 16)
        t[p + "self_attn.k_norm.weight"] = 1.0 + rnd(rng, 16)
    t["vision_tower.vision_model.embeddings.patch_embedding.weight"] = \
        rnd(rng, 48, 3, 8, 8)
    run_case(tmp_path, "gemma3cond", cfg, t, vocab="spm")


def _write_glm_bpe_tokenizer(d):
    # Glm4Model.set_vocab requires <|endoftext|> / <|user|> added tokens
    from tokenizers import Tokenizer, models, pre_tokenizers

    vocab = {chr(33 + i): i for i in range(256)}
    vocab.update({"<s>": 256, "</s>": 257})
    tok = Tokenizer(models.BPE(vocab=vocab, merges=[]))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=False)
    tok.add_special_tokens(["<|endoftext|>", "<|user|>"])
    tok.save(os.path.join(d, "tokenizer.json"))
    with open(os.path.join(d, "tokenizer_config.json"), "w") as f:
        json.dump({"add_bos_token": False,
                   "tokenizer_class": "PreTrainedTokenizerFast"}, f)


def test_parity_glm4v(tmp_path):
    rng = np.random.default_rng(43)
    cfg = dict(BASE_CFG, architectures=["Glm4vForConditionalGeneration"],
               model_type="glm4v", tie_word_embeddings=False,
               partial_rotary_factor=0.5)
    cfg["text_config"] = dict(BASE_CFG, partial_rotary_factor=0.5)
    cfg["vision_config"] = {"depth": 2, "hidden_size": 32}
    t = {}
    pre = "model.language_model."
    t[pre + "embed_tokens.weight"] = rnd(rng, 261, 64)
    t[pre + "norm.weight"] = 1.0 + rnd(rng, 64)
    t["lm_head.weight"] = rnd(rng, 261, 64)
    for i in range(2):
        p = f"{pre}layers.{i}."
        for nm, shp in (("self_attn.q_proj", (64, 64)),
                        ("self_attn.k_proj", (32, 64)),
                        ("self_attn.v_proj", (32, 64)),
                        ("self_attn.o_proj", (64, 64)),
                        ("mlp.gate_up_proj", (256, 64)),
                        ("mlp.down_proj", (64, 128))):
            t[p + nm + ".weight"] = rnd(rng, *shp)
        for nm in ("input_layernorm", "post_attention_layernorm",
                   "post_self_attn_layernorm", "post_mlp_layernorm"):
            t[p + nm + ".weight"] = 1.0 + rnd(rng, 64)
    t["model.visual.blocks.0.attn.qkv.weight"] = rnd(rng, 96, 32)
    cfg["vocab_size"] = 260
    t["model.language_model.embed_tokens.weight"] = rnd(rng, 260, 64)
    t["lm_head.weight"] = rnd(rng, 260, 64)
    d = str(tmp_path / "glm4v")
    save_ckpt(d, cfg, t, vocab="none")
    _write_glm_bpe_tokenizer(d)
    our_out = str(tmp_path / "glm4v_ours.gguf")
    ref_out = str(tmp_path / "glm4v_ref.gguf")
    from tpullama.tools.convert_hf import convert

    convert(d, our_out, outtype="f32", verbose=False)
    ref_convert(d, ref_out)
    compare_ggufs(ref_out, our_out)


def test_parity_janus_text(tmp_path):
    rng = np.random.default_rng(44)
    cfg = dict(BASE_CFG, architectures=["JanusForConditionalGeneration"],
               model_type="janus", tie_word_embeddings=False)
    cfg["text_config"] = dict(BASE_CFG)
    cfg["vision_config"] = {"hidden_size": 48, "num_hidden_layers": 2}
    t = {f"model.language_model.{k.split('model.', 1)[1]}" if
         k.startswith("model.") else k: v
         for k, v in llama_like_tensors(rng).items()}
    t["model.vision_model.embeddings.patch_embedding.weight"] = \
        rnd(rng, 48, 3, 8, 8)
    t["model.aligner.fc1.weight"] = rnd(rng, 64, 48)
    t["model.vqmodel.quantize.embedding.weight"] = rnd(rng, 16, 8)
    run_case(tmp_path, "janustext", cfg, t)


def test_parity_cogvlm(tmp_path):
    rng = np.random.default_rng(45)
    cfg = dict(BASE_CFG, architectures=["CogVLMForCausalLM"],
               model_type="cogvlm", tie_word_embeddings=False,
               vision_config={"hidden_size": 48, "num_hidden_layers": 2})
    cfg.pop("head_dim")
    E, F = 64, 128
    t = {"model.embed_tokens.weight": rnd(rng, 261, E),
         "model.norm.weight": 1.0 + rnd(rng, E),
         "lm_head.weight": rnd(rng, 261, E)}
    for i in range(2):
        p = f"model.layers.{i}."
        t[p + "input_layernorm.weight"] = 1.0 + rnd(rng, E)
        t[p + "post_attention_layernorm.weight"] = 1.0 + rnd(rng, E)
        for ex in ("language_expert", "vision_expert"):
            t[p + f"self_attn.{ex}_query_key_value.weight"] = rnd(rng, 3 * E, E)
            t[p + f"self_attn.{ex}_dense.weight"] = rnd(rng, E, E)
        for ml in ("language_mlp", "vision_mlp"):
            t[p + f"mlp.{ml}.up_proj.weight"] = rnd(rng, F, E)
            t[p + f"mlp.{ml}.gate_proj.weight"] = rnd(rng, F, E)
            t[p + f"mlp.{ml}.down_proj.weight"] = rnd(rng, E, F)
    t["model.vision.patch_embedding.proj.weight"] = rnd(rng, 48, 3, 8, 8)
    run_case(tmp_path, "cogvlm", cfg, t)


def test_parity_wavtokenizer(tmp_path):
    rng = np.random.default_rng(46)
    C, FEAT, NFF, SPEC, V = 24, 16, 32, 34, 64
    cfg = dict(
        architectures=["WavTokenizerDec"], model_type="wavtokenizer-dec",
        hidden_size=SPEC, n_embd_features=FEAT, n_ff=NFF, vocab_size=V,
        n_head=1, layer_norm_epsilon=1e-6, group_norm_epsilon=1e-6,
        group_norm_groups=8, max_position_embeddings=8192, n_layer=12,
        posnet={"n_embd": C, "n_layer": 6},
        convnext={"n_embd": C, "n_layer": 2},
    )
    t = {"backbone.embedding.weight": rnd(rng, V, FEAT),
         "backbone.embed.weight": rnd(rng, C, FEAT, 7),
         "backbone.embed.bias": rnd(rng, C, 1),
         "backbone.norm.weight": 1.0 + rnd(rng, C),
         "backbone.norm.bias": rnd(rng, C),
         "backbone.final_layer_norm.weight": 1.0 + rnd(rng, C),
         "backbone.final_layer_norm.bias": rnd(rng, C),
         "head.out.weight": rnd(rng, SPEC, C),
         "head.out.bias": rnd(rng, SPEC)}
    for i in (0, 1, 3, 4):
        p = f"backbone.posnet.{i}."
        t[p + "norm1.weight"] = 1.0 + rnd(rng, C, 1)
        t[p + "norm1.bias"] = rnd(rng, C, 1)
        t[p + "conv1.weight"] = rnd(rng, C, C, 3)
        t[p + "conv1.bias"] = rnd(rng, C, 1)
        t[p + "norm2.weight"] = 1.0 + rnd(rng, C, 1)
        t[p + "norm2.bias"] = rnd(rng, C, 1)
        t[p + "conv2.weight"] = rnd(rng, C, C, 3)
        t[p + "conv2.bias"] = rnd(rng, C, 1)
    for i in (2, 5):
        p = f"backbone.posnet.{i}."
        t[p + "norm.weight"] = 1.0 + rnd(rng, C, 1)
        t[p + "norm.bias"] = rnd(rng, C, 1)
    for nm in ("q", "k", "v", "proj_out"):
        t[f"backbone.posnet.2.{nm}.weight"] = rnd(rng, C, C, 1)
        t[f"backbone.posnet.2.{nm}.bias"] = rnd(rng, C, 1)
    for i in range(2):
        p = f"backbone.convnext.{i}."
        t[p + "dwconv.weight"] = rnd(rng, C, 1, 7)
        t[p + "dwconv.bias"] = rnd(rng, C, 1)
        t[p + "norm.weight"] = 1.0 + rnd(rng, C)
        t[p + "norm.bias"] = rnd(rng, C)
        t[p + "pwconv1.weight"] = rnd(rng, NFF, C)
        t[p + "pwconv1.bias"] = rnd(rng, NFF)
        t[p + "pwconv2.weight"] = rnd(rng, C, NFF)
        t[p + "pwconv2.bias"] = rnd(rng, C)
        t[p + "gamma.weight"] = rnd(rng, C)
    run_case(tmp_path, "wavtok", cfg, t, vocab="none")


def test_parity_plamo_v1(tmp_path):
    # the reference's shuffle_attn_*_weight hardcodes the real 5120 dims
    # (PlamoModel:4765) — a parity case must use them; one layer keeps
    # the checkpoint ~400 MB
    rng = np.random.default_rng(47)
    E, H, F, V = 5120, 40, 256, 270
    cfg = dict(
        architectures=["PlamoForCausalLM"], model_type="plamo",
        vocab_size=V, hidden_size=E, num_hidden_layers=1,
        num_attention_heads=H, num_key_value_heads=H,
        intermediate_size=F, max_position_embeddings=4096,
        rms_norm_eps=1e-6, bos_token_id=1, eos_token_id=2,
    )
    t = {"model.embed_tokens.weight": rnd(rng, V, E),
         "model.norm.weight": 1.0 + rnd(rng, E),
         "lm_head.weight": rnd(rng, V, E)}
    p = "model.layers.layers.0."
    t[p + "norm.weight"] = 1.0 + rnd(rng, E)
    t[p + "self_attn.q_proj.weight"] = rnd(rng, E, E)
    t[p + "self_attn.k_proj.weight"] = rnd(rng, E // 8, E)
    t[p + "self_attn.v_proj.weight"] = rnd(rng, E // 8, E)
    t[p + "self_attn.o_proj.weight"] = rnd(rng, E, E)
    t[p + "self_attn.rotary_emb.inv_freq"] = rnd(rng, 64)
    t[p + "mlp.gate_proj.weight"] = rnd(rng, F, E)
    t[p + "mlp.up_proj.weight"] = rnd(rng, F, E)
    t[p + "mlp.down_proj.weight"] = rnd(rng, E, F)
    run_case(tmp_path, "plamo1", cfg, t, vocab="spm")


def test_parity_gemma3n(tmp_path):
    rng = np.random.default_rng(48)
    E, F, HD, PLI, V = 64, 128, 16, 32, 261
    text = dict(vocab_size=V, vocab_size_per_layer_input=V,
                hidden_size=E, num_hidden_layers=2,
                num_attention_heads=4, num_key_value_heads=2,
                intermediate_size=[F, F], head_dim=HD,
                max_position_embeddings=256, rms_norm_eps=1e-6,
                rope_theta=1000000.0, rope_local_base_freq=10000.0,
                query_pre_attn_scalar=256, sliding_window=64,
                altup_active_idx=0, altup_num_inputs=4,
                hidden_size_per_layer_input=PLI, num_kv_shared_layers=1,
                activation_sparsity_pattern=[0.95, 0.0],
                layer_types=["sliding_attention", "full_attention"],
                bos_token_id=1, eos_token_id=2)
    cfg = dict(architectures=["Gemma3nForConditionalGeneration"],
               model_type="gemma3n", text_config=text,
               vision_config={"hidden_size": 48},
               audio_config={"hidden_size": 48})
    pre = "model.language_model."
    t = {pre + "embed_tokens.weight": rnd(rng, V, E),
         pre + "embed_tokens_per_layer.weight": rnd(rng, V, 2 * PLI),
         pre + "per_layer_model_projection.weight": rnd(rng, 2 * PLI, E),
         pre + "per_layer_projection_norm.weight": 1.0 + rnd(rng, PLI),
         pre + "norm.weight": 1.0 + rnd(rng, E)}
    for i in range(3):
        t[pre + f"altup_projections.{i}.weight"] = rnd(rng, E, E)
        t[pre + f"altup_unembed_projections.{i}.weight"] = rnd(rng, E, E)
    for i in range(2):
        p = f"{pre}layers.{i}."
        for nm, shp in (("self_attn.q_proj", (4 * HD, E)),
                        ("self_attn.k_proj", (2 * HD, E)),
                        ("self_attn.v_proj", (2 * HD, E)),
                        ("self_attn.o_proj", (E, 4 * HD)),
                        ("mlp.gate_proj", (F, E)),
                        ("mlp.up_proj", (F, E)),
                        ("mlp.down_proj", (E, F))):
            t[p + nm + ".weight"] = rnd(rng, *shp)
        for nm, d in (("input_layernorm", E),
                      ("post_attention_layernorm", E),
                      ("pre_feedforward_layernorm", E),
                      ("post_feedforward_layernorm", E),
                      ("self_attn.q_norm", HD), ("self_attn.k_norm", HD),
                      ("altup.router_norm", E),
                      ("laurel.post_laurel_norm", E),
                      ("post_per_layer_input_norm", E)):
            t[p + nm + ".weight"] = 1.0 + rnd(rng, d)
        t[p + "per_layer_input_gate.weight"] = rnd(rng, PLI, E)
        t[p + "per_layer_projection.weight"] = rnd(rng, E, PLI)
        t[p + "altup.correction_coefs.weight"] = rnd(rng, 4, 4)
        t[p + "altup.prediction_coefs.weight"] = rnd(rng, 16, 4)
        t[p + "altup.correct_output_scale"] = rnd(rng, E)
        t[p + "altup.modality_router.weight"] = rnd(rng, 4, E)
        t[p + "laurel.linear_left.weight"] = rnd(rng, 8, E)
        t[p + "laurel.linear_right.weight"] = rnd(rng, E, 8)
    run_case(tmp_path, "gemma3n", cfg, t, vocab="spm")
