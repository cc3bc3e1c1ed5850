"""WavTokenizer decoder (the TTS vocoder arch `wavtokenizer-dec`).

Codes-to-speech model: audio-code tokens -> (T, n_embd=1282) spectrogram
embeddings (log-magnitude + phase halves) -> inverse STFT -> waveform.
Structure per the reference graph builder
(src/models/wavtokenizer-dec.cpp): token embedding -> 7-wide conv ->
posnet (resnet/resnet/attn/resnet/resnet/groupnorm, all 3-wide convs,
silu via x*sigmoid(x)) -> token layernorm -> ConvNeXt blocks (7-wide
depthwise conv, layernorm, GELU MLP, gamma scale, residual) -> output
norm + head. The ISTFT synthesis replicates tools/tts/tts.cpp
embd_to_audio:201-290 exactly (including its N-normalized half-spectrum
inverse transform).

TPU-first notes: the forward is one jit program in (T, C) layout; convs
are `lax.conv_general_dilated` NWC/OIW (MXU-friendly); the ISTFT is a
batched numpy irfft on host (it is O(n_codes * n_fft log n_fft), trivial
next to the model).
"""

from __future__ import annotations

import functools

import numpy as np

from ..gguf import GGUFReader


class WavTokenizer:
    def __init__(self, reader: GGUFReader):
        self.reader = reader
        kv = reader.kv
        arch = kv.get("general.architecture")
        if arch != "wavtokenizer-dec":
            raise ValueError(f"not a wavtokenizer-dec model: {arch!r}")
        g = lambda k, d=None: kv.get(f"wavtokenizer-dec.{k}", d)
        self.n_embd = int(g("embedding_length"))
        self.n_ff = int(g("feed_forward_length"))
        self.n_embd_features = int(g("features_length"))
        self.posnet_n_embd = int(g("posnet.embedding_length"))
        self.posnet_n_layer = int(g("posnet.block_count", 6))
        self.convnext_n_embd = int(g("convnext.embedding_length"))
        self.convnext_n_layer = int(g("convnext.block_count", 12))
        self.norm_eps = float(g("attention.layer_norm_epsilon", 1e-6))
        self.group_eps = float(g("attention.group_norm_epsilon", 1e-6))
        self.n_groups = int(g("attention.group_norm_groups", 32))
        if self.posnet_n_layer > 6:
            raise ValueError("posnet supports at most 6 layers (the "
                             "reference's fixed block pattern)")

        t = reader.tensor_f32
        import jax.numpy as jnp

        j = lambda name: jnp.asarray(t(name))

        def vec(name):
            return jnp.asarray(t(name).reshape(-1))

        p: dict = {
            "tok_embd": j("token_embd.weight"),
            "conv1d": j("conv1d.weight"),
            "conv1d_b": vec("conv1d.bias"),
            "tok_norm": vec("token_embd_norm.weight"),
            "tok_norm_b": vec("token_embd_norm.bias"),
            "output_norm": vec("output_norm.weight"),
            "output_norm_b": vec("output_norm.bias"),
            "output": j("output.weight"),
            "output_b": vec("output.bias"),
            "posnet": [],
            "convnext": [],
        }
        for i in range(self.posnet_n_layer):
            pre = f"posnet.{i}."
            if i == 2:
                p["posnet"].append({
                    "attn_norm": vec(pre + "attn_norm.weight"),
                    "attn_norm_b": vec(pre + "attn_norm.bias"),
                    "attn_q": j(pre + "attn_q.weight"),
                    "attn_q_b": vec(pre + "attn_q.bias"),
                    "attn_k": j(pre + "attn_k.weight"),
                    "attn_k_b": vec(pre + "attn_k.bias"),
                    "attn_v": j(pre + "attn_v.weight"),
                    "attn_v_b": vec(pre + "attn_v.bias"),
                    "attn_o": j(pre + "attn_output.weight"),
                    "attn_o_b": vec(pre + "attn_output.bias"),
                })
            elif i == 5:
                p["posnet"].append({
                    "norm": vec(pre + "attn_norm.weight"),
                    "norm_b": vec(pre + "attn_norm.bias"),
                })
            else:
                p["posnet"].append({
                    "norm1": vec(pre + "norm1.weight"),
                    "norm1_b": vec(pre + "norm1.bias"),
                    "conv1": j(pre + "conv1.weight"),
                    "conv1_b": vec(pre + "conv1.bias"),
                    "norm2": vec(pre + "norm2.weight"),
                    "norm2_b": vec(pre + "norm2.bias"),
                    "conv2": j(pre + "conv2.weight"),
                    "conv2_b": vec(pre + "conv2.bias"),
                })
        for i in range(self.convnext_n_layer):
            pre = f"convnext.{i}."
            p["convnext"].append({
                "dw": j(pre + "dw.weight"),
                "dw_b": vec(pre + "dw.bias"),
                "norm": vec(pre + "norm.weight"),
                "norm_b": vec(pre + "norm.bias"),
                "pw1": j(pre + "pw1.weight"),
                "pw1_b": vec(pre + "pw1.bias"),
                "pw2": j(pre + "pw2.weight"),
                "pw2_b": vec(pre + "pw2.bias"),
                "gamma": vec(pre + "gamma.weight"),
            })
        self.params = p


def load_wavtokenizer(source) -> WavTokenizer:
    return WavTokenizer(GGUFReader(source))


def _conv1d_same(x, w, b, groups: int = 1):
    """x: (T, C_in); w: (C_out, C_in/groups, K) OIW; same padding."""
    import jax.numpy as jnp
    from jax import lax

    K = w.shape[-1]
    pad = (K - 1) // 2
    y = lax.conv_general_dilated(
        x[None], w, window_strides=(1,), padding=[(pad, pad)],
        dimension_numbers=("NWC", "OIW", "NWC"),
        feature_group_count=groups,
    )[0]
    return y + b


def _layer_norm(x, w, b, eps):
    import jax.numpy as jnp

    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * w + b


def _group_norm(x, w, b, groups, eps):
    """x: (T, C); normalize each contiguous channel group over (T, C/g)
    (build_norm LLM_NORM_GROUP, llama-graph.cpp:675-680)."""
    import jax.numpy as jnp

    T, C = x.shape
    xg = x.reshape(T, groups, C // groups)
    mu = jnp.mean(xg, axis=(0, 2), keepdims=True)
    var = jnp.var(xg, axis=(0, 2), keepdims=True)
    xn = ((xg - mu) / jnp.sqrt(var + eps)).reshape(T, C)
    return xn * w + b


def _silu(x):
    import jax

    return x * jax.nn.sigmoid(x)


def wavtokenizer_forward(params, codes, *, n_groups, group_eps, norm_eps,
                         posnet_n_embd, posnet_n_layer):
    """codes: (T,) int32 -> (T, n_embd) f32 spectrogram embeddings."""
    import jax
    import jax.numpy as jnp

    x = jnp.take(params["tok_embd"], codes, axis=0)  # (T, feat)
    x = _conv1d_same(x, params["conv1d"], params["conv1d_b"])  # (T, P)

    for il in range(posnet_n_layer):
        w = params["posnet"][il]
        if il == 2:
            h = _group_norm(x, w["attn_norm"], w["attn_norm_b"],
                            n_groups, group_eps)
            q = _conv1d_same(h, w["attn_q"], w["attn_q_b"])
            k = _conv1d_same(h, w["attn_k"], w["attn_k_b"])
            v = _conv1d_same(h, w["attn_v"], w["attn_v_b"])
            # single-head non-causal attention over time, scale by the
            # posnet embedding width (wavtokenizer-dec.cpp:73)
            att = jax.nn.softmax(
                (q @ k.T) / jnp.sqrt(jnp.float32(posnet_n_embd)), axis=-1
            )
            h = att @ v
            h = _conv1d_same(h, w["attn_o"], w["attn_o_b"])
            x = x + h
        elif il == 5:
            x = _group_norm(x, w["norm"], w["norm_b"], n_groups, group_eps)
        else:
            h = _group_norm(x, w["norm1"], w["norm1_b"], n_groups, group_eps)
            h = _silu(h)
            h = _conv1d_same(h, w["conv1"], w["conv1_b"])
            h = _group_norm(h, w["norm2"], w["norm2_b"], n_groups, group_eps)
            h = _silu(h)
            h = _conv1d_same(h, w["conv2"], w["conv2_b"])
            x = x + h

    x = _layer_norm(x, params["tok_norm"], params["tok_norm_b"], norm_eps)

    for w in params["convnext"]:
        h = _conv1d_same(x, w["dw"], w["dw_b"], groups=x.shape[-1])
        h = _layer_norm(h, w["norm"], w["norm_b"], norm_eps)
        h = jax.nn.gelu(h @ w["pw1"].T + w["pw1_b"], approximate=False)
        h = h @ w["pw2"].T + w["pw2_b"]
        x = x + h * w["gamma"]

    x = _layer_norm(x, params["output_norm"], params["output_norm_b"],
                    norm_eps)
    return x @ params["output"].T + params["output_b"]


def decode_codes(model: WavTokenizer, codes) -> np.ndarray:
    """codes (T,) -> (T, n_embd) f32 embeddings (jit per length)."""
    import jax
    import jax.numpy as jnp

    fn = jax.jit(functools.partial(
        wavtokenizer_forward,
        n_groups=model.n_groups, group_eps=model.group_eps,
        norm_eps=model.norm_eps, posnet_n_embd=model.posnet_n_embd,
        posnet_n_layer=model.posnet_n_layer,
    ))
    return np.asarray(fn(model.params, jnp.asarray(codes, jnp.int32)))


def hann_window(n: int, periodic: bool = True) -> np.ndarray:
    denom = n if periodic else n - 1
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n) / denom))).astype(
        np.float32)


def embd_to_audio(embd: np.ndarray, n_fft: int = 1280,
                  n_hop: int = 320) -> np.ndarray:
    """(n_codes, n_embd) -> waveform. Exact port of tts.cpp
    embd_to_audio:201-290: first half of each row is log-magnitude
    (clamped at 1e2), second half phase; per-frame inverse transform is
    the reference's N-normalized half-spectrum sum (NOT a standard
    irfft); hann windowing, fold overlap-add, envelope normalization."""
    n_codes, n_embd = embd.shape
    half = n_embd // 2
    if half != n_fft // 2 + 1:
        # non-standard model width (tests / other checkpoints): the
        # spectrum rows are rfft bins, so n_fft = n_embd - 2; keep the
        # reference's 4x overlap (1280/320)
        n_fft = n_embd - 2
        n_hop = max(1, n_fft // 4)
    n_win = n_fft
    n_pad = (n_win - n_hop) // 2
    n_out = (n_codes - 1) * n_hop + n_win

    mag = np.minimum(np.exp(embd[:, :half]), 1e2)
    phi = embd[:, half:]
    spec = (mag * np.cos(phi)) + 1j * (mag * np.sin(phi))  # (n_codes, half)

    # reference irfft (tts.cpp:127-158): out[k] = Re(sum_m X_m e^{+i2pikm/n})/N
    # == n * ifft(pad(X, n))/N taken real
    N = n_fft // 2 + 1
    assert half == N, (half, N)
    frames = np.real(np.fft.ifft(spec, n=n_fft, axis=-1)) * (n_fft / N)

    hann = hann_window(n_fft, periodic=True)
    res = (frames * hann).astype(np.float64).reshape(-1)
    hann2 = np.tile(hann * hann, n_codes).astype(np.float64)

    def fold(data):
        out = np.zeros(n_out, np.float64)
        idx = 0
        for w_col in range(n_out):
            start = w_col * n_hop - n_pad
            seg = data[idx: idx + n_win]
            if seg.size == 0:
                break
            lo = max(0, start)
            hi = min(n_out, start + n_win)
            if hi > lo:
                out[lo:hi] += seg[lo - start: hi - start]
            idx += n_win
        return out[n_pad: n_out - n_pad]

    audio = fold(res)
    env = fold(hann2)
    return (audio / np.maximum(env, 1e-12)).astype(np.float32)


def codes_to_audio(model: WavTokenizer, codes) -> np.ndarray:
    return embd_to_audio(decode_codes(model, codes))


def write_wav(path, audio: np.ndarray, sample_rate: int = 24000):
    """16-bit mono WAV (save_wav16, tts.cpp:76-113)."""
    import struct
    import wave

    pcm = np.clip(audio, -1.0, 1.0)
    pcm = (pcm * 32767.0).astype(np.int16)
    with wave.open(str(path), "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(pcm.tobytes())
