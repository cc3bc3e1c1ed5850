"""WavTokenizer-dec (TTS vocoder) tests.

Oracle: a small C harness linked against the reference's libllama
(built at /tmp/refbuild) runs llama_encode on the same tiny GGUF and
dumps per-token embeddings — our JAX forward must match. When the
reference build is absent those tests skip; structural tests still run.
"""

import os
import struct
import subprocess
import tempfile

import numpy as np
import pytest

from tpullama.models.testing import make_tiny_wavtokenizer_gguf
from tpullama.models.wavtokenizer import (codes_to_audio, decode_codes,
                                          embd_to_audio, hann_window,
                                          load_wavtokenizer, write_wav)

REFBUILD = os.environ.get("TPULLAMA_REF_BUILD", "/tmp/refbuild")
REFERENCE = os.environ.get("TPULLAMA_REFERENCE_ROOT", "/root/reference")

_ORACLE_SRC = r"""
#include "llama.h"
#include <cstdio>
#include <cstdlib>

int main(int argc, char ** argv) {
    // usage: oracle model.gguf code0 code1 ...
    llama_backend_init();
    llama_model_params mp = llama_model_default_params();
    mp.n_gpu_layers = 0;
    llama_model * model = llama_model_load_from_file(argv[1], mp);
    if (!model) { fprintf(stderr, "load failed\n"); return 1; }
    llama_context_params cp = llama_context_default_params();
    cp.embeddings = true;
    cp.n_ctx = 512; cp.n_batch = 512; cp.n_ubatch = 512;
    llama_context * ctx = llama_init_from_model(model, cp);
    if (!ctx) { fprintf(stderr, "ctx failed\n"); return 1; }
    int n = argc - 2;
    llama_batch batch = llama_batch_init(n, 0, 1);
    for (int i = 0; i < n; i++) {
        batch.token[i] = atoi(argv[i + 2]);
        batch.pos[i] = i;
        batch.n_seq_id[i] = 1;
        batch.seq_id[i][0] = 0;
        batch.logits[i] = 1;
    }
    batch.n_tokens = n;
    if (llama_encode(ctx, batch) != 0) { fprintf(stderr, "encode failed\n"); return 1; }
    const float * e = llama_get_embeddings(ctx);
    int n_embd = llama_model_n_embd(model);
    fwrite(&n, sizeof(int), 1, stdout);
    fwrite(&n_embd, sizeof(int), 1, stdout);
    fwrite(e, sizeof(float), (size_t) n * n_embd, stdout);
    return 0;
}
"""


def _build_oracle():
    if not os.path.exists(os.path.join(REFBUILD, "bin", "libllama.so")):
        return None
    exe = os.path.join(tempfile.gettempdir(), "tpullama_wavtok_oracle")
    if not os.path.exists(exe):
        src = exe + ".cpp"
        with open(src, "w") as f:
            f.write(_ORACLE_SRC)
        cmd = [
            "g++", "-O1", "-o", exe, src,
            "-I" + os.path.join(REFERENCE, "include"),
            "-I" + os.path.join(REFERENCE, "ggml", "include"),
            "-L" + os.path.join(REFBUILD, "bin"),
            "-Wl,-rpath," + os.path.join(REFBUILD, "bin"),
            "-lllama", "-lggml",
        ]
        r = subprocess.run(cmd, capture_output=True)
        if r.returncode != 0:
            return None
    return exe


def _ref_embeddings(exe, gguf_path, codes):
    out = subprocess.run(
        [exe, gguf_path] + [str(int(c)) for c in codes],
        capture_output=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-1500:]
    n, n_embd = struct.unpack("<ii", out.stdout[:8])
    return np.frombuffer(out.stdout[8:], np.float32).reshape(n, n_embd)


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("wavtok") / "wt.gguf")
    make_tiny_wavtokenizer_gguf(p, seed=11)
    return p


def test_forward_shapes(tiny):
    m = load_wavtokenizer(tiny)
    codes = np.arange(12, dtype=np.int32) % 64
    e = decode_codes(m, codes)
    assert e.shape == (12, m.n_embd)
    assert np.all(np.isfinite(e))


def test_matches_reference_libllama(tiny):
    exe = _build_oracle()
    if exe is None:
        pytest.skip("reference libllama not available")
    codes = (np.arange(17, dtype=np.int32) * 7) % 64
    want = _ref_embeddings(exe, tiny, codes)
    m = load_wavtokenizer(tiny)
    got = decode_codes(m, codes)
    assert want.shape == got.shape
    # the reference's ggml_conv_1d goes through fp16 im2col (inputs cast
    # to f16 per conv); ours stays f32, so allow fp16-rounding slack
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)
    corr = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    assert corr > 0.99999, corr


def test_embd_to_audio_matches_loop_port():
    """FFT-based synthesis == a literal loop port of tts.cpp
    embd_to_audio:201-290 on tiny sizes."""
    n_fft, n_hop = 16, 4
    n_codes, n_embd = 5, n_fft + 2
    rng = np.random.default_rng(0)
    embd = rng.standard_normal((n_codes, n_embd)).astype(np.float32) * 0.3

    got = embd_to_audio(embd, n_fft=n_fft, n_hop=n_hop)

    # literal port
    N = n_fft // 2 + 1
    hann = hann_window(n_fft)
    half = n_embd // 2
    res = np.zeros((n_codes, n_fft))
    for l in range(n_codes):
        mag = np.minimum(np.exp(embd[l, :half]), 1e2)
        phi = embd[l, half:]
        re = mag * np.cos(phi)
        im = mag * np.sin(phi)
        for k in range(n_fft):
            acc = 0.0
            for mth in range(N):
                ang = 2 * np.pi * k * mth / n_fft
                acc += re[mth] * np.cos(ang) - im[mth] * np.sin(ang)
            res[l, k] = acc / N * hann[k]
    n_win = n_fft
    n_pad = (n_win - n_hop) // 2
    n_out = (n_codes - 1) * n_hop + n_win
    data = res.reshape(-1)
    hann2 = np.tile(hann * hann, n_codes)

    def fold(d):
        out = np.zeros(n_out)
        idx = 0
        for w_col in range(n_out):
            start = w_col * n_hop - n_pad
            for w_im in range(start, start + n_win):
                if 0 <= w_im < n_out and idx < d.size:
                    out[w_im] += d[idx]
                idx += 1
        return out[n_pad: n_out - n_pad]

    audio = fold(data)
    env = fold(hann2)
    want = (audio / np.maximum(env, 1e-12)).astype(np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_codes_to_audio_and_wav(tiny, tmp_path):
    import wave

    m = load_wavtokenizer(tiny)
    codes = np.arange(8, dtype=np.int32)
    audio = codes_to_audio(m, codes)
    assert audio.ndim == 1 and np.all(np.isfinite(audio))
    p = tmp_path / "out.wav"
    write_wav(p, audio, 24000)
    with wave.open(str(p)) as f:
        assert f.getframerate() == 24000
        assert f.getnchannels() == 1
        assert f.getnframes() == audio.size
