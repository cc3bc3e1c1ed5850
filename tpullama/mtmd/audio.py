"""Whisper-style audio preprocessing (reference: tools/mtmd/mtmd-audio.cpp).

Log-mel spectrogram with the exact whisper semantics the reference ships:
16 kHz input, 400-sample periodic Hann window, hop 160, 30 s zero tail pad
plus 200-sample reflective pads, 128 Slaney-mel bins (the reference embeds
a precalculated table generated from whisper's mel_filters.npz,
mtmd-audio.cpp:340-357; we regenerate the same filterbank from the public
Slaney formula), log10 floor 1e-10, (max-8) clamp, (x+4)/4 scaling, and
3000-frame chunking (preprocess_audio, mtmd-audio.cpp:283-334).
"""

from __future__ import annotations

import functools

import numpy as np

SAMPLE_RATE = 16000
N_FFT = 400
HOP_LENGTH = 160
CHUNK_SIZE = 30  # seconds
FRAMES_PER_CHUNK = 3000
N_MEL = 128


@functools.lru_cache(maxsize=2)
def mel_filters(n_mel: int = N_MEL, n_fft: int = N_FFT,
                sr: int = SAMPLE_RATE) -> np.ndarray:
    """Slaney-scale, Slaney-normalized mel filterbank (n_mel, n_fft//2+1) —
    librosa.filters.mel(sr=16000, n_fft=400, n_mels=128) semantics, the
    source of whisper's mel_filters.npz and hence of the reference's
    whisper_precalc_filters::get_128_bins() (verified to agree with the
    embedded table to ~1e-9)."""

    def hz_to_mel(f):
        f = np.asanyarray(f, dtype=np.float64)
        f_sp = 200.0 / 3
        mels = f / f_sp
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / f_sp
        logstep = np.log(6.4) / 27.0
        if mels.ndim:
            log_t = f >= min_log_hz
            mels[log_t] = min_log_mel + np.log(f[log_t] / min_log_hz) / logstep
        elif f >= min_log_hz:
            mels = min_log_mel + np.log(f / min_log_hz) / logstep
        return mels

    def mel_to_hz(m):
        m = np.asanyarray(m, dtype=np.float64)
        f_sp = 200.0 / 3
        freqs = f_sp * m
        min_log_hz = 1000.0
        min_log_mel = min_log_hz / f_sp
        logstep = np.log(6.4) / 27.0
        log_t = m >= min_log_mel
        freqs[log_t] = min_log_hz * np.exp(logstep * (m[log_t] - min_log_mel))
        return freqs

    fftfreqs = np.fft.rfftfreq(n=n_fft, d=1.0 / sr)
    mel_f = mel_to_hz(np.linspace(hz_to_mel(0.0), hz_to_mel(sr / 2.0),
                                  n_mel + 2))
    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]
    weights = np.zeros((n_mel, len(fftfreqs)))
    for i in range(n_mel):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        weights[i] = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_f[2 : n_mel + 2] - mel_f[:n_mel])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def _hann_window(n: int = N_FFT) -> np.ndarray:
    """Periodic Hann, f32 like fill_hann_window (mtmd-audio.cpp:45-53)."""
    i = np.arange(n, dtype=np.float64)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * i / n))).astype(np.float32)


def log_mel_spectrogram(samples: np.ndarray, n_mel: int = N_MEL) -> np.ndarray:
    """samples: 1-D float32 PCM at 16 kHz -> (n_mel, n_len) log-mel
    (log_mel_spectrogram, mtmd-audio.cpp:193-278)."""
    samples = np.asarray(samples, np.float32).reshape(-1)
    n_samples = len(samples)
    stage_1_pad = SAMPLE_RATE * 30
    stage_2_pad = N_FFT // 2
    padded = np.zeros(n_samples + stage_1_pad + 2 * stage_2_pad, np.float32)
    padded[stage_2_pad : stage_2_pad + n_samples] = samples
    # reflective pad at the beginning (reverse of samples[1:1+200])
    padded[:stage_2_pad] = samples[1 : 1 + stage_2_pad][::-1]

    n_len = (len(padded) - N_FFT) // HOP_LENGTH
    n_frames_active = min(
        (n_samples + stage_2_pad) // HOP_LENGTH + 1, n_len
    )
    # windowed frames (only frames overlapping real samples; the rest of
    # the padded region is all-zero -> log10(1e-10))
    hann = _hann_window()
    idx = (np.arange(n_frames_active)[:, None] * HOP_LENGTH
           + np.arange(N_FFT)[None, :])
    frames = padded[idx] * hann[None, :]  # (F, 400) f32 products
    spec = np.fft.rfft(frames.astype(np.float64), axis=-1)
    power = (spec.real**2 + spec.imag**2)  # (F, 201)
    filters = mel_filters(n_mel).astype(np.float64)
    mel = power @ filters.T  # float64 accumulation like the double sum
    mel = np.log10(np.maximum(mel, 1e-10))  # (F, n_mel)

    out = np.full((n_mel, n_len), np.log10(1e-10), np.float64)
    out[:, :n_frames_active] = mel.T
    mmax = out.max() - 8.0
    out = np.maximum(out, mmax)
    out = (out + 4.0) / 4.0
    return out.astype(np.float32)


def preprocess_audio(samples: np.ndarray, n_mel: int = N_MEL) -> list:
    """-> list of (n_mel, 3000) f32 mel chunks (preprocess_audio,
    mtmd-audio.cpp:283-334; incomplete trailing chunks are dropped — the
    30 s zero tail guarantees at least one full chunk)."""
    if len(samples) == 0:
        return []
    mel = log_mel_spectrogram(samples, n_mel)
    chunks = []
    n_len = mel.shape[1]
    for off in range(0, n_len, FRAMES_PER_CHUNK):
        if n_len - off < FRAMES_PER_CHUNK:
            break
        chunks.append(np.ascontiguousarray(mel[:, off : off + FRAMES_PER_CHUNK]))
    return chunks


def load_wav(path: str) -> np.ndarray:
    """Minimal WAV reader -> mono float32 at 16 kHz (PCM16/PCM32/float32;
    naive linear resample for other rates — the reference uses miniaudio,
    mtmd-helper.cpp audio_helpers)."""
    import struct
    import wave

    with wave.open(path, "rb") as w:
        nch = w.getnchannels()
        width = w.getsampwidth()
        rate = w.getframerate()
        raw = w.readframes(w.getnframes())
    if width == 2:
        data = np.frombuffer(raw, "<i2").astype(np.float32) / 32768.0
    elif width == 4:
        data = np.frombuffer(raw, "<i4").astype(np.float32) / 2147483648.0
    elif width == 1:
        data = (np.frombuffer(raw, np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    if nch > 1:
        data = data.reshape(-1, nch).mean(axis=1)
    if rate != SAMPLE_RATE:
        n_out = int(round(len(data) * SAMPLE_RATE / rate))
        x_old = np.linspace(0.0, 1.0, len(data), endpoint=False)
        x_new = np.linspace(0.0, 1.0, n_out, endpoint=False)
        data = np.interp(x_new, x_old, data).astype(np.float32)
    return data.astype(np.float32)
