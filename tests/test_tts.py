"""TTS pipeline tests (llama-tts analog): prompt processing, code
extraction, and the codes->audio path on a tiny vocoder."""

import numpy as np
import pytest

from tpullama.tools.tts_cli import (build_prompt, extract_codes,
                                    number_to_words, process_text,
                                    replace_numbers_with_words,
                                    speaker_audio_data, speaker_audio_text)


def test_number_to_words():
    assert number_to_words(0) == "zero"
    assert number_to_words(7) == "seven"
    assert number_to_words(19) == "nineteen"
    assert number_to_words(42) == "forty two"
    assert number_to_words(100) == "one hundred"
    assert number_to_words(215) == "two hundred fifteen"
    assert number_to_words(1000) == "one thousand"
    assert number_to_words(1234) == "one thousand two hundred thirty four"
    assert number_to_words(2000000) == "two million"


def test_process_text_v02():
    # numbers spelled out, lowercase, punctuation -> space, sep joined
    out = process_text("Hello, World! 42")
    assert out == "hello<|text_sep|>world<|text_sep|>forty<|text_sep|>two"
    assert "<|space|>" in process_text("a b", version="0.3")
    assert process_text("under_score-dash/slash.dot") == \
        "under<|text_sep|>score<|text_sep|>dash<|text_sep|>slash<|text_sep|>dot"


def test_replace_numbers():
    assert replace_numbers_with_words("x 12 y").split() == \
        ["x", "twelve", "y"]


def test_speaker_formatting():
    speaker = {"words": [
        {"word": "hi", "duration": 0.08, "codes": [3, 17]},
        {"word": "there", "duration": 0.25, "codes": [5]},
    ]}
    at = speaker_audio_text(speaker)
    assert at == "<|text_start|>hi<|text_sep|>there<|text_sep|>"
    ad = speaker_audio_data(speaker)
    assert ad.startswith("<|audio_start|>\n")
    assert "hi<|t_0.08|><|code_start|><|3|><|17|><|code_end|>\n" in ad
    # v0.3 drops code_start, uses <|space|> as terminator
    ad3 = speaker_audio_data(speaker, version="0.3")
    assert "hi<|t_0.08|><|3|><|17|><|space|>" in ad3


@pytest.fixture(scope="module")
def ttc_model(tmp_path_factory):
    from tpullama.models import load_model
    from tpullama.models.testing import make_tiny_llama_gguf

    specials = ("<|im_start|>", "<|im_end|>", "<|text_start|>",
                "<|text_sep|>", "<|text_end|>", "<|audio_start|>",
                "<|space|>") + tuple(f"<|{i}|>" for i in range(64))
    p = str(tmp_path_factory.mktemp("tts") / "ttc.gguf")
    make_tiny_llama_gguf(p, seed=3, extra_special_tokens=specials)
    return load_model(p)


def test_build_prompt_and_extract(ttc_model):
    vocab = ttc_model.vocab
    prompt = build_prompt(vocab, "hello 2 world", None)
    text = vocab.detokenize(prompt, unparse_special=True)
    assert "<|text_start|>" in text and "<|audio_start|>" in text
    # the SPM byte vocab renders pieces with a leading space; ignore it
    assert "hello<|text_sep|>two<|text_sep|>world" in text.replace(" ", "")

    # extract_codes: only <|N|> tokens survive, rebased to 0
    base = vocab.tokenize("<|0|>", add_special=False, parse_special=True)[0]
    mixed = [prompt[0], base + 5, base + 63, prompt[1], base]
    assert extract_codes(vocab, mixed) == [5, 63, 0]


def test_build_prompt_with_speaker(ttc_model):
    vocab = ttc_model.vocab
    speaker = {"words": [{"word": "hey", "duration": 0.1, "codes": [1, 2]}]}
    prompt = build_prompt(vocab, "ok", speaker)
    text = vocab.detokenize(prompt, unparse_special=True).replace(" ", "")
    assert "hey<|text_sep|>ok<|text_sep|><|text_end|>" in text
    assert "<|1|><|2|>" in text


def test_tts_pipeline_tiny(ttc_model, tmp_path):
    """Codes -> vocoder -> WAV end-to-end on tiny models."""
    import wave

    from tpullama.models.testing import make_tiny_wavtokenizer_gguf
    from tpullama.models.wavtokenizer import (codes_to_audio,
                                              load_wavtokenizer, write_wav)

    vp = str(tmp_path / "voc.gguf")
    make_tiny_wavtokenizer_gguf(vp, seed=4)
    voc = load_wavtokenizer(vp)
    codes = np.asarray([5, 63, 0, 17, 2, 9], np.int32)
    audio = codes_to_audio(voc, codes)
    assert audio.ndim == 1 and np.all(np.isfinite(audio))
    out = tmp_path / "t.wav"
    write_wav(out, audio)
    with wave.open(str(out)) as f:
        assert f.getnframes() == audio.size
