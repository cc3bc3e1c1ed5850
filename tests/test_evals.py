"""HellaSwag / Winogrande / multiple-choice eval harnesses vs the
reference llama-perplexity binary (perplexity.cpp:741,1098,1402) on a
tiny model + tiny task files."""

import os
import re
import struct
import subprocess

import numpy as np
import pytest

from tpullama.models import load_model
from tpullama.models.testing import make_tiny_llama_gguf

REF_PPL = os.environ.get(
    "TPULLAMA_REF_PPL",
    os.path.join(os.path.dirname(__file__), "..", ".refbuild", "bin",
                 "llama-perplexity"),
)

WORDS = ["the", "cat", "sat", "on", "mat", "dog", "ran", "fast", "home",
         "tree", "bird", "sang", "loud", "song", "blue", "sky"]


def _sentence(rng, n):
    return " ".join(rng.choice(WORDS) for _ in range(n))


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("evals") / "m.gguf")
    make_tiny_llama_gguf(p, n_embd=64, n_ff=128, n_layer=2, seed=5)
    return p


def _run_ref(model_path, task_file, *flags):
    res = subprocess.run(
        [REF_PPL, "-m", model_path, "-f", task_file, "--ctx-size", "512",
         *flags],
        capture_output=True, text=True, timeout=600,
    )
    assert res.returncode == 0, res.stderr[-1500:]
    return res.stdout + res.stderr


def test_hellaswag_matches_reference(model_path, tmp_path):
    if not os.path.exists(REF_PPL):
        pytest.skip("reference llama-perplexity not built")
    import random

    rng = random.Random(3)
    lines = []
    for _ in range(12):
        lines.append("Activity: " + _sentence(rng, 4))
        lines.append(str(rng.randrange(4)))
        for _ in range(4):
            lines.append(_sentence(rng, rng.randrange(3, 7)))
    task_file = str(tmp_path / "hs.txt")
    with open(task_file, "w") as f:
        f.write("\n".join(lines) + "\n")

    out = _run_ref(model_path, task_file, "--hellaswag",
                   "--hellaswag-tasks", "8", "--parallel", "4", "-kvu")
    rows = re.findall(r"^(\d+)\t(\d+\.\d+)%?", out, re.M)
    assert rows, out[-2000:]
    want = float(rows[-1][1])

    from tpullama.tools.evals import hellaswag_score

    model = load_model(model_path)
    got, done = hellaswag_score(model, "\n".join(lines) + "\n", 8,
                                n_ctx=512, log=lambda *_: None)
    assert done == 8
    assert abs(got - want) < 1e-3, (got, want)


def test_winogrande_matches_reference(model_path, tmp_path):
    if not os.path.exists(REF_PPL):
        pytest.skip("reference llama-perplexity not built")
    import random

    rng = random.Random(7)
    csv_rows = ["index,sentence,choice1,choice2,answer"]
    for i in range(10):
        pre = _sentence(rng, 4)
        post = _sentence(rng, 4)  # >3 trailing tokens => skip_choice path
        c1, c2 = rng.sample(WORDS, 2)
        csv_rows.append(f"{i},{pre} _ {post}.,{c1},{c2},{rng.randrange(1, 3)}")
    task_file = str(tmp_path / "wg.csv")
    with open(task_file, "w") as f:
        # extra trailing newline: the reference CLI strips one trailing
        # '\n' from the file, and its CSV loader drops a final line that
        # ends at EOF without a newline (getline sets eofbit) — pad so
        # both sides see all 10 rows
        f.write("\n".join(csv_rows) + "\n\n")

    out = _run_ref(model_path, task_file, "--winogrande",
                   "--parallel", "2", "-kvu")
    rows = re.findall(r"^(\d+)\t(\d+\.\d+)\t", out, re.M)
    assert rows, out[-2000:]
    want = float(rows[-1][1])

    from tpullama.tools.evals import winogrande_score

    model = load_model(model_path)
    got, done = winogrande_score(model, "\n".join(csv_rows) + "\n", 0,
                                 n_ctx=512, log=lambda *_: None)
    assert done == int(rows[-1][0])
    assert abs(got - want) < 1e-3, (got, want)


def _mc_blob(tasks):
    """Serialize [(question, answers, labels)] in the reference format."""
    def string(s):
        b = s.encode()
        return struct.pack("<I", len(b)) + b

    def answers(ans, labels):
        out = struct.pack("<I", len(ans))
        for a in ans:
            out += string(a)
        out += struct.pack(f"<{len(labels)}i", *labels)
        return out

    bodies = []
    for q, ans, labels in tasks:
        bodies.append(string(q) + answers(ans, labels) + answers([], []))
    blob = struct.pack("<I", len(tasks))
    pos = 4 + 4 * len(tasks)
    for b in bodies:
        blob += struct.pack("<I", pos)
        pos += len(b)
    return blob + b"".join(bodies)


def test_multiple_choice_matches_reference(model_path, tmp_path):
    if not os.path.exists(REF_PPL):
        pytest.skip("reference llama-perplexity not built")
    import random

    rng = random.Random(11)
    tasks = []
    for _ in range(8):
        n = rng.randrange(2, 5)
        labels = [0] * n
        labels[rng.randrange(n)] = 1
        tasks.append((
            "Q: " + _sentence(rng, 5),
            [_sentence(rng, rng.randrange(2, 5)) for _ in range(n)],
            labels,
        ))
    blob = _mc_blob(tasks)
    task_file = str(tmp_path / "mc.bin")
    with open(task_file, "wb") as f:
        f.write(blob)

    out = _run_ref(model_path, task_file, "--multiple-choice",
                   "--parallel", "4", "-kvu")
    rows = re.findall(r"^(\d+)\t(\d+\.\d+)", out, re.M)
    assert rows, out[-2000:]
    want = float(rows[-1][1])

    from tpullama.tools.evals import multiple_choice_score

    model = load_model(model_path)
    got, done = multiple_choice_score(model, blob, 0, n_ctx=512,
                                      log=lambda *_: None)
    assert done == 8
    assert abs(got - want) < 1e-3, (got, want)
