"""GBNF grammar tests, following the reference's test-grammar-integration
patterns: string acceptance/rejection per grammar, parser errors, and
end-to-end constrained generation."""

import os

import numpy as np
import pytest

from tpullama.runtime.grammar import GBNFParser, Grammar, GrammarParseError

REF_GRAMMARS = "/root/reference/grammars"


def accepts(g_text: str, s: str) -> bool:
    g = Grammar.from_gbnf(g_text)
    try:
        g.accept_str(s)
    except ValueError:
        return False
    return any(not st for st in g.stacks)


def test_simple_sequence():
    g = 'root ::= "ab" "c"'
    assert accepts(g, "abc")
    assert not accepts(g, "ab")
    assert not accepts(g, "abcd")
    assert not accepts(g, "abd")


def test_alternates():
    g = 'root ::= "cat" | "dog"'
    assert accepts(g, "cat")
    assert accepts(g, "dog")
    assert not accepts(g, "cow")


def test_char_ranges():
    g = "root ::= [a-z]+"
    assert accepts(g, "hello")
    assert not accepts(g, "Hello")
    assert not accepts(g, "")
    g2 = "root ::= [^a-z]+"
    assert accepts(g2, "123!")
    assert not accepts(g2, "a")


def test_quantifiers():
    assert accepts('root ::= "a"*', "")
    assert accepts('root ::= "a"*', "aaaa")
    assert not accepts('root ::= "a"+', "")
    assert accepts('root ::= "a"?', "")
    assert accepts('root ::= "a"?', "a")
    assert not accepts('root ::= "a"?', "aa")


def test_bounded_repetition():
    g = 'root ::= "a"{2,4}'
    assert not accepts(g, "a")
    assert accepts(g, "aa")
    assert accepts(g, "aaaa")
    assert not accepts(g, "aaaaa")
    g2 = 'root ::= [0-9]{3}'
    assert accepts(g2, "123")
    assert not accepts(g2, "12")
    assert not accepts(g2, "1234")


def test_nested_rules():
    g = """
root ::= expr
expr ::= term ("+" term)*
term ::= [0-9]+
"""
    assert accepts(g, "1+2+3")
    assert accepts(g, "42")
    assert not accepts(g, "1+")
    assert not accepts(g, "+1")


def test_grouping():
    g = 'root ::= ("a" | "b") "c"'
    assert accepts(g, "ac")
    assert accepts(g, "bc")
    assert not accepts(g, "abc")


def test_dot_any():
    g = 'root ::= "x" . "y"'
    assert accepts(g, "xay")
    assert accepts(g, "x†y")
    assert not accepts(g, "xy")


def test_utf8_multibyte():
    g = 'root ::= [α-ω]+'
    assert accepts(g, "αβγ")
    assert not accepts(g, "abc")


def test_escapes():
    g = r'root ::= "\"" [^"]* "\""'
    assert accepts(g, '"hello"')
    assert not accepts(g, '"hello')


def test_undefined_rule_ref():
    with pytest.raises(GrammarParseError):
        Grammar.from_gbnf("root ::= missing")


def test_left_recursion_detected():
    with pytest.raises(GrammarParseError):
        Grammar.from_gbnf('root ::= root "a" | "b"')


def test_missing_root():
    with pytest.raises(GrammarParseError):
        Grammar.from_gbnf('start ::= "a"')


@pytest.mark.skipif(not os.path.isdir(REF_GRAMMARS), reason="reference grammars absent")
def test_parse_reference_grammars():
    """Every grammar shipped with the reference must parse."""
    n = 0
    for fname in sorted(os.listdir(REF_GRAMMARS)):
        if not fname.endswith(".gbnf"):
            continue
        with open(os.path.join(REF_GRAMMARS, fname), encoding="utf-8") as f:
            Grammar.from_gbnf(f.read())
        n += 1
    assert n >= 5


@pytest.mark.skipif(not os.path.isdir(REF_GRAMMARS), reason="reference grammars absent")
def test_json_grammar_accepts_json():
    with open(os.path.join(REF_GRAMMARS, "json.gbnf"), encoding="utf-8") as f:
        text = f.read()
    assert accepts(text, '{"a": 1, "b": [true, null, "x"]}')
    assert accepts(text, '{"nums": [1, 2.5, -3e4]}')
    assert not accepts(text, "[1, 2]")  # json.gbnf root is an object
    assert not accepts(text, "{a: 1}")
    assert not accepts(text, "{")


def test_constrained_generation(tmp_path):
    """End to end: grammar-masked sampling only emits conforming text."""
    from tpullama.models import load_model
    from tpullama.models.testing import make_tiny_llama_gguf
    from tpullama.runtime import Context, ContextParams
    from tpullama.runtime.grammar import Grammar, GrammarSampler
    from tpullama.runtime.sampling import Candidates

    path = str(tmp_path / "m.gguf")
    make_tiny_llama_gguf(path, seed=13)
    m = load_model(path)
    ctx = Context(m, ContextParams(n_ctx=64))
    g = Grammar.from_gbnf('root ::= [0-9]{3}', vocab=m.vocab)
    gs = GrammarSampler(g)
    toks = m.vocab.tokenize("x", add_special=True)
    logits = ctx.decode(np.asarray(toks, np.int32))[-1]
    out = []
    for _ in range(5):
        cur = Candidates.from_logits(logits)
        gs.apply(cur)
        i = int(np.argmax(cur.logits))
        tok = int(cur.ids[i])
        if m.vocab.is_eog(tok):
            break
        gs.accept(tok)
        out.append(tok)
        logits = ctx.decode(np.asarray([tok], np.int32))[-1]
    text = bytes(t - 3 for t in out if 3 <= t < 259).decode()
    assert len(text) == 3 and text.isdigit(), text
