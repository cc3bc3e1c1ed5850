"""JSON schema → GBNF tests: semantic validation through our GBNF engine
(conforming JSON accepted, non-conforming rejected) — implementation-
independent version of the reference's golden tests
(tests/test-json-schema-to-grammar.cpp)."""

import json

import pytest

from tpullama.runtime.grammar import Grammar
from tpullama.runtime.json_schema import json_schema_to_gbnf


def check(schema, good: list, bad: list):
    g_text = json_schema_to_gbnf(schema)
    for s in good:
        g = Grammar.from_gbnf(g_text)
        try:
            g.accept_str(s)
        except ValueError:
            raise AssertionError(f"schema {schema} rejected valid {s!r}\n{g_text}")
        assert any(not st for st in g.stacks), f"{s!r} incomplete\n{g_text}"
    for s in bad:
        g = Grammar.from_gbnf(g_text)
        ok = True
        try:
            g.accept_str(s)
            ok = any(not st for st in g.stacks)
        except ValueError:
            ok = False
        assert not ok, f"schema {schema} accepted invalid {s!r}\n{g_text}"


def test_boolean():
    check({"type": "boolean"}, ["true", "false"], ["1", '"true"'])


def test_integer():
    check({"type": "integer"}, ["0", "42", "-7"], ["1.5", "abc", "+1", "007"])


def test_number():
    check({"type": "number"}, ["0", "3.25", "-1e3", "2E-2"], ['"x"', "--1"])


def test_string():
    check({"type": "string"}, ['"hi"', '""', '"a\\nb"', '"\\u0041"'], ["hi", '"unterminated'])


def test_string_length():
    check({"type": "string", "minLength": 2, "maxLength": 3},
          ['"ab"', '"abc"'], ['"a"', '"abcd"'])


def test_enum_const():
    check({"enum": ["red", "green", 3]}, ['"red"', '"green"', "3"], ['"blue"', "4"])
    check({"const": {"a": 1}}, ['{"a": 1}'], ['{"a": 2}'])


def test_object_required():
    schema = {
        "type": "object",
        "properties": {"name": {"type": "string"}, "age": {"type": "integer"}},
        "required": ["name", "age"],
        "additionalProperties": False,
    }
    check(schema, ['{"name": "bo", "age": 3}'], ['{"name": "bo"}', "{}", '{"age": 3, "name": "bo"}'])


def test_object_optional():
    schema = {
        "type": "object",
        "properties": {"a": {"type": "integer"}, "b": {"type": "integer"}},
        "required": ["a"],
        "additionalProperties": False,
    }
    check(schema, ['{"a": 1}', '{"a": 1, "b": 2}'], ['{"b": 2}', '{"a": 1,}'])


def test_all_optional_object():
    schema = {
        "type": "object",
        "properties": {"x": {"type": "integer"}, "y": {"type": "integer"}},
        "additionalProperties": False,
    }
    check(schema, ["{}", '{"x": 1}', '{"y": 2}', '{"x": 1, "y": 2}'], ['{"x": 1 "y": 2}'])


def test_array():
    check({"type": "array", "items": {"type": "integer"}},
          ["[]", "[1]", "[1, 2, 3]"], ['[1, "a"]', "[1,]"])


def test_array_bounds():
    check({"type": "array", "items": {"type": "integer"}, "minItems": 1, "maxItems": 2},
          ["[1]", "[1, 2]"], ["[]", "[1, 2, 3]"])


def test_prefix_items():
    check({"prefixItems": [{"type": "integer"}, {"type": "string"}]},
          ['[1, "a"]'], ["[1]", '["a", 1]'])


def test_anyof():
    check({"anyOf": [{"type": "integer"}, {"type": "string"}]},
          ["5", '"five"'], ["true"])


def test_refs():
    schema = {
        "$defs": {"pos": {"type": "integer"}},
        "type": "object",
        "properties": {"x": {"$ref": "#/$defs/pos"}},
        "required": ["x"],
        "additionalProperties": False,
    }
    check(schema, ['{"x": 5}'], ['{"x": "a"}'])


def test_nested():
    schema = {
        "type": "object",
        "properties": {
            "items": {"type": "array", "items": {
                "type": "object",
                "properties": {"id": {"type": "integer"}},
                "required": ["id"], "additionalProperties": False,
            }}
        },
        "required": ["items"],
        "additionalProperties": False,
    }
    check(schema, ['{"items": [{"id": 1}, {"id": 2}]}', '{"items": []}'],
          ['{"items": [{"id": "x"}]}'])


def test_format_date():
    check({"type": "string", "format": "date"},
          ['"2024-01-31"'], ['"2024-1-31"', '"20240131"'])


def test_untyped():
    check({}, ["1", '"x"', "[1, 2]", '{"a": null}'], ["nope"])
