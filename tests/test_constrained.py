"""Constrained decoding: regex engine, JSON schema, EBNF, and e2e engine."""

import json

import numpy as np
import pytest

from sglang_security_tpu.constrained.ebnf import ebnf_to_regex
from sglang_security_tpu.constrained.json_schema import schema_to_regex
from sglang_security_tpu.constrained.regex_engine import DFA, TokenDFA


class TestRegexEngine:
    @pytest.mark.parametrize(
        "pattern,ok,bad",
        [
            (r"abc", ["abc"], ["ab", "abcd", ""]),
            (r"a+b*", ["a", "aab", "abbb"], ["b", ""]),
            (r"(?:ab|cd)+", ["ab", "abcd", "cdcdab"], ["a", "abc"]),
            (r"[a-c]{2,3}", ["ab", "abc"], ["a", "abcd", "xy"]),
            (r"\d{3}-\d{4}", ["555-1234"], ["5551234", "55-1234"]),
            (r"a?b", ["b", "ab"], ["aab"]),
            (r'"[^"]*"', ['""', '"hi"'], ['"', 'hi']),
            (r"x{3}", ["xxx"], ["xx", "xxxx"]),
            (r"[^a]+", ["bc", "zz"], ["", "ab"]),
            (r".+", ["anything"], [""]),
        ],
    )
    def test_match_semantics(self, pattern, ok, bad):
        dfa = DFA(pattern)
        for s in ok:
            assert dfa.matches(s), (pattern, s)
        for s in bad:
            assert not dfa.matches(s), (pattern, s)

    def test_token_level_walk(self):
        dfa = DFA(r"(?:yes|no) way")
        toks = ["yes", "no", " ", "way", " way", "x", "y", "es"]
        tdfa = TokenDFA(dfa, toks, eos_token_ids=[7])
        m0 = tdfa.allowed_mask(0)
        assert m0[0] and m0[1] and m0[6]  # "yes", "no", "y"
        assert not m0[2] and not m0[5]
        s = tdfa.next_state(0, 0)  # consumed "yes"
        m1 = tdfa.allowed_mask(s)
        assert m1[2] and m1[4] and not m1[0]
        s = tdfa.next_state(s, 4)  # " way" -> accepting
        assert tdfa.dfa.accepting[s]
        assert tdfa.allowed_mask(s)[7]  # eos allowed at accept


class TestJsonSchema:
    def check(self, schema, good, bad):
        pattern = schema_to_regex(schema, whitespace="")
        dfa = DFA(pattern)
        for g in good:
            assert dfa.matches(g), (pattern[:120], g)
        for b in bad:
            assert not dfa.matches(b), (pattern[:120], b)

    def test_simple_object(self):
        self.check(
            {"type": "object",
             "properties": {"name": {"type": "string"},
                            "age": {"type": "integer"}},
             "required": ["name", "age"]},
            ['{"name":"bob","age":42}', '{"name":"","age":-1}'],
            ['{"name":"bob"}', '{"age":42,"name":"bob"}', "{}"],
        )

    def test_enum_and_bool(self):
        self.check(
            {"type": "object",
             "properties": {"color": {"enum": ["red", "green"]},
                            "on": {"type": "boolean"}},
             "required": ["color", "on"]},
            ['{"color":"red","on":true}'],
            ['{"color":"blue","on":true}', '{"color":"red","on":1}'],
        )

    def test_array(self):
        self.check(
            {"type": "array", "items": {"type": "integer"}, "minItems": 1,
             "maxItems": 3},
            ["[1]", "[1,2]", "[1,2,3]"],
            ["[]", "[1,2,3,4]", '["a"]'],
        )

    def test_number(self):
        self.check({"type": "number"}, ["0", "-1.5", "2e10", "3.14"],
                   ["--1", "01", "x"])


class TestEbnf:
    def test_simple_grammar(self):
        g = '''
root ::= greeting " " name
greeting ::= "hello" | "hi"
name ::= [A-Z][a-z]+
'''
        dfa = DFA(ebnf_to_regex(g))
        assert dfa.matches("hello Bob")
        assert dfa.matches("hi Al")
        assert not dfa.matches("hey Bob")
        assert not dfa.matches("hello bob")

    def test_repetition(self):
        g = 'root ::= "a"+ "b"*'
        dfa = DFA(ebnf_to_regex(g))
        assert dfa.matches("aaa")
        assert dfa.matches("abb")
        assert not dfa.matches("b")

    def test_recursive_rejected(self):
        g = 'root ::= "(" root ")" | "x"'
        with pytest.raises(ValueError, match="recursion"):
            ebnf_to_regex(g)


class TestEngineIntegration:
    @pytest.fixture(scope="class")
    def engine(self, tmp_path_factory):
        from sglang_security_tpu.entrypoints.engine import Engine
        from sglang_security_tpu.server_args import ServerArgs
        from sglang_security_tpu.test_utils import make_tiny_llama

        path = str(tmp_path_factory.mktemp("tiny_g") / "llama")
        make_tiny_llama(path)
        eng = Engine(
            ServerArgs(model_path=path, dtype="float32",
                       max_total_tokens=4096, page_size=8,
                       prefill_token_buckets=[128, 256],
                       decode_bs_buckets=[1, 4, 8],
                       max_seq_pages_buckets=[8, 16], random_seed=0)
        )
        yield eng
        eng.shutdown()

    def test_regex_constrained_output(self, engine):
        out = engine.generate(
            prompt="pick",
            sampling_params={"max_new_tokens": 20, "temperature": 0.7,
                             "regex": r"(?:yes|no)"},
        )
        assert out["text"] in ("yes", "no"), out["text"]

    def test_json_constrained_output(self, engine):
        schema = json.dumps(
            {"type": "object", "properties": {"ok": {"type": "boolean"}},
             "required": ["ok"]}
        )
        out = engine.generate(
            prompt="answer",
            sampling_params={"max_new_tokens": 40, "temperature": 0.7,
                             "json_schema": schema},
        )
        parsed = json.loads(out["text"])
        assert isinstance(parsed["ok"], bool)
