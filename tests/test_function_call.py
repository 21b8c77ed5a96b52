"""Tool-call parsing + reasoning separation tests."""

import json

from sglang_security_tpu.function_call import (
    FunctionCallParser,
    ReasoningParser,
    ToolCall,
)
from sglang_security_tpu.constrained.json_schema import schema_to_regex
from sglang_security_tpu.constrained.regex_engine import DFA


class TestFunctionCall:
    def test_qwen25(self):
        text = (
            "let me check.\n<tool_call>\n"
            '{"name": "get_weather", "arguments": {"city": "Paris"}}'
            "\n</tool_call>"
        )
        normal, calls = FunctionCallParser().parse(text)
        assert calls == [ToolCall("get_weather", {"city": "Paris"})]
        assert normal == "let me check."

    def test_mistral(self):
        text = '[TOOL_CALLS] [{"name": "f", "arguments": {"x": 1}}]'
        _, calls = FunctionCallParser().parse(text)
        assert calls == [ToolCall("f", {"x": 1})]

    def test_plain_json(self):
        text = '{"name": "calc", "arguments": {"a": 2, "b": 3}}'
        _, calls = FunctionCallParser().parse(text)
        assert calls == [ToolCall("calc", {"a": 2, "b": 3})]

    def test_pythonic(self):
        _, calls = FunctionCallParser().parse("search(query='cats', k=3)")
        assert calls == [ToolCall("search", {"query": "cats", "k": 3})]

    def test_no_call(self):
        normal, calls = FunctionCallParser().parse("just a normal reply")
        assert calls == [] and normal == "just a normal reply"

    def test_tools_schema_grammar(self):
        tools = [{
            "type": "function",
            "function": {
                "name": "get_weather",
                "parameters": {
                    "type": "object",
                    "properties": {"city": {"type": "string"}},
                    "required": ["city"],
                },
            },
        }]
        schema = FunctionCallParser.tools_to_json_schema(tools)
        dfa = DFA(schema_to_regex(schema, whitespace=""))
        assert dfa.matches('{"name":"get_weather","arguments":{"city":"NYC"}}')
        assert not dfa.matches('{"name":"other","arguments":{"city":"NYC"}}')


class TestReasoning:
    def test_non_stream_with_tags(self):
        rp = ReasoningParser("deepseek-r1")
        think, normal = rp.parse_non_stream(
            "<think>step 1... step 2.</think>The answer is 42."
        )
        assert think == "step 1... step 2."
        assert normal == "The answer is 42."

    def test_implicit_open(self):
        rp = ReasoningParser("deepseek-r1")
        think, normal = rp.parse_non_stream("pondering...</think>Done.")
        assert think == "pondering..."
        assert normal == "Done."

    def test_stream_chunks(self):
        rp = ReasoningParser("qwen3", think_start_open=False)
        r1, n1 = rp.parse_stream_chunk("Hello <think>hmm")
        r2, n2 = rp.parse_stream_chunk(" more</think> world")
        assert n1 == "Hello " and r1 == "hmm"
        assert r2 == " more" and n2 == " world"
