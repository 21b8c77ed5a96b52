"""Frontend DSL: structured LM programs.

Re-creation of the reference's ``python/sglang/lang`` capability
(``api.py:22-221`` SglFunction/gen/select/fork, ``interpreter.py``
StreamExecutor): write prompting programs as decorated python functions
whose states accumulate text, run generations, branch with fork, and
make constrained choices — executed against the in-process Engine or a
remote HTTP endpoint.

    import sglang_security_tpu.lang as sgl

    @sgl.function
    def qa(s, q):
        s += sgl.system("Answer concisely.")
        s += sgl.user(q)
        s += sgl.assistant(sgl.gen("answer", max_tokens=64))

    state = qa.run(q="why is the sky blue?", backend=sgl.EngineBackend(eng))
    print(state["answer"])

``select`` is implemented as regex-constrained greedy generation over
the choice set (riding the native grammar engine); logprob-compare
scoring is a planned extension.
"""

from sglang_security_tpu.lang.api import (
    EngineBackend,
    RuntimeEndpoint,
    SglFunction,
    assistant,
    function,
    gen,
    image,
    select,
    system,
    user,
)
from sglang_security_tpu.lang.backends import (
    AnthropicBackend,
    LiteLLMBackend,
    OpenAIBackend,
    VertexAIBackend,
)
from sglang_security_tpu.lang.ir import ProgramIR, TracerState

__all__ = [
    "function", "gen", "image", "select", "system", "user", "assistant",
    "SglFunction", "EngineBackend", "RuntimeEndpoint",
    "OpenAIBackend", "AnthropicBackend", "LiteLLMBackend",
    "VertexAIBackend", "ProgramIR", "TracerState",
]
