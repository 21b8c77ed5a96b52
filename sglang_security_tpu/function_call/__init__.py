from sglang_security_tpu.function_call.parser import (
    FunctionCallParser,
    ToolCall,
)
from sglang_security_tpu.function_call.reasoning_parser import ReasoningParser
