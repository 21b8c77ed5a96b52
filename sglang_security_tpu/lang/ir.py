"""DSL tracing / IR.

Re-creation of the reference's tracer + SglExpr IR
(``lang/ir.py:138`` SglExpr tree, ``lang/tracer.py`` TracerProgramState):
running a program under the tracer records its operation sequence
without touching a backend, producing an IR that tools can inspect and
the batch runner uses to find the longest constant prefix shared by a
batch (the prompt-cache hint the reference's tracer enables).

    ir = qa.trace(q="why is the sky blue?")
    ir.ops            # [Const, Const, Gen, ...]
    ir.shared_prefix  # leading constant text before the first gen/arg
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, List, Optional


@dataclass
class IRConst:
    text: str


@dataclass
class IRArg:
    """A placeholder for a call argument (trace-time unknown)."""

    name: str

    def __str__(self) -> str:  # appears in f-strings inside user programs
        return f"<arg:{self.name}>"

    def __format__(self, spec) -> str:
        return str(self)


@dataclass
class IRGen:
    name: Optional[str]
    params: dict


@dataclass
class IRSelect:
    name: Optional[str]
    choices: List[str]


@dataclass
class IRRole:
    role: str
    begin: bool  # True = role open, False = close


@dataclass
class ProgramIR:
    ops: List[Any] = field(default_factory=list)

    @property
    def shared_prefix(self) -> str:
        """Leading constant text before the first generation/argument —
        identical across all calls of the program, hence radix-cacheable."""
        parts = []
        for op in self.ops:
            if isinstance(op, IRConst):
                parts.append(op.text)
            elif isinstance(op, IRRole):
                parts.append(f"<|{op.role}|>\n" if op.begin else "\n")
            else:
                break
        return "".join(parts)

    @property
    def gen_names(self) -> List[str]:
        return [
            op.name
            for op in self.ops
            if isinstance(op, (IRGen, IRSelect)) and op.name
        ]

    def __repr__(self) -> str:
        return f"ProgramIR({len(self.ops)} ops, gens={self.gen_names})"


class TracerState:
    """Drop-in for ProgramState that records instead of executing."""

    def __init__(self):
        self.ir = ProgramIR()
        self.variables = {}

    def __iadd__(self, other):
        self._append(other)
        return self

    def _append(self, other) -> None:
        from sglang_security_tpu.lang.api import SglGen, SglRole, SglSelect

        if isinstance(other, str):
            # split around embedded argument placeholders so constants
            # before the first arg still count into shared_prefix
            rest = other
            while "<arg:" in rest:
                head, _, tail = rest.partition("<arg:")
                name, _, rest = tail.partition(">")
                if head:
                    self.ir.ops.append(IRConst(head))
                self.ir.ops.append(IRArg(name))
            if rest:
                self.ir.ops.append(IRConst(rest))
        elif isinstance(other, IRArg):
            self.ir.ops.append(other)
        elif isinstance(other, SglGen):
            self.ir.ops.append(
                IRGen(other.name, {
                    "max_tokens": other.max_tokens,
                    "temperature": other.temperature,
                    "stop": other.stop,
                    "regex": other.regex,
                    "json_schema": other.json_schema,
                })
            )
            if other.name:
                self.variables[other.name] = f"<gen:{other.name}>"
        elif isinstance(other, SglSelect):
            self.ir.ops.append(IRSelect(other.name, list(other.choices)))
            if other.name:
                self.variables[other.name] = f"<select:{other.name}>"
        elif isinstance(other, SglRole):
            self.ir.ops.append(IRRole(other.role, True))
            for p in other.parts:
                self._append(p)
            self.ir.ops.append(IRRole(other.role, False))
        elif isinstance(other, (list, tuple)):
            for p in other:
                self._append(p)
        else:
            self.ir.ops.append(IRConst(str(other)))

    def __getitem__(self, name: str):
        return self.variables.get(name, f"<gen:{name}>")

    def text(self) -> str:
        return "".join(
            op.text if isinstance(op, IRConst) else str(op)
            for op in self.ir.ops
        )
