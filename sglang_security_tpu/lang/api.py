"""DSL primitives + interpreter (see package docstring)."""

from __future__ import annotations

import concurrent.futures as cf
import re
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional


# ------------------------------------------------------------------ exprs
@dataclass
class SglGen:
    name: Optional[str] = None
    max_tokens: int = 128
    temperature: float = 0.0
    top_p: float = 1.0
    top_k: int = -1
    stop: Optional[List[str]] = None
    regex: Optional[str] = None
    json_schema: Optional[str] = None
    ignore_eos: bool = False


@dataclass
class SglSelect:
    name: Optional[str]
    choices: List[str]


@dataclass
class SglRole:
    role: str
    parts: List[Any]


@dataclass
class SglImage:
    """An image part (path / base64 / ndarray); the served VLM's
    tokenizer maps the <image> placeholder to its image token
    (reference lang/api.py sgl.image -> SglImage)."""

    data: Any


def gen(name: Optional[str] = None, **kwargs) -> SglGen:
    return SglGen(name=name, **kwargs)


def select(name: Optional[str] = None, choices: Optional[List[str]] = None) -> SglSelect:
    return SglSelect(name, choices or [])


def image(data) -> SglImage:
    return SglImage(data)


def system(*parts) -> SglRole:
    return SglRole("system", list(parts))


def user(*parts) -> SglRole:
    return SglRole("user", list(parts))


def assistant(*parts) -> SglRole:
    return SglRole("assistant", list(parts))


# --------------------------------------------------------------- backends
class EngineBackend:
    """Runs programs against an in-process Engine."""

    def __init__(self, engine):
        self.engine = engine

    def generate(self, prompt: str, sp: dict, user_id=None,
                 images=None) -> str:
        out = self.engine.generate(
            prompt=prompt, sampling_params=sp, user_id=user_id,
            image_data=images,
        )
        return out["text"]

    def select(self, prompt: str, choices, user_id=None) -> str:
        """Normalized-loglikelihood choice scoring (the reference
        RuntimeEndpoint.select semantics): each prompt+choice prefills
        with prompt logprobs and the per-token-normalized continuation
        score picks the winner -- exact, unlike constrained greedy."""
        tok = self.engine.tokenizer_manager.tokenizer
        if tok is None:
            return None
        stem_len = len(tok.encode(prompt))
        outs = self.engine.generate(
            input_ids=[tok.encode(prompt + c) for c in choices],
            sampling_params={"temperature": 0.0, "max_new_tokens": 1,
                             "ignore_eos": True, "logprob_start_len": 0},
            return_logprob=True,
            user_id=user_id,
        )
        best, best_score = choices[0], float("-inf")
        for c, o in zip(choices, outs):
            lps = o["meta_info"]["input_token_logprobs"]
            n_cont = len(tok.encode(prompt + c)) - stem_len
            if n_cont <= 0:
                continue
            score = sum(lps[-n_cont:]) / n_cont
            if score > best_score:
                best, best_score = c, score
        return best


class RuntimeEndpoint:
    """Runs programs against a server's native /generate endpoint
    (reference lang/backend/runtime_endpoint.py)."""

    def __init__(self, base_url: str):
        self.base_url = base_url.rstrip("/")

    def generate(self, prompt: str, sp: dict, user_id=None,
                 images=None) -> str:
        import requests

        payload = {"text": prompt, "sampling_params": sp,
                   "user_id": user_id}
        if images:
            payload["image_data"] = images
        r = requests.post(
            self.base_url + "/generate", json=payload, timeout=600,
        )
        r.raise_for_status()
        return r.json()["text"]


# ------------------------------------------------------------ interpreter
class ProgramState:
    def __init__(self, backend, user_id=None):
        self.backend = backend
        self.user_id = user_id
        self.text_ = ""
        self.variables: Dict[str, str] = {}
        self.images: List[Any] = []

    # s += <expr>
    def __iadd__(self, other):
        self._append(other)
        return self

    def _append(self, other) -> None:
        if isinstance(other, str):
            self.text_ += other
        elif isinstance(other, SglImage):
            self.images.append(other.data)
            self.text_ += "<image>"
        elif isinstance(other, SglGen):
            self._run_gen(other)
        elif isinstance(other, SglSelect):
            self._run_select(other)
        elif isinstance(other, SglRole):
            self.text_ += f"<|{other.role}|>\n"
            for p in other.parts:
                self._append(p)
            self.text_ += "\n"
        elif isinstance(other, (list, tuple)):
            for p in other:
                self._append(p)
        else:
            raise TypeError(f"cannot append {type(other)} to program state")

    def _run_gen(self, g: SglGen) -> None:
        sp = {
            "max_new_tokens": g.max_tokens,
            "temperature": g.temperature,
            "top_p": g.top_p,
            "top_k": g.top_k,
            "stop": g.stop,
            "ignore_eos": g.ignore_eos,
        }
        if g.regex:
            sp["regex"] = g.regex
        if g.json_schema:
            sp["json_schema"] = g.json_schema
        out = self.backend.generate(self.text_, sp, self.user_id,
                                    images=self.images or None)
        if g.name:
            self.variables[g.name] = out
        self.text_ += out

    def _run_select(self, s: SglSelect) -> None:
        assert s.choices, "select needs choices"
        chosen = None
        if hasattr(self.backend, "select"):
            # exact normalized-loglikelihood scoring (EngineBackend)
            chosen = self.backend.select(
                self.text_, s.choices, self.user_id
            )
        if chosen is None:
            # remote backends: regex-constrained greedy fallback
            pattern = "(?:" + "|".join(
                re.escape(c) for c in s.choices) + ")"
            out = self.backend.generate(
                self.text_,
                {"max_new_tokens": 32, "temperature": 0.0,
                 "regex": pattern, "ignore_eos": True},
                self.user_id,
            )
            chosen = next(
                (c for c in s.choices if out.startswith(c)), out
            )
        if s.name:
            self.variables[s.name] = chosen
        self.text_ += chosen

    def fork(self, n: int) -> List["ProgramState"]:
        out = []
        for _ in range(n):
            st = ProgramState(self.backend, self.user_id)
            st.text_ = self.text_
            st.variables = dict(self.variables)
            st.images = list(self.images)
            out.append(st)
        return out

    def __getitem__(self, name: str) -> str:
        return self.variables[name]

    def text(self) -> str:
        return self.text_


@dataclass
class SglFunction:
    fn: Any
    name: str = ""

    def run(self, *args, backend=None, user_id=None, **kwargs) -> ProgramState:
        assert backend is not None, "pass backend=EngineBackend(...)/RuntimeEndpoint(...)"
        state = ProgramState(backend, user_id)
        result = self.fn(state, *args, **kwargs)
        # allow the function body to rebind s via +=; returned value ignored
        return state

    def run_batch(self, arg_list: List[dict], backend=None,
                  max_workers: int = 8) -> List[ProgramState]:
        with cf.ThreadPoolExecutor(max_workers) as ex:
            futs = [
                ex.submit(self.run, backend=backend, **kw) for kw in arg_list
            ]
            return [f.result() for f in futs]

    def trace(self, *args, **kwargs):
        """Record the program's IR without executing any generation
        (reference lang/tracer.py).  Unspecified keyword args appear as
        IRArg placeholders; given args are traced as constants."""
        import inspect

        from sglang_security_tpu.lang.ir import IRArg, TracerState

        state = TracerState()
        sig = inspect.signature(self.fn)
        params = list(sig.parameters)[1:]  # drop the state arg
        bound = dict(zip(params, args))
        bound.update(kwargs)
        call = {
            p: bound.get(p, IRArg(p))
            for p in params
            if p in bound or sig.parameters[p].default is inspect.Parameter.empty
        }
        self.fn(state, **call)
        return state.ir


def function(fn) -> SglFunction:
    return SglFunction(fn, name=fn.__name__)
