"""Frontend DSL tests (reference test/lang coverage)."""

import pytest

import sglang_security_tpu.lang as sgl


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    from sglang_security_tpu.entrypoints.engine import Engine
    from sglang_security_tpu.server_args import ServerArgs
    from sglang_security_tpu.test_utils import make_tiny_llama

    path = str(tmp_path_factory.mktemp("tiny_dsl") / "llama")
    make_tiny_llama(path)
    eng = Engine(
        ServerArgs(model_path=path, dtype="float32", max_total_tokens=4096,
                   page_size=8, prefill_token_buckets=[128, 256],
                   decode_bs_buckets=[1, 4, 8], max_seq_pages_buckets=[8, 16],
                   random_seed=0)
    )
    yield eng
    eng.shutdown()


def test_gen_and_variables(engine):
    @sgl.function
    def prog(s, topic):
        s += sgl.system("You are terse.")
        s += sgl.user(f"Say something about {topic}.")
        s += sgl.assistant(sgl.gen("reply", max_tokens=6, ignore_eos=True))

    st = prog.run(topic="rivers", backend=sgl.EngineBackend(engine))
    assert "reply" in st.variables
    assert st["reply"] in st.text()


def test_select_constrained(engine):
    @sgl.function
    def prog(s):
        s += "Is water wet? Answer: "
        s += sgl.select("verdict", choices=["yes", "no"])

    st = prog.run(backend=sgl.EngineBackend(engine))
    assert st["verdict"] in ("yes", "no")


def test_fork_branches(engine):
    @sgl.function
    def prog(s):
        s += "Brainstorm: "
        branches = s.fork(3)
        outs = []
        for i, b in enumerate(branches):
            b += f"idea {i}: "
            b += sgl.gen(f"idea", max_tokens=4, temperature=0.8,
                         ignore_eos=True)
            outs.append(b["idea"])
        s += " | ".join(outs)

    st = prog.run(backend=sgl.EngineBackend(engine))
    assert st.text().count("|") == 2


def test_run_batch(engine):
    @sgl.function
    def prog(s, x):
        s += f"echo {x}: "
        s += sgl.gen("out", max_tokens=3, ignore_eos=True)

    states = prog.run_batch(
        [{"x": i} for i in range(4)], backend=sgl.EngineBackend(engine)
    )
    assert len(states) == 4
    for st in states:
        assert len(st["out"]) >= 0


def test_multi_turn_gen_chain(engine):
    @sgl.function
    def prog(s):
        s += "Q1: what? "
        s += sgl.gen("a1", max_tokens=4, ignore_eos=True)
        s += " Q2: why? "
        s += sgl.gen("a2", max_tokens=4, ignore_eos=True)

    st = prog.run(backend=sgl.EngineBackend(engine))
    assert st["a1"] in st.text() and st["a2"] in st.text()


def test_trace_ir():
    from sglang_security_tpu.lang.ir import IRArg, IRConst, IRGen, IRSelect

    @sgl.function
    def prog(s, q):
        s += "You are a quiz bot. "
        s += f"Question: {q}\n"
        s += sgl.gen("answer", max_tokens=8)
        s += " Verdict: "
        s += sgl.select("verdict", choices=["right", "wrong"])

    ir = prog.trace()
    kinds = [type(op).__name__ for op in ir.ops]
    assert kinds == ["IRConst", "IRConst", "IRArg", "IRConst", "IRGen",
                     "IRConst", "IRSelect"]
    assert ir.gen_names == ["answer", "verdict"]
    # constant text before the first argument is the cacheable prefix
    assert ir.shared_prefix == "You are a quiz bot. Question: "
    # tracing with a concrete arg folds it into constants
    ir2 = prog.trace(q="why?")
    assert not any(isinstance(op, IRArg) for op in ir2.ops)


def test_trace_roles():
    @sgl.function
    def prog(s):
        s += sgl.system("Be terse.")
        s += sgl.user("hello")
        s += sgl.assistant(sgl.gen("reply", max_tokens=4))

    ir = prog.trace()
    assert "Be terse." in ir.shared_prefix
    assert ir.gen_names == ["reply"]


def test_openai_backend_against_own_server(engine, tmp_path):
    """OpenAIBackend drives our own OpenAI-compatible HTTP server."""
    import threading
    import time

    import requests

    from sglang_security_tpu.entrypoints.http_server import build_app

    try:
        from aiohttp import web
    except ImportError:
        pytest.skip("aiohttp not available")

    import socket as _socket

    sk = _socket.socket()
    sk.bind(("127.0.0.1", 0))
    port = sk.getsockname()[1]
    sk.close()
    app = build_app(engine)
    runner = web.AppRunner(app)
    loop_holder = {}

    def serve():
        import asyncio

        loop = asyncio.new_event_loop()
        asyncio.set_event_loop(loop)
        loop_holder["loop"] = loop
        loop.run_until_complete(runner.setup())
        site = web.TCPSite(runner, "127.0.0.1", port)
        loop.run_until_complete(site.start())
        loop.run_forever()

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    deadline = time.time() + 60
    while time.time() < deadline:
        try:
            requests.get(f"http://127.0.0.1:{port}/health", timeout=1)
            break
        except Exception:
            time.sleep(0.2)

    @sgl.function
    def prog(s):
        s += "say something: "
        s += sgl.gen("out", max_tokens=4, ignore_eos=True)

    st = prog.run(
        backend=sgl.OpenAIBackend(f"http://127.0.0.1:{port}", chat=False)
    )
    assert isinstance(st["out"], str)
    loop_holder["loop"].call_soon_threadsafe(loop_holder["loop"].stop)


def test_image_in_program(tmp_path_factory):
    """sgl.image feeds the multimodal engine path (reference
    lang/api.py sgl.image)."""
    import numpy as np

    from sglang_security_tpu.entrypoints.engine import Engine
    from sglang_security_tpu.server_args import ServerArgs
    from sglang_security_tpu.test_utils import make_tiny_llava

    path = str(tmp_path_factory.mktemp("tiny_dsl_mm") / "llava")
    make_tiny_llava(path)
    eng = Engine(ServerArgs(
        model_path=path, dtype="float32", max_total_tokens=4096,
        page_size=8, prefill_token_buckets=[128, 256],
        decode_bs_buckets=[1], max_seq_pages_buckets=[32],
        random_seed=0, enable_warmup=False, log_level="warning",
    ))
    try:
        img = np.random.default_rng(0).integers(
            0, 255, (24, 24, 3), dtype=np.uint8
        )

        @sgl.function
        def prog(s):
            s += sgl.user("describe ", sgl.image(img))
            s += sgl.gen("desc", max_tokens=4, ignore_eos=True)

        st = prog.run(backend=sgl.EngineBackend(eng))
        assert isinstance(st["desc"], str) and "<image>" in st.text()
    finally:
        eng.shutdown()
