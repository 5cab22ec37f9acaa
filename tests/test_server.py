"""REST job API tests (route/JSON/error parity: pkg/server/server.go:300-407)."""

import json
import time
import urllib.error
import urllib.request
import uuid

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from llamago_tpu.checkpoint.params import host_parameters
from llamago_tpu.config import GenerateConfig, ServerConfig
from llamago_tpu.runtime.engine import Engine
from llamago_tpu.server.api import JobServer

from conftest import make_test_vocab, random_ggjt_tensors


@pytest.fixture(scope="module")
def server():
    from llamago_tpu.config import MODEL_PRESETS

    config = MODEL_PRESETS["tiny"].replace(
        dtype="float32", weight_dtype="float32", max_seq_len=64
    )
    tensors = random_ggjt_tensors(config, seed=4)
    params = jax.tree.map(
        lambda a: jnp.asarray(np.asarray(a, np.float32)), host_parameters(config, tensors)
    )
    engine = Engine(config, params, make_test_vocab(), slots=2, buckets=(16, 32, 64))
    srv = JobServer(
        engine,
        ServerConfig(host="127.0.0.1", port=0, max_pods=2),
        GenerateConfig(max_tokens=8, ctx_size=64, temp=0.0),
        model_name="tiny-test",
    )
    srv.start_background()
    yield srv
    srv.shutdown()


def req(server, method, path, body=None):
    url = f"http://127.0.0.1:{server.port}{path}"
    data = json.dumps(body).encode() if body is not None else None
    r = urllib.request.Request(url, data=data, method=method)
    try:
        with urllib.request.urlopen(r, timeout=30) as resp:
            return resp.status, json.loads(resp.read())
    except urllib.error.HTTPError as e:
        return e.code, e.read().decode()


def test_job_lifecycle(server):
    jid = str(uuid.uuid4())
    code, body = req(server, "POST", "/jobs/", {"id": jid, "prompt": "hello world"})
    assert code == 200
    assert body["id"] == jid
    assert body["status"] == "queued"
    assert body["prompt"] == "hello world"
    assert isinstance(body["created"], int)

    deadline = time.time() + 60
    status = None
    while time.time() < deadline:
        code, st = req(server, "GET", f"/jobs/status/{jid}")
        assert code == 200
        status = st["status"]
        if status == "finished":
            break
        time.sleep(0.1)
    assert status == "finished"

    code, job = req(server, "GET", f"/jobs/{jid}")
    assert code == 200
    assert set(job) >= {"id", "prompt", "output", "created", "started",
                        "finished", "model", "status"}
    assert job["model"] == "tiny-test"
    assert job["finished"] >= job["started"] >= job["created"]


def test_bad_uuid_rejected(server):
    code, body = req(server, "POST", "/jobs/", {"id": "not-a-uuid", "prompt": "x"})
    assert code == 400
    assert "UUID" in body
    code, _ = req(server, "GET", "/jobs/status/not-a-uuid")
    assert code == 400
    code, _ = req(server, "GET", "/jobs/not-a-uuid")
    assert code == 400


def test_duplicate_id_rejected(server):
    jid = str(uuid.uuid4())
    code, _ = req(server, "POST", "/jobs/", {"id": jid, "prompt": "a"})
    assert code == 200
    code, body = req(server, "POST", "/jobs/", {"id": jid, "prompt": "a"})
    assert code == 400
    assert "Duplicated" in body


def test_unknown_id_404ish(server):
    code, body = req(server, "GET", f"/jobs/{uuid.uuid4()}")
    assert code == 400
    assert "not found" in body.lower()


def test_prompt_too_long_rejected(server):
    code, body = req(
        server, "POST", "/jobs/", {"id": str(uuid.uuid4()), "prompt": "x" * 5000}
    )
    assert code == 400
    assert "more than allowed" in body


def test_malformed_json(server):
    url = f"http://127.0.0.1:{server.port}/jobs/"
    r = urllib.request.Request(url, data=b"{invalid", method="POST")
    try:
        with urllib.request.urlopen(r, timeout=10) as resp:
            code = resp.status
    except urllib.error.HTTPError as e:
        code = e.code
    assert code == 400


def test_health(server):
    code, body = req(server, "GET", "/health")
    assert code == 200
    assert body["slots"] == 2


def test_concurrent_jobs(server):
    ids = [str(uuid.uuid4()) for _ in range(4)]
    for jid in ids:
        code, _ = req(server, "POST", "/jobs/", {"id": jid, "prompt": "hello"})
        assert code == 200
    deadline = time.time() + 120
    done = set()
    while time.time() < deadline and len(done) < len(ids):
        for jid in ids:
            _, st = req(server, "GET", f"/jobs/status/{jid}")
            if st["status"] == "finished":
                done.add(jid)
        time.sleep(0.1)
    assert len(done) == len(ids)


def test_metrics(server):
    # ensure at least one finished job feeds the aggregates
    jid = str(uuid.uuid4())
    code, _ = req(server, "POST", "/jobs/", {"id": jid, "prompt": "hello"})
    assert code == 200
    deadline = time.time() + 120
    while time.time() < deadline:
        _, st = req(server, "GET", f"/jobs/status/{jid}")
        if st["status"] == "finished":
            break
        time.sleep(0.1)
    code, body = req(server, "GET", "/metrics")
    assert code == 200
    assert body["jobs"].get("finished", 0) >= 1
    assert body["generated_tokens"] > 0
    assert body["ttft_ms"]["p50"] > 0
    assert body["tokens_per_second"]["p50"] > 0
    # soak-bench surface: p99 + queue wait + prefix reuse (VERDICT r2 #7)
    assert body["ttft_ms"]["p99"] >= body["ttft_ms"]["p50"]
    assert body["queue_wait_ms"]["p99"] >= 0
    assert body["reused_prompt_tokens"] >= 0


def test_stop_at_eos_override(server):
    """Per-request stop_at_eos reaches the engine (tiny random model may
    or may not emit EOS — the contract is the override is accepted and
    the job finishes)."""
    jid = str(uuid.uuid4())
    code, body = req(server, "POST", "/jobs/",
                     {"id": jid, "prompt": "hello", "stop_at_eos": True,
                      "max_tokens": 6})
    assert code == 200
    deadline = time.time() + 120
    while time.time() < deadline:
        _, st = req(server, "GET", f"/jobs/status/{jid}")
        if st["status"] in ("finished", "failed"):
            break
        time.sleep(0.1)
    assert st["status"] == "finished"
    _, job = req(server, "GET", f"/jobs/{jid}")
    assert job["status"] == "finished"


def test_cli_accepts_all_reference_flags():
    """Drop-in flag parity: every flag llama.go's Options struct defines
    (reference: main.go:24-41) parses here, including the hardware-SIMD
    toggles we accept as no-ops."""
    from llamago_tpu.cli import build_parser

    argv = ["--prompt", "hi", "--model", "m.bin", "--server",
            "--host", "0.0.0.0", "--port", "8080", "--pods", "4",
            "--threads", "8", "--context", "1024", "--predict", "512",
            "--temp", "0.5", "--silent", "--chat", "--dir", ".",
            "--profile", "--avx", "--neon"]
    args = build_parser().parse_args(argv)
    assert args.model == "m.bin" and args.pods == 4 and args.avx


def test_cli_dtype_auto_resolves_to_float32_on_cpu(tmp_path):
    """--dtype defaults to auto: f32 off-TPU (XLA:CPU's thunk runtime
    cannot execute the bf16xbf16->f32 dots the speculative scan compiles
    to, and emulated bf16 is slower anyway), bf16 on TPU. Regression for
    the spec-server crash: `--spec` serving on CPU died in warmup with
    "Unsupported element type for DotThunk::Execute: BF16 x BF16 = F32"."""
    import jax

    from conftest import make_test_vocab, random_ggjt_tensors
    from llamago_tpu.checkpoint import write_ggjt
    from llamago_tpu.cli import _load_engine, build_parser
    from llamago_tpu.config import MODEL_PRESETS

    cfg = MODEL_PRESETS["tiny"]
    vocab = make_test_vocab()
    path = str(tmp_path / "tiny.bin")
    write_ggjt(path, cfg, vocab, random_ggjt_tensors(cfg, len(vocab.tokens)))

    args = build_parser().parse_args(["--model", path, "--spec"])
    assert args.dtype is None  # auto until a backend is known
    engine, _, config = _load_engine(args)
    assert jax.default_backend() == "cpu"
    assert config.dtype == "float32"
    # the failing program: speculative warmup compiles + executes
    engine.warmup()

    # an explicit --dtype is honored even on CPU
    args = build_parser().parse_args(["--model", path, "--dtype", "bfloat16"])
    assert args.dtype == "bfloat16"


def test_chat_mode_carries_history(tmp_path, monkeypatch, capsys):
    """--chat submits history + reply + new input each turn (prefix-cache
    friendly) and keeps running after a turn; empty input exits 0."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from conftest import make_test_vocab, random_ggjt_tensors
    from llamago_tpu.checkpoint.params import host_parameters
    from llamago_tpu.cli import run_chat
    from llamago_tpu.config import GenerateConfig, MODEL_PRESETS
    from llamago_tpu.runtime.engine import Engine

    config = MODEL_PRESETS["tiny"].replace(
        dtype="float32", weight_dtype="float32", max_seq_len=128
    )
    tensors = random_ggjt_tensors(config, seed=4)
    params = jax.tree.map(
        lambda a: jnp.asarray(np.asarray(a, np.float32)),
        host_parameters(config, tensors),
    )
    engine = Engine(config, params, make_test_vocab(), slots=1)
    prompts = iter(["hello", "again", ""])
    submitted = []
    orig_submit = engine.submit

    def spy_submit(prompt, gen, job_id=None):
        submitted.append(prompt)
        return orig_submit(prompt, gen, job_id=job_id)

    engine.submit = spy_submit
    monkeypatch.setattr("builtins.input", lambda *_: next(prompts))
    gen = GenerateConfig(max_tokens=4, ctx_size=128, temp=0.0)
    assert run_chat(engine, gen, None) == 0
    assert len(submitted) == 2
    # the second turn carries the first turn's prompt AND reply
    assert submitted[1].startswith(submitted[0] + " ")
    assert submitted[1].endswith("again")


def test_chat_overlong_input_and_overflow_recovery(monkeypatch, capsys):
    """Review regressions: an input longer than the context is refused
    without hanging (the old halving loop spun forever once history was
    down to one char), and a too-long-in-tokens turn clears history
    instead of wedging every subsequent turn."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from conftest import make_test_vocab, random_ggjt_tensors
    from llamago_tpu.checkpoint.params import host_parameters
    from llamago_tpu.cli import run_chat
    from llamago_tpu.config import GenerateConfig, MODEL_PRESETS
    from llamago_tpu.runtime.engine import Engine

    config = MODEL_PRESETS["tiny"].replace(
        dtype="float32", weight_dtype="float32", max_seq_len=64
    )
    tensors = random_ggjt_tensors(config, seed=5)
    params = jax.tree.map(
        lambda a: jnp.asarray(np.asarray(a, np.float32)),
        host_parameters(config, tensors),
    )
    engine = Engine(config, params, make_test_vocab(), slots=1)
    # turn 1 primes history; turn 2 is longer than the whole context
    # (must be refused, not hang); turn 3 still works
    prompts = iter(["hi", "x" * 100, "ok", ""])
    monkeypatch.setattr("builtins.input", lambda *_: next(prompts))
    gen = GenerateConfig(max_tokens=3, ctx_size=64, temp=0.0)
    assert run_chat(engine, gen, None) == 0
    err = capsys.readouterr().err
    assert "exceeds the context" in err


def test_sse_streaming_endpoint(tmp_path):
    """GET /jobs/stream/:id pushes output deltas as SSE events and ends
    with an `event: done` carrying the final job record; the concatenated
    deltas equal the job's output."""
    import http.client
    import json as _json
    import uuid as _uuid

    import jax
    import jax.numpy as jnp
    import numpy as np

    from conftest import make_test_vocab, random_ggjt_tensors
    from llamago_tpu.checkpoint.params import host_parameters
    from llamago_tpu.config import GenerateConfig, MODEL_PRESETS, ServerConfig
    from llamago_tpu.runtime.engine import Engine
    from llamago_tpu.server.api import JobServer

    config = MODEL_PRESETS["tiny"].replace(
        dtype="float32", weight_dtype="float32", max_seq_len=64)
    tensors = random_ggjt_tensors(config, seed=17)
    params = jax.tree.map(
        lambda a: jnp.asarray(np.asarray(a, np.float32)),
        host_parameters(config, tensors))
    engine = Engine(config, params, make_test_vocab(), slots=1)
    gen = GenerateConfig(max_tokens=8, ctx_size=64, temp=0.0)
    server = JobServer(engine, ServerConfig(host="127.0.0.1", port=0), gen)
    server.start_background()
    try:
        jid = str(_uuid.uuid4())
        conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=30)
        conn.request("POST", "/jobs/",
                     body=_json.dumps({"id": jid, "prompt": "hello"}))
        assert conn.getresponse().status == 200
        conn.request("GET", f"/jobs/stream/{jid}")
        resp = conn.getresponse()
        assert resp.status == 200
        assert resp.getheader("Content-Type") == "text/event-stream"
        deltas, done = [], None
        event = None
        while True:
            line = resp.fp.readline().decode()
            if line.startswith("event:"):
                event = line.split(":", 1)[1].strip()
            elif line.startswith("data:"):
                payload = _json.loads(line.split(":", 1)[1])
                if event == "done":
                    done = payload
                    break
                deltas.append(payload["delta"])
                event = None
        assert done is not None and done["status"] == "finished"
        assert "".join(deltas) == done["output"]
    finally:
        server.shutdown()


def test_openai_completions_endpoint():
    """POST /v1/completions: blocking response in the OpenAI schema, and
    stream=true delivers SSE chunks ending with [DONE]."""
    import http.client
    import json as _json

    import jax
    import jax.numpy as jnp
    import numpy as np

    from conftest import make_test_vocab, random_ggjt_tensors
    from llamago_tpu.checkpoint.params import host_parameters
    from llamago_tpu.config import GenerateConfig, MODEL_PRESETS, ServerConfig
    from llamago_tpu.runtime.engine import Engine
    from llamago_tpu.server.api import JobServer

    config = MODEL_PRESETS["tiny"].replace(
        dtype="float32", weight_dtype="float32", max_seq_len=64)
    tensors = random_ggjt_tensors(config, seed=18)
    params = jax.tree.map(
        lambda a: jnp.asarray(np.asarray(a, np.float32)),
        host_parameters(config, tensors))
    engine = Engine(config, params, make_test_vocab(), slots=1)
    gen = GenerateConfig(max_tokens=6, ctx_size=64, temp=0.0)
    server = JobServer(engine, ServerConfig(host="127.0.0.1", port=0), gen,
                       model_name="tiny")
    server.start_background()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=60)
        conn.request("GET", "/v1/models")
        models = _json.loads(conn.getresponse().read())
        assert models["data"][0]["id"] == "tiny"

        conn.request("POST", "/v1/completions", body=_json.dumps(
            {"model": "tiny", "prompt": "hello", "max_tokens": 4,
             "temperature": 0}))
        resp = conn.getresponse()
        assert resp.status == 200
        data = _json.loads(resp.read())
        assert data["object"] == "text_completion"
        assert data["model"] == "tiny"
        # 4 tokens generated at max_tokens=4: truncated by budget
        assert data["choices"][0]["finish_reason"] == "length"
        assert data["usage"]["completion_tokens"] == 4
        assert isinstance(data["choices"][0]["text"], str)

        conn.request("POST", "/v1/completions", body=_json.dumps(
            {"prompt": "again", "max_tokens": 4, "stream": True}))
        resp = conn.getresponse()
        assert resp.status == 200
        chunks, done = [], False
        while True:
            line = resp.fp.readline().decode()
            if not line.startswith("data:"):
                continue
            payload = line.split(":", 1)[1].strip()
            if payload == "[DONE]":
                done = True
                break
            chunks.append(_json.loads(payload))
        assert done
        assert chunks[-1]["choices"][0]["finish_reason"] == "length"
        text = "".join(c["choices"][0]["text"] for c in chunks)
        assert len(text) > 0
    finally:
        server.shutdown()


def test_render_chat_templates():
    from llamago_tpu.server.api import render_chat

    msgs = [
        {"role": "system", "content": "be brief"},
        {"role": "user", "content": "hi"},
        {"role": "assistant", "content": "hello"},
        {"role": "user", "content": "more"},
    ]
    prompt, stops = render_chat(msgs, "plain")
    assert prompt == ("system: be brief\nuser: hi\nassistant: hello\n"
                      "user: more\nassistant:")
    assert "\nuser:" in stops

    # canonical LLaMA-2-chat: <<SYS>> inside the FIRST [INST]
    prompt2, stops2 = render_chat(msgs, "llama2")
    assert prompt2 == ("[INST] <<SYS>>\nbe brief\n<</SYS>>\n\nhi [/INST] "
                       "hello [INST] more [/INST]")
    assert stops2 == ("[INST]",)

    # LLaMA-3-Instruct header format (golden; no <|begin_of_text|> — the
    # tokenizer adds bos — and NO text stops: the turn ends on the
    # <|eot_id|> control id, which decode() strips from output text)
    prompt3, stops3 = render_chat(msgs, "llama3")
    assert prompt3 == (
        "<|start_header_id|>system<|end_header_id|>\n\nbe brief<|eot_id|>"
        "<|start_header_id|>user<|end_header_id|>\n\nhi<|eot_id|>"
        "<|start_header_id|>assistant<|end_header_id|>\n\nhello<|eot_id|>"
        "<|start_header_id|>user<|end_header_id|>\n\nmore<|eot_id|>"
        "<|start_header_id|>assistant<|end_header_id|>\n\n")
    assert stops3 == ()

    # default resolution: explicit arg > env > vocab-hint default > plain
    p_def, _ = render_chat(msgs[:2], default="llama3")
    assert p_def.startswith("<|start_header_id|>system")
    p_plain, _ = render_chat(msgs[:2])
    assert p_plain.startswith("system: ")

    with pytest.raises(ValueError, match="unknown chat template"):
        render_chat(msgs, "chatml")


def test_sse_holdback_and_finish_reason():
    from llamago_tpu.config import GenerateConfig
    from llamago_tpu.runtime.engine import Job, JobStatus
    from llamago_tpu.server.api import _finish_reason, _holdback

    stops = ("\nuser:", "[INST]")
    assert _holdback("foo\nus", stops) == 3      # prefix of "\nuser:"
    assert _holdback("foo", stops) == 0
    assert _holdback("abc[IN", stops) == 3       # prefix of "[INST]"
    assert _holdback("x\nuser:", stops) == 0     # full match != prefix
    assert _holdback("", stops) == 0

    gen = GenerateConfig(max_tokens=4)
    j = Job(id="x", prompt="p", gen=gen, status=JobStatus.FINISHED)
    j.output_tokens = [1, 2, 3, 4]
    assert _finish_reason(j) == "length"
    j.output_tokens = [1, 2]
    assert _finish_reason(j) == "stop"
    j.status = JobStatus.FAILED
    assert _finish_reason(j) == "error"


def test_openai_chat_completions_endpoint():
    """POST /v1/chat/completions: blocking chat.completion schema and
    stream=true chat.completion.chunk SSE ending with [DONE]."""
    import http.client
    import json as _json

    import jax
    import jax.numpy as jnp
    import numpy as np

    from conftest import make_test_vocab, random_ggjt_tensors
    from llamago_tpu.checkpoint.params import host_parameters
    from llamago_tpu.config import GenerateConfig, MODEL_PRESETS, ServerConfig
    from llamago_tpu.runtime.engine import Engine
    from llamago_tpu.server.api import JobServer

    config = MODEL_PRESETS["tiny"].replace(
        dtype="float32", weight_dtype="float32", max_seq_len=64)
    tensors = random_ggjt_tensors(config, seed=21)
    params = jax.tree.map(
        lambda a: jnp.asarray(np.asarray(a, np.float32)),
        host_parameters(config, tensors))
    engine = Engine(config, params, make_test_vocab(), slots=1)
    gen = GenerateConfig(max_tokens=6, ctx_size=64, temp=0.0)
    server = JobServer(engine, ServerConfig(host="127.0.0.1", port=0), gen,
                       model_name="tiny")
    server.start_background()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", server.port, timeout=60)
        conn.request("POST", "/v1/chat/completions", body=_json.dumps(
            {"model": "tiny", "max_tokens": 4, "temperature": 0,
             "messages": [{"role": "user", "content": "hi"}]}))
        resp = conn.getresponse()
        assert resp.status == 200
        data = _json.loads(resp.read())
        assert data["object"] == "chat.completion"
        msg = data["choices"][0]["message"]
        assert msg["role"] == "assistant" and isinstance(msg["content"], str)
        assert data["choices"][0]["finish_reason"] in ("length", "stop")
        assert data["usage"]["total_tokens"] > 0

        # malformed messages -> OpenAI-style 400
        conn.request("POST", "/v1/chat/completions",
                     body=_json.dumps({"messages": "nope"}))
        resp = conn.getresponse()
        body = _json.loads(resp.read())
        assert resp.status == 400
        assert body["error"]["type"] == "invalid_request_error"

        conn.request("POST", "/v1/chat/completions", body=_json.dumps(
            {"messages": [{"role": "user", "content": "again"}],
             "max_tokens": 4, "stream": True}))
        resp = conn.getresponse()
        assert resp.status == 200
        chunks, done = [], False
        while True:
            line = resp.fp.readline().decode()
            if not line.startswith("data:"):
                continue
            payload = line.split(":", 1)[1].strip()
            if payload == "[DONE]":
                done = True
                break
            chunks.append(_json.loads(payload))
        assert done
        assert all(c["object"] == "chat.completion.chunk" for c in chunks)
        assert chunks[-1]["choices"][0]["finish_reason"] in ("length", "stop")
        text = "".join(
            c["choices"][0]["delta"].get("content", "") for c in chunks)
        assert isinstance(text, str)
    finally:
        server.shutdown()


def test_embeddings_endpoint(server):
    """POST /v1/embeddings: OpenAI schema, deterministic, final-norm
    hidden state (reference computes this but never serves it,
    llama.go:412-419)."""
    code, body = req(server, "POST", "/v1/embeddings",
                     {"input": ["hello", "world"]})
    assert code == 200
    assert body["object"] == "list" and len(body["data"]) == 2
    emb = body["data"][0]["embedding"]
    assert len(emb) == server.engine.config.dim
    assert body["usage"]["prompt_tokens"] > 0

    code2, body2 = req(server, "POST", "/v1/embeddings", {"input": "hello"})
    assert code2 == 200
    assert body2["data"][0]["embedding"] == emb  # deterministic

    code, body = req(server, "POST", "/v1/embeddings", {"input": 5})
    assert code == 400


def test_engine_embed_padding_invariant(server):
    """engine.embed pads to a prefill bucket; causal masking makes the
    result identical to an unpadded forward at the true last position."""
    import jax.numpy as jnp

    from llamago_tpu.models.llama import forward
    from llamago_tpu.runtime.kv_cache import KVCache
    from llamago_tpu.tokenizer import tokenize

    eng = server.engine
    emb, n = eng.embed("hello")
    assert emb.shape == (eng.config.dim,)
    ids = tokenize(eng.vocab, " hello", bos=True)
    assert n == len(ids)
    cache = KVCache.create(eng.config, batch=1, layered=eng._cache_layered)
    _, _, ref = forward(eng.params, jnp.asarray([ids], jnp.int32), cache,
                        jnp.zeros(1, jnp.int32), eng.config,
                        return_embedding=True)
    np.testing.assert_allclose(emb, np.asarray(ref[0]), rtol=1e-5, atol=1e-5)


def test_tokenize_detokenize_endpoints(server):
    """POST /tokenize + /detokenize (llama.cpp-server convention):
    round-trips through the engine's own vocab."""
    code, body = req(server, "POST", "/tokenize", {"content": "hello world"})
    assert code == 200
    toks = body["tokens"]
    assert toks and all(isinstance(t, int) for t in toks)
    from llamago_tpu.tokenizer import BOS_TOKEN

    assert toks[0] == BOS_TOKEN  # add_bos default

    code, body = req(server, "POST", "/detokenize", {"tokens": toks[1:]})
    assert code == 200
    assert body["content"] == " hello world"  # leading-space normalization

    code, _ = req(server, "POST", "/tokenize", {"content": 7})
    assert code == 400
    code, _ = req(server, "POST", "/detokenize", {"tokens": [99999999]})
    assert code == 400


def test_sampler_params_validated_at_boundary(server):
    """Out-of-range sampling params are 400s, not NaN factories: top_p=0
    used to mask every nucleus candidate (probs/0 -> categorical over NaN
    -> garbage tokens poisoning the slot); repeat_penalty=0 divides
    logits by zero (ops/sampling.py:139-161)."""
    bad = [
        {"top_p": 0}, {"top_p": 0.0}, {"top_p": 1.5}, {"top_p": "x"},
        {"temp": -1.0}, {"temp": -0.01},
        {"repeat_penalty": 0}, {"repeat_penalty": -2.0},
        {"top_k": -1}, {"top_k": 2.5}, {"top_k": True},
        {"max_tokens": 0}, {"max_tokens": -3},
        {"seed": "abc"}, {"deadline_s": -1},
    ]
    for extra in bad:
        payload = {"id": str(uuid.uuid4()), "prompt": "hi", **extra}
        code, body = req(server, "POST", "/jobs/", payload)
        assert code == 400, (extra, code, body)
    # boundary values that must PASS: top_p=1, temp=0, top_k=0 (full
    # vocab), repeat_penalty just above zero
    ok = {"id": str(uuid.uuid4()), "prompt": "hi", "top_p": 1.0,
          "temp": 0.0, "top_k": 0, "repeat_penalty": 0.5, "max_tokens": 2}
    code, body = req(server, "POST", "/jobs/", ok)
    assert code == 200, body


def test_openai_params_validated_at_boundary(server):
    """The OpenAI surface rejects the same out-of-range params with the
    OpenAI error envelope."""
    for path, payload in (
        ("/v1/completions", {"prompt": "hi", "top_p": 0}),
        ("/v1/completions", {"prompt": "hi", "temperature": -1}),
        ("/v1/completions", {"prompt": "hi", "max_tokens": 0}),
        ("/v1/chat/completions",
         {"messages": [{"role": "user", "content": "hi"}], "top_p": 0}),
        ("/v1/chat/completions",
         {"messages": [{"role": "user", "content": "hi"}],
          "temperature": "warm"}),
    ):
        code, body = req(server, "POST", path, payload)
        assert code == 400, (path, payload, code, body)
        err = json.loads(body) if isinstance(body, str) else body
        assert err["error"]["type"] == "invalid_request_error", err
