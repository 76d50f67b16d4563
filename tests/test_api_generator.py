"""ApiGenerator — the OPT-175B HTTP-API generation path
(src/generator/generation.py:63-66,74-89,112) as an actor-pool stage with an
injectable transport.  The sandbox has no network, so every test drives the
class through a fake transport; the contract pinned here is what a real
deployment relies on: MockGenerator-identical output schema, one POST per
internal inference batch, row-major (prompt, gen_idx) fan-out, retry with
loud failure, and the per-row long-prompt guard."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from folkscope_ray.stages.generate import (
    GEN_BATCH_SIZE,
    MAX_PROMPT_WORDS,
    ApiGenerator,
    MockGenerator,
)


def _prompt_batch(n: int) -> pa.Table:
    return pa.table({
        "pair_key": [f"k{i}" for i in range(n)],
        "surf_a": [f"alpha{i}" for i in range(n)],
        "surf_b": [f"beta{i}" for i in range(n)],
        "rel": ["open"] * n,
        "prompt": [f"prompt number {i}" for i in range(n)],
    })


class _FakeTransport:
    """Deterministic fake API: completion text encodes (prompt, slot) so
    the test can verify the row-major reshape; records every call."""

    def __init__(self, fail_first: int = 0):
        self.calls: list[dict] = []
        self._fail_remaining = fail_first

    def __call__(self, url: str, payload: dict) -> dict:
        self.calls.append(payload)
        if self._fail_remaining > 0:
            self._fail_remaining -= 1
            raise ConnectionError("transient")
        n_gens = payload["num_return_sequences"]
        choices = [{"text": f"{p}::gen{g}"}
                   for p in payload["prompt"] for g in range(n_gens)]
        return {"choices": choices}


def test_schema_matches_mock_generator():
    batch = _prompt_batch(5)
    api = ApiGenerator("http://host/v1", transport=_FakeTransport())(batch)
    mock = MockGenerator()(batch)
    assert api.schema.names == mock.schema.names
    assert api.schema.types == mock.schema.types
    assert api.num_rows == mock.num_rows == 5 * 3


def test_row_major_fanout_and_passthrough():
    batch = _prompt_batch(4)
    out = ApiGenerator("http://h", transport=_FakeTransport())(batch)
    df = out.to_pandas()
    # (prompt i, gen g) -> completion "prompt number i::gen{g}" in row-major
    for _, row in df.iterrows():
        i = int(row["pair_key"][1:])
        assert row["assertion"] == f"prompt number {i}::gen{row['gen_idx']}"
    assert df.groupby("pair_key")["gen_idx"].apply(
        lambda s: list(s) == [0, 1, 2]).all()


def test_one_post_per_inference_batch():
    tr = _FakeTransport()
    n = 2 * GEN_BATCH_SIZE + 10
    out = ApiGenerator("http://h", transport=tr)(_prompt_batch(n))
    assert len(tr.calls) == 3  # ceil(n / GEN_BATCH_SIZE)
    assert [len(c["prompt"]) for c in tr.calls] == [GEN_BATCH_SIZE,
                                                    GEN_BATCH_SIZE, 10]
    assert out.num_rows == n * 3


def test_retry_then_succeed(monkeypatch):
    import time

    sleeps: list[float] = []
    monkeypatch.setattr(time, "sleep", sleeps.append)
    tr = _FakeTransport(fail_first=2)
    out = ApiGenerator("http://h", max_retries=3, transport=tr)(
        _prompt_batch(2))
    assert out.num_rows == 6
    assert len(tr.calls) == 3 and len(sleeps) == 2  # backoff between tries


def test_fails_loudly_after_max_retries(monkeypatch):
    import time

    monkeypatch.setattr(time, "sleep", lambda _s: None)
    tr = _FakeTransport(fail_first=99)
    with pytest.raises(RuntimeError, match="3 attempts failed"):
        ApiGenerator("http://h", max_retries=3, transport=tr)(
            _prompt_batch(2))


def test_completion_count_mismatch_raises(monkeypatch):
    import time

    monkeypatch.setattr(time, "sleep", lambda _s: None)

    def bad(url, payload):
        return {"choices": [{"text": "only one"}]}

    with pytest.raises(RuntimeError) as ei:
        ApiGenerator("http://h", max_retries=2, transport=bad)(
            _prompt_batch(3))
    assert "completions" in str(ei.value.__cause__)


def test_long_prompt_guard_is_per_row():
    batch = _prompt_batch(3).set_column(
        4, "prompt",
        pa.array(["short prompt",
                  "word " * (MAX_PROMPT_WORDS + 20),
                  "another short prompt"], pa.string()))
    tr = _FakeTransport()
    out = ApiGenerator("http://h", transport=tr)(batch)
    assert out.num_rows == 2 * 3  # the long row dropped, others kept
    assert len(tr.calls[0]["prompt"]) == 2


def test_empty_batch_keeps_schema():
    empty = _prompt_batch(0)
    out = ApiGenerator("http://h", transport=_FakeTransport())(empty)
    assert out.num_rows == 0
    assert out.schema.names == MockGenerator()(_prompt_batch(2)).schema.names


def test_actor_pool_deployment_seam():
    """The class drops into map_batches exactly like MockGenerator — the
    swap-the-class deployment story (stages/generate.py docstring).  The
    fake transport is a CLOSURE so cloudpickle ships it by value — a
    module-level function in a pytest test module pickles by reference and
    Ray workers cannot import the test module (the actor constructor would
    fail and restart-loop)."""
    import ray.data as rd

    def transport(url: str, payload: dict) -> dict:
        n_gens = payload["num_return_sequences"]
        return {"choices": [{"text": f"{p}|{g}"}
                            for p in payload["prompt"]
                            for g in range(n_gens)]}

    ds = rd.from_arrow(_prompt_batch(40)).repartition(4)
    out = ds.map_batches(
        ApiGenerator,
        batch_format="pyarrow",
        batch_size=None,
        concurrency=2,
        fn_constructor_kwargs={"host_url": "http://h",
                               "transport": transport},
    ).to_pandas()
    assert len(out) == 40 * 3
    sample = out.sort_values(["pair_key", "gen_idx"]).iloc[0]
    i = int(sample["pair_key"][1:])
    assert sample["assertion"] == f"prompt number {i}|0"


def test_default_urllib_transport_against_local_http_server():
    """End-to-end over a REAL socket: a loopback http.server speaking the
    reference's JSON contract ({prompt, max_tokens, temperature,
    num_return_sequences} in, {choices: [{text}]} out) exercises the
    default _urllib_transport — no fake injected."""
    import json
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    seen: list[dict] = []

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            body = json.loads(
                self.rfile.read(int(self.headers["Content-Length"])))
            seen.append(body)
            n_gens = body["num_return_sequences"]
            choices = [{"text": f"{p}|g{g}"}
                       for p in body["prompt"] for g in range(n_gens)]
            out = json.dumps({"choices": choices}).encode()
            self.send_response(200)
            self.send_header("content-type", "application/json")
            self.send_header("content-length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)

        def log_message(self, *a):  # keep pytest output clean
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_port}/v1/completions"
        out = ApiGenerator(url, n_gens=2, max_tokens=64,
                           temperature=0.7)(_prompt_batch(4))
        assert out.num_rows == 8
        assert out.column("assertion").to_pylist() == [
            f"prompt number {i}|g{g}" for i in range(4) for g in range(2)]
        assert seen and seen[0]["max_tokens"] == 64
        assert seen[0]["temperature"] == 0.7
        assert seen[0]["prompt"] == [f"prompt number {i}" for i in range(4)]
    finally:
        srv.shutdown()
        srv.server_close()
