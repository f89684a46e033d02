"""HTTP serving frontend: concurrent requests through the real loop."""

import json
import threading
import urllib.request

import jax
import pytest

from flash_attention_from_scratch_tpu.models.llama import (
    LlamaConfig, init_params,
)
from flash_attention_from_scratch_tpu.serving.generate import GenerationServer
from flash_attention_from_scratch_tpu.serving.http_server import (
    ServingFrontend,
)

CFG = LlamaConfig(vocab_size=256, dim=256, n_layers=2, n_heads=2,
                  n_kv_heads=1, d_head=128, hidden_dim=256,
                  block_q=128, block_kv=128)


@pytest.fixture(scope="module")
def frontend():
    params = init_params(CFG, jax.random.PRNGKey(0))
    server = GenerationServer(params, CFG, num_pages=32, page_size=64,
                              max_batch=2, pages_per_seq=8)
    fe = ServingFrontend(server)
    httpd = fe.make_http_server(port=0)  # ephemeral port
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield fe, httpd.server_address[1]
    httpd.shutdown()
    fe.shutdown()


def _post(port, payload):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/generate",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=300) as r:
        return json.loads(r.read())


def test_http_generate_and_stats(frontend):
    fe, port = frontend
    results = {}

    def client(name, prompt):
        results[name] = _post(port, {"prompt": prompt, "max_new_tokens": 4})

    # Two concurrent clients: the step loop batches them together.
    t1 = threading.Thread(target=client, args=("a", list(range(10, 30))))
    t2 = threading.Thread(target=client, args=("b", list(range(40, 45))))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert len(results["a"]["tokens"]) == 4
    assert len(results["b"]["tokens"]) == 4
    assert results["a"]["id"] != results["b"]["id"]

    with urllib.request.urlopen(f"http://127.0.0.1:{port}/stats",
                                timeout=30) as r:
        stats = json.loads(r.read())
    # Each request's FIRST token comes from prefill (not counted as decode):
    # 2 requests x 3 decode tokens.
    assert stats["decode_tokens"] >= 6

    with urllib.request.urlopen(f"http://127.0.0.1:{port}/health",
                                timeout=30) as r:
        assert json.loads(r.read())["ok"] is True


def test_http_bad_request(frontend):
    fe, port = frontend
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/generate", data=b"{}",
        headers={"Content-Type": "application/json"})
    try:
        urllib.request.urlopen(req, timeout=30)
        raise AssertionError("expected 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400


def test_http_stop_tokens(frontend):
    fe, port = frontend
    # Learn the greedy continuation, then stop on its 2nd token.
    full = _post(port, {"prompt": [10, 11, 12, 13] * 5,
                        "max_new_tokens": 4})["tokens"]
    got = _post(port, {"prompt": [10, 11, 12, 13] * 5,
                       "max_new_tokens": 4, "stop": [full[1]]})["tokens"]
    assert got[-1] == full[1] and len(got) == 2


@pytest.mark.slow
def test_http_text_roundtrip():
    """Text form with a toy tokenizer (encode/decode protocol)."""
    from flash_attention_from_scratch_tpu.models.llama import init_params
    from flash_attention_from_scratch_tpu.serving.generate import (
        GenerationServer)
    from flash_attention_from_scratch_tpu.serving.http_server import (
        ServingFrontend)

    class ByteTok:
        def encode(self, s):
            return [b % 256 for b in s.encode()]

        def decode(self, ids):
            return bytes(int(i) % 256 for i in ids).decode("latin1")

    params = init_params(CFG, jax.random.PRNGKey(0))
    server = GenerationServer(params, CFG, num_pages=16, page_size=64,
                              max_batch=1, pages_per_seq=8)
    fe = ServingFrontend(server, tokenizer=ByteTok())
    httpd = fe.make_http_server(port=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        out = _post(httpd.server_address[1],
                    {"text": "hello world, this is a prompt",
                     "max_new_tokens": 3})
        assert len(out["tokens"]) == 3
        assert isinstance(out["text"], str) and len(out["text"]) == 3
    finally:
        httpd.shutdown()
        fe.shutdown()
