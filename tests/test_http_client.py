"""HTTP LLM/embedding adapter tests.

A local in-process HTTP server fakes the OpenAI-compatible surface, so the
urllib plumbing (auth header, batching, retry/backoff, JSON-fence parsing)
is genuinely executed without network. A final opt-in test hits a real
endpoint only when OPENAI_API_KEY is set (never in CI/harness).
"""

from __future__ import annotations

import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from vector_search_spark.llm.http_client import HttpEmbeddingClient, HttpLLMClient


class _FakeOpenAI(BaseHTTPRequestHandler):
    calls: list[dict] = []
    fail_first_n = 0  # respond 429 to this many requests, then succeed

    def do_POST(self):  # noqa: N802 (http.server API)
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        cls = type(self)
        cls.calls.append({"path": self.path, "body": body,
                          "auth": self.headers.get("Authorization")})
        if cls.fail_first_n > 0:
            cls.fail_first_n -= 1
            self.send_response(429)
            self.end_headers()
            return
        if self.path.endswith("/embeddings"):
            data = [
                {"index": i, "embedding": [float(i), 2.0, 3.0]}
                for i in range(len(body["input"]))
            ]
            # deliberately reversed: client must re-sort by index
            payload = {"data": list(reversed(data))}
        else:
            prompt = body["messages"][1]["content"]
            if "targeting" in body["messages"][0]["content"]:
                content = (
                    "Here you go:\n```json\n"
                    '[{"attr": "seg", "polarity": "긍정", "value": "A"}]\n```'
                )
            elif "Rewrite" in body["messages"][0]["content"]:
                content = f"{prompt} v1!!!!{prompt} v2!!!!{prompt} v3"
            else:
                content = ">= 30"
            payload = {"choices": [{"message": {"content": content}}]}
        out = json.dumps(payload).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(out)))
        self.end_headers()
        self.wfile.write(out)

    def log_message(self, *a):  # silence
        pass


@pytest.fixture()
def fake_server():
    _FakeOpenAI.calls = []
    _FakeOpenAI.fail_first_n = 0
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _FakeOpenAI)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/v1"
    srv.shutdown()


def test_embed_batch_chunks_sorts_and_authenticates(fake_server):
    c = HttpEmbeddingClient("sk-test", base_url=fake_server, max_batch=2)
    out = c.embed_batch(["a", "b", "c"])
    # 3 texts at max_batch=2 -> two POSTs; per-chunk indexes re-sorted
    assert len(_FakeOpenAI.calls) == 2
    assert [b["body"]["input"] for b in _FakeOpenAI.calls] == [["a", "b"], ["c"]]
    assert all(b["auth"] == "Bearer sk-test" for b in _FakeOpenAI.calls)
    assert out == [[0.0, 2.0, 3.0], [1.0, 2.0, 3.0], [0.0, 2.0, 3.0]]


def test_retry_on_429_then_success(fake_server):
    _FakeOpenAI.fail_first_n = 1
    c = HttpEmbeddingClient("sk-test", base_url=fake_server, max_retries=2)
    out = c.embed_batch(["x"])
    assert out == [[0.0, 2.0, 3.0]]
    assert len(_FakeOpenAI.calls) == 2  # 429 then 200


def test_llm_contracts_parse(fake_server):
    c = HttpLLMClient("sk-test", base_url=fake_server)
    kws = c.extract_keywords("segment A customers")
    assert kws == [{"attr": "seg", "polarity": "긍정", "value": "A"}]
    variants = c.expand_query("find premium", n=3)
    assert len(variants) == 3 and variants[0].startswith("find premium")
    assert c.normalize_operator("integer", "over thirty") == ">= 30"


@pytest.mark.skipif(
    not os.environ.get("OPENAI_API_KEY"),
    reason="opt-in: set OPENAI_API_KEY to run against the real API",
)
def test_real_endpoint_roundtrip():
    c = HttpEmbeddingClient(os.environ["OPENAI_API_KEY"])
    out = c.embed_batch(["hello world"])
    assert len(out) == 1 and len(out[0]) > 10
