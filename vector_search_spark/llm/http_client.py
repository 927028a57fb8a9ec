"""OpenAI-compatible HTTP adapters for the LLM/embedding interfaces.

The reference calls OpenAI chat/embedding endpoints inline
(nl_targeting.py:33-41, camp_vec_save.py:56, camp_vec_rcmn.py:30-36,
nl_targeting_save.py:122-132) — one HTTPS call per row. These adapters
implement the same `EmbeddingClient` / `LLMClient` protocols batch-first,
so the existing `mapInPandas` pipelines get one POST per Arrow batch per
executor instead of per-row calls.

stdlib-only (urllib) — no SDK dependency. NOT exercised by the test
suite (no network in the harness); the deterministic fakes in
``clients.py`` remain the correctness surface. Construct with any
OpenAI-compatible base_url (OpenAI, Azure, vLLM, llama.cpp server...).

Executor-side use: pass the constructor args, not the client object, into
closures (the client holds no sockets between calls, so pickling is safe,
but per-partition construction keeps retries/timeouts partition-local).
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request


class HttpEmbeddingClient:
    """Batch embeddings via POST /v1/embeddings (one call per batch)."""

    def __init__(
        self,
        api_key: str,
        model: str = "text-embedding-3-small",
        base_url: str = "https://api.openai.com/v1",
        timeout_s: float = 60.0,
        max_retries: int = 3,
        max_batch: int = 512,
    ):
        self.api_key = api_key
        self.model = model
        self.base_url = base_url.rstrip("/")
        self.timeout_s = timeout_s
        self.max_retries = max_retries
        self.max_batch = max_batch

    def _post(self, path: str, payload: dict) -> dict:
        body = json.dumps(payload).encode("utf-8")
        req = urllib.request.Request(
            f"{self.base_url}{path}",
            data=body,
            headers={
                "Content-Type": "application/json",
                "Authorization": f"Bearer {self.api_key}",
            },
        )
        delay = 1.0
        for attempt in range(self.max_retries + 1):
            try:
                with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
                    return json.loads(resp.read().decode("utf-8"))
            except urllib.error.HTTPError as e:
                # retry rate limits / transient server errors with backoff
                if e.code in (429, 500, 502, 503) and attempt < self.max_retries:
                    time.sleep(delay)
                    delay *= 2
                    continue
                raise
            except urllib.error.URLError:
                if attempt < self.max_retries:
                    time.sleep(delay)
                    delay *= 2
                    continue
                raise
        raise RuntimeError("unreachable")

    def embed_batch(self, texts: list[str]) -> list[list[float]]:
        out: list[list[float]] = []
        for i in range(0, len(texts), self.max_batch):
            chunk = texts[i : i + self.max_batch]
            resp = self._post(
                "/embeddings", {"model": self.model, "input": chunk}
            )
            rows = sorted(resp["data"], key=lambda d: d["index"])
            out.extend(d["embedding"] for d in rows)
        return out


class HttpLLMClient:
    """The five prompt contracts (SURVEY §2.10 L1-L5) over chat completions.

    Prompt wording is intentionally NOT copied from the reference; each
    method documents the contract (input → parseable output) and uses the
    same delimiter conventions so downstream parsing is shared with the
    fakes."""

    def __init__(
        self,
        api_key: str,
        model: str = "gpt-4o-mini",
        base_url: str = "https://api.openai.com/v1",
        temperature: float = 0.0,
        max_tokens: int = 300,
        timeout_s: float = 60.0,
        max_retries: int = 3,
    ):
        self._emb = HttpEmbeddingClient(
            api_key, base_url=base_url, timeout_s=timeout_s, max_retries=max_retries
        )
        self.model = model
        self.temperature = temperature
        self.max_tokens = max_tokens

    def _chat(self, system: str, user: str, temperature: float | None = None) -> str:
        resp = self._emb._post(
            "/chat/completions",
            {
                "model": self.model,
                "temperature": self.temperature if temperature is None else temperature,
                "max_tokens": self.max_tokens,
                "messages": [
                    {"role": "system", "content": system},
                    {"role": "user", "content": user},
                ],
            },
        )
        return resp["choices"][0]["message"]["content"]

    def expand_query(self, query: str, n: int = 5) -> list[str]:
        """L4: one query → n reformulations, '!!!!'-separated."""
        out = self._chat(
            f"Rewrite the user's search query {n} ways, preserving intent. "
            f"Return exactly {n} variants separated by '!!!!' and nothing else.",
            query,
        )
        parts = [p.strip() for p in out.split("!!!!") if p.strip()]
        return (parts + [query] * n)[:n]

    def extract_keywords(self, query: str) -> list[dict]:
        """L1: sentence → [{attr, polarity, value}] JSON. Models wrap JSON
        in markdown fences or prose even at temperature 0, so extract the
        outermost JSON array before parsing (the F8 repair surface)."""
        out = self._chat(
            "Extract audience-targeting conditions from the sentence. Return a "
            "JSON list of objects with keys attr, polarity ('긍정' or '부정'), "
            "value. JSON only.",
            query,
        )
        start, end = out.find("["), out.rfind("]")
        if start == -1 or end <= start:
            return []
        try:
            return json.loads(out[start : end + 1])
        except json.JSONDecodeError:
            try:
                return json.loads(out[start : end + 1].replace("'", '"'))
            except json.JSONDecodeError:
                return []

    def paraphrase(self, attribute: str, value: str, n: int = 3) -> list[str]:
        """L5: (attribute, value) → n search sentences, '!!!!'-separated."""
        out = self._chat(
            f"Write {n} short natural-language search sentences a marketer "
            f"would type to find customers by the given attribute and value. "
            f"Separate them with '!!!!' and return nothing else.",
            f"{attribute} = {value}",
        )
        parts = [p.strip() for p in out.split("!!!!") if p.strip()]
        return (parts + [f"{attribute} {value}"] * n)[:n]

    def normalize_operator(self, cond_type: str, value: str) -> str:
        """L2: free-text value → operator expression ('>= 30', BETWEEN...,
        'YYYYMMDD') by condition type; empty string when inapplicable."""
        out = self._chat(
            "Normalize the value into an operator expression: for type "
            "'integer' return one of >,>=,<,<=,=,BETWEEN with numbers; for "
            "'datePopup' return a YYYYMMDD date; otherwise return an empty "
            "string. Return the expression only.",
            f"type={cond_type} value={value}",
        )
        return out.strip()
