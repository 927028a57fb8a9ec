"""Pluggable LLM / embedding clients (SURVEY §2.10 L1-L5, §2.9 V6).

The reference calls OpenAI once per row (camp_vec_save.py:56,
nl_targeting_save.py:131-132, camp_vec_rcmn.py:43, nl_targeting.py:54 — the
N+1 anti-pattern). Here clients are batch-first interfaces invoked inside
``mapInPandas`` so each Arrow batch costs one client call; network-backed
implementations plug in without touching the pipelines.

Correctness tests use the deterministic fakes below — no network, stable
outputs — per SURVEY §5.2.4: LLM semantics are OUT of the relational
correctness surface; the dataflow around them is IN.
"""

from __future__ import annotations

import hashlib
import math
from typing import Protocol


class EmbeddingClient(Protocol):
    def embed_batch(self, texts: list[str]) -> list[list[float]]: ...


class LLMClient(Protocol):
    def expand_query(self, query: str, n: int = 5) -> list[str]: ...

    def extract_keywords(self, query: str) -> list[dict]: ...

    def paraphrase(self, attribute: str, value: str, n: int = 3) -> list[str]: ...

    def normalize_operator(self, cond_type: str, value: str) -> str: ...


class FakeEmbeddingClient:
    """Deterministic embeddings (config.EMB_DIM wide by default):
    per-dimension value derived from md5(text + '#' + dim),
    L2-normalized. Same text → same vector, any process, any partition
    order."""

    def __init__(self, dim: int | None = None):
        from ..config import EMB_DIM

        dim = EMB_DIM if dim is None else dim
        self.dim = dim

    def _embed_one(self, text: str) -> list[float]:
        vals = []
        for d in range(self.dim):
            h = hashlib.md5(f"{text}#{d}".encode()).digest()
            v = int.from_bytes(h[:8], "big") / 2**63 - 1.0  # [-1, 1)
            vals.append(v)
        norm = math.sqrt(sum(v * v for v in vals)) or 1.0
        return [v / norm for v in vals]

    def embed_batch(self, texts: list[str]) -> list[list[float]]:
        return [self._embed_one(t) for t in texts]


class FakeLLMClient:
    """Deterministic stand-ins for the five prompt contracts (L1-L5)."""

    def expand_query(self, query: str, n: int = 5) -> list[str]:
        """L4 (camp_vec_rcmn.py:11-38): 1 query → n expanded variants."""
        return [query] + [f"{query} variant {i}" for i in range(1, n)]

    def extract_keywords(self, query: str) -> list[dict]:
        """L1 (nl_targeting.py:8-41): sentence → [{attr, polarity, value}].
        Fake grammar: tokens of the form ``attr=value``; a ``not_`` prefix
        flips polarity to 부정 (negative)."""
        out = []
        for w in query.split():
            polarity = "긍정"
            if w.startswith("not_"):
                polarity, w = "부정", w[4:]
            attr, _, value = w.partition("=")
            out.append({"attr": attr, "polarity": polarity, "value": value or attr})
        return out

    def paraphrase(self, attribute: str, value: str, n: int = 3) -> list[str]:
        """L5 (nl_targeting_save.py:103-131): (attr, value) → n sentences."""
        return [f"{attribute} {value} 검색 문장 {i}" for i in range(n)]

    def normalize_operator(self, cond_type: str, value: str) -> str:
        """L2 (nl_targeting.py:63-79): free value → operator expression."""
        if cond_type == "integer":
            digits = "".join(c for c in value if c.isdigit()) or "0"
            return f">= {digits}"
        if cond_type == "datePopup":
            digits = "".join(c for c in value if c.isdigit())
            return digits[:8].ljust(8, "0")
        return ""
