from .clients import EmbeddingClient, FakeEmbeddingClient, FakeLLMClient, LLMClient

__all__ = ["EmbeddingClient", "FakeEmbeddingClient", "FakeLLMClient", "LLMClient"]
