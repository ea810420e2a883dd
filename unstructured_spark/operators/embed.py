"""Embedding operators (reference ``embed/interfaces.py:10-39`` and the
provider modules under ``unstructured/embed/``; SURVEY §2.7).

The reference's ``BaseEmbeddingEncoder`` exposes
``embed_documents(elements)`` / ``embed_query(str)`` and mutates
``Text.embeddings``. Here embedding is a column transformation:
``mapInPandas`` with the iterator API so the encoder is constructed
ONCE per executor process (model-locality; SURVEY §4 "model
singletons"), batching text through the encoder and emitting an
``array<float>`` column.

Providers:
- :class:`HashingEncoder` — deterministic, dependency-free feature
  hashing (md5 token buckets, L2-normalized). This is the testable
  default; it is NOT a semantic model and says so.
- :class:`HuggingFaceEncoder` — real sentence-transformer, gated behind
  an import-try (the model library is not in this container).
- API providers (openai/bedrock/voyage…, reference embed/*.py) follow
  the same factory protocol; they are HTTP clients per executor and are
  intentionally not implemented here.
"""

from __future__ import annotations

import hashlib
import math
from typing import Callable, Iterator, Protocol

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class EmbeddingEncoder(Protocol):
    dim: int

    def embed_documents(self, texts: list[str]) -> list[list[float]]: ...

    def embed_query(self, text: str) -> list[float]: ...


class HashingEncoder:
    """Deterministic feature-hash embedding (NOT semantic — a stable,
    dependency-free stand-in that exercises the full Spark plumbing:
    batching, schema, normalization)."""

    def __init__(self, dim: int = 64):
        self.dim = dim

    def embed_query(self, text: str) -> list[float]:
        vec = [0.0] * self.dim
        for tok in text.lower().split():
            h = hashlib.md5(tok.encode("utf-8")).digest()
            bucket = int.from_bytes(h[:4], "big") % self.dim
            sign = 1.0 if h[4] & 1 else -1.0
            vec[bucket] += sign
        norm = math.sqrt(sum(v * v for v in vec))
        return [v / norm for v in vec] if norm else vec

    def embed_documents(self, texts: list[str]) -> list[list[float]]:
        return [self.embed_query(t) for t in texts]


class HuggingFaceEncoder:
    """Local sentence-transformers model (reference
    embed/huggingface.py). Requires ``sentence_transformers`` on
    executors."""

    def __init__(self, model_name: str = "sentence-transformers/all-MiniLM-L6-v2"):
        try:
            from sentence_transformers import SentenceTransformer  # type: ignore
        except ImportError as exc:  # pragma: no cover - not in container
            raise NotImplementedError(
                "HuggingFaceEncoder requires the sentence-transformers "
                "package on executors; install it in the cluster image. "
                "The Spark plumbing (embed_elements) is model-agnostic."
            ) from exc
        self._model = SentenceTransformer(model_name)  # pragma: no cover
        self.dim = self._model.get_sentence_embedding_dimension()  # pragma: no cover

    def embed_documents(self, texts: list[str]) -> list[list[float]]:  # pragma: no cover
        return [list(map(float, v)) for v in self._model.encode(texts)]

    def embed_query(self, text: str) -> list[float]:  # pragma: no cover
        return self.embed_documents([text])[0]


def embed_elements(
    df: DataFrame,
    encoder_factory: Callable[[], EmbeddingEncoder] = HashingEncoder,
    *,
    text_col: str = "text",
    out_col: str = "embeddings",
    batch_size: int = 256,
) -> DataFrame:
    """Add an ``array<float>`` embedding column.

    ``mapInPandas`` iterator form: the encoder is built once per python
    worker and reused across Arrow batches — the executor-singleton
    pattern the reference approximates with its lazy provider clients.
    """
    fields = [f for f in df.schema.fields if f.name != out_col]
    out_schema = T.StructType(
        fields + [T.StructField(out_col, T.ArrayType(T.FloatType()))]
    )
    in_cols = [f.name for f in fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        encoder = encoder_factory()  # once per worker process
        for pdf in batches:
            texts = pdf[text_col].fillna("").astype(str).tolist()
            vectors: list[list[float]] = []
            for i in range(0, len(texts), batch_size):
                vectors.extend(encoder.embed_documents(texts[i : i + batch_size]))
            out = pdf[in_cols].copy()
            out[out_col] = vectors
            yield out

    return df.select(*in_cols).mapInPandas(run, schema=out_schema)


def embed_query_column(
    queries: DataFrame,
    encoder_factory: Callable[[], EmbeddingEncoder] = HashingEncoder,
    *,
    text_col: str = "query",
    out_col: str = "embedding",
) -> DataFrame:
    """Embed a (small) query table — same plumbing, convenience wrapper."""
    return embed_elements(
        queries, encoder_factory, text_col=text_col, out_col=out_col
    )


def cosine_sim_expr(a, b):
    """JVM-side cosine over two array<float/double> columns
    (zip_with + aggregate; no UDF)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))
