"""Embedding provider adapters (reference embed/*.py shapes) — fake
transports, zero network."""

import json

import pytest

from unstructured_spark.operators import embed


def _fake_openai_transport(calls):
    def transport(url, headers, payload):
        calls.append((url, headers, payload))
        return {
            "data": [
                # reversed order to prove index-based reordering
                {"index": i, "embedding": [float(i), 1.0, 0.0]}
                for i in reversed(range(len(payload["input"])))
            ]
        }

    return transport


class TestOpenAIShape:
    def test_request_and_response_shaping(self):
        calls = []
        enc = embed.OpenAIEncoder("sk-test", transport=_fake_openai_transport(calls))
        vecs = enc.embed_documents(["a", "b", "c"])
        assert vecs == [[0.0, 1.0, 0.0], [1.0, 1.0, 0.0], [2.0, 1.0, 0.0]]
        assert enc.dim == 3
        url, headers, payload = calls[0]
        assert url == "https://api.openai.com/v1/embeddings"
        assert headers["Authorization"] == "Bearer sk-test"
        assert payload == {"model": "text-embedding-ada-002", "input": ["a", "b", "c"]}

    def test_batching(self):
        calls = []
        enc = embed.OpenAIEncoder(
            "k", batch_size=2, transport=_fake_openai_transport(calls)
        )
        vecs = enc.embed_documents(["a", "b", "c", "d", "e"])
        assert len(vecs) == 5
        assert [len(c[2]["input"]) for c in calls] == [2, 2, 1]

    def test_embed_query(self):
        enc = embed.OpenAIEncoder("k", transport=_fake_openai_transport([]))
        assert enc.embed_query("hello") == [0.0, 1.0, 0.0]

    @pytest.mark.parametrize(
        "cls,endpoint,model",
        [
            (embed.VoyageAIEncoder, "https://api.voyageai.com/v1/embeddings", "voyage-2"),
            (
                embed.MixedbreadAIEncoder,
                "https://api.mixedbread.ai/v1/embeddings",
                "mixedbread-ai/mxbai-embed-large-v1",
            ),
            (
                embed.OctoAIEncoder,
                "https://text.octoai.run/v1/embeddings",
                "thenlper/gte-large",
            ),
        ],
    )
    def test_sibling_providers_share_wire_shape(self, cls, endpoint, model):
        calls = []
        enc = cls("key", transport=_fake_openai_transport(calls))
        enc.embed_documents(["x"])
        assert calls[0][0] == endpoint
        assert calls[0][2]["model"] == model


class _FakeBedrockClient:
    def __init__(self):
        self.calls = []

    def invoke_model(self, modelId, body):
        self.calls.append((modelId, body))
        text = json.loads(body)["inputText"]
        return {"body": json.dumps({"embedding": [float(len(text)), 2.0]}).encode()}


class TestBedrock:
    def test_injected_client(self):
        client = _FakeBedrockClient()
        enc = embed.BedrockEncoder(client=client)
        vecs = enc.embed_documents(["ab", "abcd"])
        assert vecs == [[2.0, 2.0], [4.0, 2.0]]
        assert enc.dim == 2
        assert client.calls[0][0] == "amazon.titan-embed-text-v1"

    def test_gated_without_boto3(self, monkeypatch):
        import sys

        monkeypatch.setitem(sys.modules, "boto3", None)  # force ImportError
        with pytest.raises(NotImplementedError, match="boto3"):
            embed.BedrockEncoder()


class TestVertexAI:
    def test_injected_token_and_transport(self):
        calls = []

        def transport(url, headers, payload):
            calls.append((url, headers, payload))
            return {
                "predictions": [
                    {"embeddings": {"values": [1.0, 0.0]}} for _ in payload["instances"]
                ]
            }

        enc = embed.VertexAIEncoder("proj-1", token="tok", transport=transport)
        vecs = enc.embed_documents(["a", "b"])
        assert vecs == [[1.0, 0.0], [1.0, 0.0]]
        assert "proj-1" in calls[0][0] and "textembedding-gecko@001" in calls[0][0]
        assert calls[0][1]["Authorization"] == "Bearer tok"

    def test_gated_without_google_auth(self):
        with pytest.raises(NotImplementedError, match="google-auth"):
            embed.VertexAIEncoder("proj-1")


class TestRegistry:
    def test_get_encoder_names(self):
        enc = embed.get_encoder("hashing", dim=16)
        assert enc.dim == 16
        enc = embed.get_encoder("openai", api_key="k", transport=_fake_openai_transport([]))
        assert isinstance(enc, embed.OpenAIEncoder)

    def test_unknown_provider(self):
        with pytest.raises(ValueError, match="unknown embedding provider"):
            embed.get_encoder("nope")

    def test_protocol_conformance(self):
        for name, kwargs in [
            ("hashing", {}),
            ("openai", {"api_key": "k", "transport": _fake_openai_transport([])}),
            ("bedrock", {"client": _FakeBedrockClient()}),
        ]:
            enc = embed.get_encoder(name, **kwargs)
            assert callable(enc.embed_documents) and callable(enc.embed_query)
            v = enc.embed_query("probe")
            assert isinstance(v, list) and all(isinstance(x, float) for x in v)


def test_embed_elements_with_provider_encoder(spark):
    # executors can't import the test module — ship its functions by value
    import sys

    from pyspark import cloudpickle

    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    try:
        df = spark.createDataFrame(
            [("d1", "hello world"), ("d2", "spark streams")], "doc_id string, text string"
        )
        out = embed.embed_elements(
            df,
            lambda: embed.OpenAIEncoder("k", transport=_fake_openai_transport([])),
        ).collect()
    finally:
        cloudpickle.unregister_pickle_by_value(sys.modules[__name__])
    assert {r["doc_id"] for r in out} == {"d1", "d2"}
    assert all(len(r["embeddings"]) == 3 for r in out)
