"""Remote document sources: URL fetch and HTTP remote partitioning.

Behavioral contracts from the reference:
- URL source: ``partition(url=...)`` GETs the document, derives the
  content-type from the response header (parameters stripped, lowered),
  and routes bytes through filetype detection
  (``partition/auto.py:156-163,303-320``).
- ``partition_via_api``: POST the file to an Unstructured-API-shaped
  endpoint as multipart/form-data, with exponential-backoff retries on
  5xx/connection errors, and re-ingest the returned element-dict JSON
  (``partition/api.py:24-232``; retry defaults 3s initial / 720s max /
  1.5 exponent / 1800s max-elapsed mirror ``get_retries_config``).

Everything is stdlib (urllib) — the reference's SDK dependency is an
HTTP client; the wire shape is what matters.

Spark mapping: URL fetch is a *driver-side* ingest that builds the
documents DataFrame (same as the reference's single GET before
dispatch); remote partitioning distributes as ``partition_with_api``,
one HTTP call per document from the executors via ``mapInPandas`` —
the network fan-out scales with executor count and no document bytes
ever pass through the driver.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.request
import uuid
from typing import Any, Callable, Iterator

DEFAULT_API_URL = "https://api.unstructured.io/general/v0/general"

RETRIES_INITIAL_INTERVAL = 3.0  # seconds (reference: 3000 ms)
RETRIES_MAX_INTERVAL = 720.0
RETRIES_EXPONENT = 1.5
RETRIES_MAX_ELAPSED_TIME = 1800.0
_RETRY_STATUS = frozenset({500, 502, 503, 504})


def fetch_url(
    url: str,
    content_type: str | None = None,
    headers: dict[str, str] | None = None,
    timeout: float | None = None,
) -> tuple[bytes, str | None]:
    """GET ``url`` → (bytes, content_type). Content-type comes from the
    explicit argument, else the response header with any ``; charset=``
    parameter stripped and lowercased (reference auto.py:303-320)."""
    req = urllib.request.Request(url, headers=headers or {})
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        content = resp.read()
        header_ct = resp.headers.get("Content-Type")
    ct = content_type or header_ct
    if ct:
        ct = ct.split(";")[0].strip().lower()
    return content, ct


def partition_url(
    url: str,
    content_type: str | None = None,
    headers: dict[str, str] | None = None,
    timeout: float | None = None,
    **partition_kwargs: Any,
) -> list[dict]:
    """Fetch ``url`` and route the bytes through the ordinary filetype
    dispatch (reference partition(url=...), auto.py:156-163): the
    response content-type wins, falling back to magic-byte/extension
    detection inside ``partition_bytes``."""
    from unstructured_spark.parsers.dispatch import partition_bytes

    content, ct = fetch_url(url, content_type=content_type, headers=headers, timeout=timeout)
    name = url.rstrip("/").rsplit("/", 1)[-1] or url
    return partition_bytes(content, filename=name, content_type=ct, **partition_kwargs)


def documents_from_urls(
    spark,
    urls: list[str],
    headers: dict[str, str] | None = None,
    timeout: float | None = None,
):
    """Driver-side URL ingest → documents DataFrame
    (doc_id, path, content BINARY, content_type, size).

    The fetch happens on the driver like the reference's single GET —
    URL lists are small by construction (they arrive in a user call,
    not a table). For crawl-scale ingest put the URLs in a DataFrame
    and fetch executor-side instead.
    """
    rows = []
    for url in urls:
        content, ct = fetch_url(url, headers=headers, timeout=timeout)
        rows.append((url, url, bytearray(content), ct, len(content)))
    return spark.createDataFrame(
        rows, "doc_id string, path string, content binary, content_type string, size long"
    )


def _encode_multipart(
    fields: dict[str, str], file_name: str, file_bytes: bytes, file_content_type: str
) -> tuple[bytes, str]:
    """Multipart/form-data body for the Unstructured API wire shape."""
    boundary = uuid.uuid4().hex
    lines: list[bytes] = []
    for name, value in fields.items():
        lines += [
            f"--{boundary}".encode(),
            f'Content-Disposition: form-data; name="{name}"'.encode(),
            b"",
            str(value).encode(),
        ]
    lines += [
        f"--{boundary}".encode(),
        f'Content-Disposition: form-data; name="files"; filename="{file_name}"'.encode(),
        f"Content-Type: {file_content_type}".encode(),
        b"",
        file_bytes,
        f"--{boundary}--".encode(),
        b"",
    ]
    return b"\r\n".join(lines), f"multipart/form-data; boundary={boundary}"


def partition_via_api(
    content: bytes,
    filename: str,
    api_url: str = DEFAULT_API_URL,
    api_key: str = "",
    content_type: str = "application/octet-stream",
    retries_initial_interval: float = RETRIES_INITIAL_INTERVAL,
    retries_max_interval: float = RETRIES_MAX_INTERVAL,
    retries_exponent: float = RETRIES_EXPONENT,
    retries_max_elapsed_time: float = RETRIES_MAX_ELAPSED_TIME,
    timeout: float | None = 60.0,
    _sleep: Callable[[float], None] = time.sleep,
    **request_params: Any,
) -> list[dict]:
    """Remote partitioning over HTTP with exponential-backoff retries.

    Returns element dicts in the serialized-element shape the local
    parsers emit (re-ingested through the same JSON path as
    ``partition_json``). Retries on connection errors and 5xx with
    interval ``initial * exponent**n`` capped at ``max_interval``,
    aborting once ``max_elapsed_time`` is exhausted
    (reference api.py:24-232)."""
    body, body_ct = _encode_multipart(
        {k: v for k, v in request_params.items() if v is not None},
        filename,
        content,
        content_type,
    )
    headers = {"Content-Type": body_ct, "Accept": "application/json"}
    if api_key:
        headers["unstructured-api-key"] = api_key

    start = time.monotonic()
    interval = retries_initial_interval
    last_err: Exception | None = None
    while True:
        try:
            req = urllib.request.Request(api_url, data=body, headers=headers, method="POST")
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                payload = resp.read()
            break
        except urllib.error.HTTPError as e:
            if e.code not in _RETRY_STATUS:
                raise
            last_err = e
        except urllib.error.URLError as e:
            last_err = e
        if time.monotonic() - start + interval > retries_max_elapsed_time:
            raise last_err
        _sleep(interval)
        interval = min(interval * retries_exponent, retries_max_interval)

    data = json.loads(payload.decode("utf-8"))
    if not isinstance(data, list):
        raise ValueError("API response must be a JSON array of element dicts")
    from unstructured_spark.parsers.dispatch import _partition_json_elements

    return _partition_json_elements(json.dumps(data))


def partition_with_api(
    df,
    api_url: str = DEFAULT_API_URL,
    api_key: str = "",
    content_col: str = "content",
    doc_id_col: str = "doc_id",
    filename_col: str = "path",
    on_error: str = "fail",
    **request_params: Any,
):
    """Distributed remote partitioning: one API call per document row,
    executed on the executors (``mapInPandas`` — documents stream
    through in Arrow batches, output explodes to element rows).

    ``on_error='skip'`` drops failing documents instead of failing the
    job (an HTTP partitioner talks to an external service; per-doc
    failure isolation is the 100 TB-safe default posture there)."""
    import pandas as pd

    from unstructured_spark.schema import ELEMENT_COLUMNS, ELEMENT_SCHEMA

    if on_error not in ("fail", "skip"):
        raise ValueError("on_error must be 'fail' or 'skip'")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[dict] = []
            for _, row in pdf.iterrows():
                raw = row[content_col]
                raw = bytes(raw) if raw is not None else b""
                try:
                    elements = partition_via_api(
                        raw,
                        str(row.get(filename_col) or row[doc_id_col]),
                        api_url=api_url,
                        api_key=api_key,
                        **request_params,
                    )
                except Exception:
                    if on_error == "fail":
                        raise
                    continue
                for idx, el in enumerate(elements):
                    rec = {c: None for c in ELEMENT_COLUMNS}
                    rec.update({k: v for k, v in el.items() if k in rec})
                    rec["doc_id"] = str(row[doc_id_col])
                    rec["element_index"] = idx
                    out.append(rec)
            yield pd.DataFrame(out, columns=ELEMENT_COLUMNS)

    return df.mapInPandas(run, ELEMENT_SCHEMA)
