"""REST API source: single request + two pagination strategies.

Capability parity with the reference's ``rest_api`` extractor
(/root/reference/src/data_extractor/extractors/rest_api.py:22-150):

- single GET of ``base_url + endpoint`` with ``query_params`` /
  ``headers``, optional Bearer token read from the env var named by
  ``auth_token_env``, and path-param interpolation
  ``endpoint.format(**path_params)`` (reference rest_api.py:30-51).
- ``page_param`` pagination: loop ``page=1..max_pages`` injecting
  ``page``/``per_page`` params, stopping on an empty page or a short
  page (``len(data) < per_page``) (reference rest_api.py:95-118).
- ``link_header`` pagination: follow GitHub-style
  ``Link: <url>; rel="next"`` response headers up to ``max_pages``
  (reference rest_api.py:120-150).
- incremental cursor injected into ``query_params[cursor_param]``
  (reference engine.py:159-162) via ``apply_cursor``.

Spark-first design
------------------
The HTTP fetch is inherently driver-side (an API endpoint is not a
splittable store); results land in ``spark.createDataFrame`` so every
downstream transform is a normal Catalyst plan. For *large* paginated
APIs where the page count is known up front, ``parallel_pages: N``
switches to distributed fetch: ``spark.range(1, N+1)`` is repartitioned
and each executor partition fetches its pages inside ``mapInPandas``
(Arrow-batched), which is the natural Spark parallelism win flagged in
SURVEY.md §2.1/S2. That path requires an explicit ``schema`` (DDL
string) because distributed results cannot be sampled for inference.

The network layer is an injectable ``transport`` callable so unit tests
run fully offline (the reference mocks httpx the same way,
tests/test_alpha_vantage_extractor.py:42-59). The default transport is
stdlib ``urllib`` — no third-party HTTP dependency.
"""

from __future__ import annotations

import json
import os
import re
import urllib.parse
import urllib.request
from typing import Any, Callable

from pyspark.sql import DataFrame

from etl_ml_pipeline_spark.registry import register_source
from etl_ml_pipeline_spark.sources.base import BaseSource

# transport(url, headers) -> (status, response_headers, body_text)
Transport = Callable[[str, dict[str, str]], tuple[int, dict[str, str], str]]


def urllib_transport(url: str, headers: dict[str, str]) -> tuple[int, dict[str, str], str]:
    """Default stdlib transport. Kept tiny; tests inject fakes instead."""
    req = urllib.request.Request(url, headers=headers)
    with urllib.request.urlopen(req, timeout=30) as resp:  # pragma: no cover - network
        return resp.status, dict(resp.headers.items()), resp.read().decode("utf-8")


def build_url(base_url: str, endpoint: str, params: dict[str, Any]) -> str:
    url = base_url.rstrip("/") + "/" + endpoint.lstrip("/") if endpoint else base_url
    if params:
        sep = "&" if "?" in url else "?"
        url = url + sep + urllib.parse.urlencode({k: str(v) for k, v in params.items()})
    return url


_LINK_NEXT_RE = re.compile(r'<([^>]+)>\s*;\s*rel="next"')


def parse_link_next(link_header: str | None) -> str | None:
    """Extract the rel="next" URL from a Link header (reference rest_api.py:143-150)."""
    if not link_header:
        return None
    m = _LINK_NEXT_RE.search(link_header)
    return m.group(1) if m else None


@register_source("rest_api")
class RestApiSource(BaseSource):
    """Config keys (mirroring the reference's YAML surface):

    base_url, endpoint, query_params, headers, path_params,
    auth_token_env, pagination: {strategy: none|page_param|link_header,
    page_param, per_page_param, per_page, max_pages}, schema (optional
    Spark DDL string), parallel_pages (int, distributed page fan-out),
    transport (test injection).
    """

    def connect(self) -> None:
        self._transport: Transport = self.config.get("transport") or urllib_transport
        self._headers: dict[str, str] = dict(self.config.get("headers") or {})
        token_env = self.config.get("auth_token_env")
        if token_env:
            token = os.environ.get(token_env)
            if token:
                self._headers["Authorization"] = f"Bearer {token}"

    def _endpoint(self) -> str:
        endpoint = self.config.get("endpoint", "")
        path_params = self.config.get("path_params") or {}
        if path_params:
            endpoint = endpoint.format(**path_params)
        return endpoint

    def _params(self) -> dict[str, Any]:
        params = dict(self.config.get("query_params") or {})
        pred = getattr(self, "_cursor_predicate", None)
        cursor_param = self.config.get("cursor_param") or getattr(self, "_cursor_param", None)
        if pred is not None and pred[1] is not None and cursor_param:
            params[cursor_param] = pred[1]
        return params

    def apply_cursor(self, cursor: Any, cursor_field: str, cursor_param: str | None) -> None:
        super().apply_cursor(cursor, cursor_field, cursor_param)
        self._cursor_param = cursor_param

    # ------------------------------------------------------------------
    def _get_json(self, url: str) -> tuple[Any, dict[str, str]]:
        status, headers, body = self._transport(url, self._headers)
        if status >= 400:
            raise RuntimeError(f"HTTP {status} fetching {url}")
        return json.loads(body), headers

    @staticmethod
    def _as_records(payload: Any) -> list[dict[str, Any]]:
        """JSON list-or-dict -> row dicts (reference rest_api.py:87-93)."""
        if isinstance(payload, list):
            return [r if isinstance(r, dict) else {"value": r} for r in payload]
        if isinstance(payload, dict):
            return [payload]
        raise ValueError(f"Unsupported JSON payload type: {type(payload).__name__}")

    # ------------------------------------------------------------------
    def _fetch_single(self) -> list[dict[str, Any]]:
        url = build_url(self.config["base_url"], self._endpoint(), self._params())
        payload, _ = self._get_json(url)
        return self._as_records(payload)

    def _fetch_page_param(self, pg: dict[str, Any]) -> list[dict[str, Any]]:
        page_param = pg.get("page_param", "page")
        per_page_param = pg.get("per_page_param", "per_page")
        per_page = int(pg.get("per_page", 100))
        max_pages = int(pg.get("max_pages", 10))
        rows: list[dict[str, Any]] = []
        for page in range(1, max_pages + 1):
            params = {**self._params(), page_param: page, per_page_param: per_page}
            url = build_url(self.config["base_url"], self._endpoint(), params)
            payload, _ = self._get_json(url)
            data = self._as_records(payload) if payload else []
            if not data:
                break
            rows.extend(data)
            if len(data) < per_page:  # short page -> last page
                break
        return rows

    def _fetch_link_header(self, pg: dict[str, Any]) -> list[dict[str, Any]]:
        max_pages = int(pg.get("max_pages", 10))
        url: str | None = build_url(self.config["base_url"], self._endpoint(), self._params())
        rows: list[dict[str, Any]] = []
        for _ in range(max_pages):
            if url is None:
                break
            payload, headers = self._get_json(url)
            if payload:
                rows.extend(self._as_records(payload))
            link = headers.get("Link") or headers.get("link")
            url = parse_link_next(link)
        return rows

    # ------------------------------------------------------------------
    def _distributed_pages(self, n_pages: int) -> DataFrame:
        """Page fan-out across executors (SURVEY.md §2.1/S2 scale path).

        Each partition opens its own connection and fetches its page
        range inside ``mapInPandas`` — at 1000 executors this is 1000
        concurrent fetchers with zero driver involvement beyond plan
        construction. Requires explicit ``schema`` DDL.
        """
        import pandas as pd

        schema = self.config["schema"]
        pg = dict(self.config.get("pagination") or {})
        page_param = pg.get("page_param", "page")
        per_page_param = pg.get("per_page_param", "per_page")
        per_page = int(pg.get("per_page", 100))
        base_url = self.config["base_url"]
        endpoint = self._endpoint()
        params = self._params()
        headers = dict(self._headers)
        transport = self._transport
        cols = [f.name for f in self.spark.createDataFrame([], schema).schema.fields]

        def fetch(batches):
            for pdf in batches:
                out = []
                for page in pdf["id"].tolist():
                    url = build_url(
                        base_url, endpoint,
                        {**params, page_param: int(page), per_page_param: per_page},
                    )
                    status, _, body = transport(url, headers)
                    if status >= 400:
                        raise RuntimeError(f"HTTP {status} fetching {url}")
                    payload = json.loads(body)
                    if isinstance(payload, list):
                        out.extend(r for r in payload if isinstance(r, dict))
                if out:
                    yield pd.DataFrame(out).reindex(columns=cols)

        pages = self.spark.range(1, n_pages + 1).repartition(
            min(n_pages, self.spark.sparkContext.defaultParallelism)
        )
        return pages.mapInPandas(fetch, schema=schema)

    # ------------------------------------------------------------------
    def extract(self) -> DataFrame:
        if not hasattr(self, "_transport"):
            self.connect()
        parallel_pages = self.config.get("parallel_pages")
        if parallel_pages:
            return self._distributed_pages(int(parallel_pages))

        pg = dict(self.config.get("pagination") or {})
        strategy = pg.get("strategy", "none")
        if strategy in ("none", None):
            rows = self._fetch_single()
        elif strategy == "page_param":
            rows = self._fetch_page_param(pg)
        elif strategy == "link_header":
            rows = self._fetch_link_header(pg)
        else:
            raise ValueError(f"Unknown pagination strategy: {strategy!r}")

        schema = self.config.get("schema")
        if schema:
            return self.spark.createDataFrame(rows, schema)
        if not rows:
            raise ValueError("Empty API response and no schema configured")
        # Deterministic inference via pandas (stable column order).
        import pandas as pd

        return self.spark.createDataFrame(pd.DataFrame(rows))
