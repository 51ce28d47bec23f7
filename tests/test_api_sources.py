"""Offline unit tests for the API/scraper sources (mocked transports).

Mirrors the reference's mocked-HTTP extractor test strategy
(/root/reference/tests/test_alpha_vantage_extractor.py:42-218,
SURVEY.md §5).
"""

from __future__ import annotations

import json

import pytest

from etl_ml_pipeline_spark.sources.alpha_vantage import (
    AlphaVantageSource,
    detect_series_key,
    flatten_series,
)
from etl_ml_pipeline_spark.sources.playwright_scraper import (
    PlaywrightScraperSource,
    assemble_columns,
)
from etl_ml_pipeline_spark.sources.rest_api import (
    RestApiSource,
    build_url,
    parse_link_next,
)


class FakeTransport:
    """Records URLs; serves canned (status, headers, body) responses."""

    def __init__(self, responses):
        self.responses = list(responses)
        self.urls: list[str] = []
        self.headers_seen: list[dict] = []

    def __call__(self, url, headers):
        self.urls.append(url)
        self.headers_seen.append(dict(headers))
        status, hdrs, payload = self.responses.pop(0)
        return status, hdrs, json.dumps(payload)


# ---------------------------------------------------------------- rest_api
def test_rest_single_list(spark):
    t = FakeTransport([(200, {}, [{"id": 1, "name": "a"}, {"id": 2, "name": "b"}])])
    src = RestApiSource(spark, {"base_url": "http://x", "endpoint": "/items", "transport": t})
    rows = src.extract().orderBy("id").collect()
    assert [r["id"] for r in rows] == [1, 2]
    assert t.urls == ["http://x/items"]


def test_rest_single_dict_payload(spark):
    t = FakeTransport([(200, {}, {"id": 7, "name": "solo"})])
    src = RestApiSource(spark, {"base_url": "http://x", "endpoint": "e", "transport": t})
    rows = src.extract().collect()
    assert len(rows) == 1 and rows[0]["id"] == 7


def test_rest_path_params_and_query(spark):
    t = FakeTransport([(200, {}, [{"v": 1}])])
    src = RestApiSource(
        spark,
        {
            "base_url": "http://x",
            "endpoint": "/users/{uid}/posts",
            "path_params": {"uid": 42},
            "query_params": {"active": "true"},
            "transport": t,
        },
    )
    src.extract().collect()
    assert t.urls == ["http://x/users/42/posts?active=true"]


def test_rest_bearer_token_from_env(spark, monkeypatch):
    monkeypatch.setenv("MY_API_TOKEN", "sekrit")
    t = FakeTransport([(200, {}, [{"v": 1}])])
    src = RestApiSource(
        spark,
        {"base_url": "http://x", "endpoint": "e", "auth_token_env": "MY_API_TOKEN", "transport": t},
    )
    src.extract().collect()
    assert t.headers_seen[0]["Authorization"] == "Bearer sekrit"


def test_rest_page_param_stops_on_short_page(spark):
    pages = [
        (200, {}, [{"id": i} for i in range(3)]),
        (200, {}, [{"id": 3}]),  # short page (< per_page) -> stop
        (200, {}, [{"id": 99}]),  # must never be fetched
    ]
    t = FakeTransport(pages)
    src = RestApiSource(
        spark,
        {
            "base_url": "http://x",
            "endpoint": "items",
            "pagination": {"strategy": "page_param", "per_page": 3, "max_pages": 10},
            "transport": t,
        },
    )
    assert src.extract().count() == 4
    assert len(t.urls) == 2
    assert "page=1" in t.urls[0] and "per_page=3" in t.urls[0]


def test_rest_page_param_stops_on_empty_page(spark):
    t = FakeTransport([(200, {}, [{"id": 1}, {"id": 2}]), (200, {}, [])])
    src = RestApiSource(
        spark,
        {
            "base_url": "http://x",
            "endpoint": "items",
            "pagination": {"strategy": "page_param", "per_page": 2, "max_pages": 10},
            "transport": t,
        },
    )
    assert src.extract().count() == 2
    assert len(t.urls) == 2


def test_rest_page_param_respects_max_pages(spark):
    t = FakeTransport([(200, {}, [{"id": i} for i in range(2)])] * 5)
    src = RestApiSource(
        spark,
        {
            "base_url": "http://x",
            "endpoint": "items",
            "pagination": {"strategy": "page_param", "per_page": 2, "max_pages": 3},
            "transport": t,
        },
    )
    assert src.extract().count() == 6
    assert len(t.urls) == 3


def test_rest_link_header_follows_next(spark):
    t = FakeTransport(
        [
            (200, {"Link": '<http://x/items?page=2>; rel="next"'}, [{"id": 1}]),
            (200, {"Link": '<http://x/items?page=3>; rel="next", <http://x/items?page=1>; rel="prev"'}, [{"id": 2}]),
            (200, {}, [{"id": 3}]),
        ]
    )
    src = RestApiSource(
        spark,
        {
            "base_url": "http://x",
            "endpoint": "items",
            "pagination": {"strategy": "link_header", "max_pages": 10},
            "transport": t,
        },
    )
    rows = src.extract().orderBy("id").collect()
    assert [r["id"] for r in rows] == [1, 2, 3]
    assert t.urls[1] == "http://x/items?page=2"


def test_rest_cursor_injected_as_param(spark):
    t = FakeTransport([(200, {}, [{"id": 11}])])
    src = RestApiSource(
        spark,
        {"base_url": "http://x", "endpoint": "items", "transport": t},
    )
    src.apply_cursor(10, "id", "since_id")
    src.extract().collect()
    assert "since_id=10" in t.urls[0]


def test_rest_http_error_raises(spark):
    t = FakeTransport([(500, {}, {"err": "boom"})])
    src = RestApiSource(spark, {"base_url": "http://x", "endpoint": "e", "transport": t})
    with pytest.raises(RuntimeError, match="HTTP 500"):
        src.extract()


def test_rest_explicit_schema(spark):
    t = FakeTransport([(200, {}, [{"id": 1, "name": "a"}])])
    src = RestApiSource(
        spark,
        {"base_url": "http://x", "endpoint": "e", "schema": "id long, name string", "transport": t},
    )
    df = src.extract()
    assert [f.name for f in df.schema.fields] == ["id", "name"]


def test_rest_parallel_pages_distributed(spark):
    """mapInPandas page fan-out: every page fetched exactly once, executor-side."""

    def transport(url, headers):  # must be picklable -> module-level-style fn
        import urllib.parse as up

        q = dict(up.parse_qsl(up.urlparse(url).query))
        page = int(q["page"])
        return 200, {}, json.dumps([{"page": page, "i": i} for i in range(2)])

    src = RestApiSource(
        spark,
        {
            "base_url": "http://x",
            "endpoint": "items",
            "schema": "page long, i long",
            "parallel_pages": 5,
            "pagination": {"per_page": 2},
            "transport": transport,
        },
    )
    df = src.extract()
    assert df.count() == 10
    assert df.select("page").distinct().count() == 5


def test_build_url_and_link_parse():
    assert build_url("http://x/", "/a/b", {"k": "v"}) == "http://x/a/b?k=v"
    assert parse_link_next('<http://n>; rel="next"') == "http://n"
    assert parse_link_next('<http://p>; rel="prev"') is None
    assert parse_link_next(None) is None


# ---------------------------------------------------------- alpha_vantage
AV_PAYLOAD = {
    "Meta Data": {"2. Symbol": "IBM"},
    "Time Series (Daily)": {
        "2024-01-03": {"1. open": "100.5", "2. high": "101.0", "3. low": "99.0",
                       "4. close": "100.0", "5. volume": "1000"},
        "2024-01-02": {"1. open": "99.5", "2. high": "100.5", "3. low": "98.5",
                       "4. close": "100.2", "5. volume": "2000"},
    },
}


def test_av_flatten_and_types(spark):
    t = FakeTransport([(200, {}, AV_PAYLOAD)])
    src = AlphaVantageSource(spark, {"symbol": "IBM", "transport": t})
    df = src.extract()
    assert df.columns == ["date", "open", "high", "low", "close", "volume"]
    rows = {r["date"]: r for r in df.collect()}
    assert rows["2024-01-03"]["open"] == 100.5
    assert rows["2024-01-02"]["volume"] == 2000.0
    assert dict(df.dtypes)["close"] == "double"


def test_av_series_key_autodetect():
    assert detect_series_key(AV_PAYLOAD) == "Time Series (Daily)"
    with pytest.raises(ValueError):
        detect_series_key({"Meta Data": {}})


def test_av_error_payloads_raise(spark):
    for key, pattern in [
        ("Error Message", "API error"),
        ("Note", "rate limit"),
        ("Information", "information"),
    ]:
        t = FakeTransport([(200, {}, {key: "nope"})])
        src = AlphaVantageSource(spark, {"symbol": "IBM", "transport": t})
        with pytest.raises(ValueError, match=pattern):
            src.extract()


def test_av_series_key_override(spark):
    payload = {"Weird Key": AV_PAYLOAD["Time Series (Daily)"]}
    t = FakeTransport([(200, {}, payload)])
    src = AlphaVantageSource(spark, {"symbol": "IBM", "series_key": "Weird Key", "transport": t})
    assert src.extract().count() == 2


def test_av_uncastable_becomes_null():
    rows = flatten_series({"2024-01-01": {"1. open": "not-a-number"}})
    assert rows[0]["open"] is None


def test_av_api_key_from_env(monkeypatch):
    monkeypatch.setenv("ALPHA_VANTAGE_API_KEY", "k123")
    captured = {}

    def t(url, headers):
        captured["url"] = url
        return 200, {}, json.dumps(AV_PAYLOAD)

    import pyspark.sql

    spark = pyspark.sql.SparkSession.getActiveSession()
    src = AlphaVantageSource(spark, {"symbol": "IBM", "transport": t})
    src.extract()
    assert "apikey=k123" in captured["url"]


# ------------------------------------------------------------- playwright
def test_scraper_assembles_columns(spark):
    def fetcher(url, wait_for, selectors):
        assert url == "http://quotes"
        assert wait_for == ".loaded"
        return {".title": ["t1", "t2"], ".author": ["a1", "a2"]}

    src = PlaywrightScraperSource(
        spark,
        {
            "url": "http://quotes",
            "wait_for": ".loaded",
            "selectors": {"title": ".title", "author": ".author"},
            "page_fetcher": fetcher,
        },
    )
    rows = src.extract().orderBy("title").collect()
    assert [(r["title"], r["author"]) for r in rows] == [("t1", "a1"), ("t2", "a2")]


def test_scraper_unequal_counts_raise(spark):
    src = PlaywrightScraperSource(
        spark,
        {
            "url": "http://q",
            "selectors": {"a": ".a", "b": ".b"},
            "page_fetcher": lambda u, w, s: {".a": ["x"], ".b": ["y", "z"]},
        },
    )
    with pytest.raises(ValueError, match="unequal"):
        src.extract()


def test_scraper_without_playwright_raises():
    with pytest.raises(NotImplementedError):
        from etl_ml_pipeline_spark.sources.playwright_scraper import _playwright_fetch

        _playwright_fetch("http://x", None, [".a"])


def test_assemble_columns_empty():
    assert assemble_columns({".a": []}, {"a": ".a"}) == []


def test_registry_has_api_sources():
    from etl_ml_pipeline_spark.registry import list_registered

    keys = list_registered()["sources"]
    for k in ("rest_api", "alpha_vantage", "playwright_scraper"):
        assert k in keys
