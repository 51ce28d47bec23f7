"""Headless-browser scraper adapter (interface parity, import-gated).

Capability parity with /root/reference/src/data_extractor/extractors/
playwright_scraper.py:23-80: navigate to ``url``, optionally wait for a
``wait_for`` CSS selector, extract N CSS ``selectors`` into N columns,
and enforce that all selectors matched equal element counts, else
``ValueError`` (reference playwright_scraper.py:64-71).

Playwright is not installed in this container (SURVEY.md §7.3 step 6:
"implement the adapter interface; mark network-dependent, test with
mocks"), so the browser call is behind an import-try. Tests inject a
``page_fetcher`` callable returning ``{selector: [texts]}`` — the
column-assembly, equal-count enforcement, and DataFrame construction
(the Spark-side plumbing) are fully real and tested.

Scale path: a URL-list DataFrame + ``mapInPandas`` with one browser
session per partition (SURVEY.md §2.1/S6); single-URL scrape is
driver-side by nature.
"""

from __future__ import annotations

from typing import Any, Callable

from pyspark.sql import DataFrame

from etl_ml_pipeline_spark.registry import register_source
from etl_ml_pipeline_spark.sources.base import BaseSource

# page_fetcher(url, wait_for, selectors) -> {selector: [text, ...]}
PageFetcher = Callable[[str, str | None, list[str]], dict[str, list[str]]]


def _playwright_fetch(url: str, wait_for: str | None, selectors: list[str]) -> dict[str, list[str]]:
    try:
        from playwright.sync_api import sync_playwright  # noqa: F401
    except ImportError as exc:  # pragma: no cover - playwright absent here
        raise NotImplementedError(
            "playwright is not installed in this environment; inject a "
            "'page_fetcher' or install playwright to scrape live pages"
        ) from exc
    with sync_playwright() as p:  # pragma: no cover - needs browser + network
        browser = p.chromium.launch(headless=True)
        page = browser.new_page()
        page.goto(url)
        if wait_for:
            page.wait_for_selector(wait_for)
        out = {
            sel: [el.inner_text() for el in page.query_selector_all(sel)]
            for sel in selectors
        }
        browser.close()
        return out


def assemble_columns(
    extracted: dict[str, list[str]], columns: dict[str, str]
) -> list[dict[str, Any]]:
    """{selector: texts} + {column: selector} -> row dicts.

    Enforces the reference's equal-element-count contract
    (playwright_scraper.py:64-71).
    """
    counts = {col: len(extracted.get(sel, [])) for col, sel in columns.items()}
    if len(set(counts.values())) > 1:
        raise ValueError(f"Selectors matched unequal element counts: {counts}")
    n = next(iter(counts.values()), 0)
    return [
        {col: extracted[sel][i] for col, sel in columns.items()} for i in range(n)
    ]


@register_source("playwright_scraper")
class PlaywrightScraperSource(BaseSource):
    """Config: url, selectors ({column_name: css_selector}), wait_for,
    page_fetcher (test injection)."""

    def extract(self) -> DataFrame:
        columns: dict[str, str] = self.config["selectors"]
        fetcher: PageFetcher = self.config.get("page_fetcher") or _playwright_fetch
        extracted = fetcher(
            self.config["url"], self.config.get("wait_for"), list(columns.values())
        )
        rows = assemble_columns(extracted, columns)
        schema = ", ".join(f"{c} string" for c in columns)
        return self.spark.createDataFrame(rows, schema)
