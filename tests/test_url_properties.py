"""Property tests for the URL canonicalization algebra.

Two properties make a canonical form trustworthy as a dedup key:

1. IDEMPOTENCE — canonicalize(canonicalize(u)) == canonicalize(u):
   the canonical output must be a fixed point of its own algebra, or
   re-processing a cleaned corpus silently re-keys pages.
2. VARIANT-INVARIANCE — every spelling the rules claim to collapse
   (scheme/host case, www, default port, param order, tracking params,
   duplicate/trailing slashes, fragments) maps to the same dedup key
   as the plain spelling.

URLs are generated compositionally so the properties cover the
component cross-product rather than a few handpicked examples.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_ml_pipeline_spark.operators import url as U

_SETTINGS = dict(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_label = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABC012-", min_size=1, max_size=8
).filter(lambda s: not s.startswith("-") and not s.endswith("-"))
_seg = st.text(alphabet="abcXYZ012._-~", min_size=1, max_size=6)
_pkey = st.text(alphabet="abcz09", min_size=1, max_size=4)


@st.composite
def _urls(draw):
    scheme = draw(st.sampled_from(["http", "https", "HTTP", "Https"]))
    www = draw(st.sampled_from(["", "www.", "WWW."]))
    host = ".".join(draw(st.lists(_label, min_size=2, max_size=4)))
    port = draw(st.sampled_from(["", ":80", ":443", ":8080", ":9"]))
    segs = draw(st.lists(_seg, min_size=0, max_size=3))
    path = "".join(
        draw(st.sampled_from(["/", "//"])) + s for s in segs
    ) + draw(st.sampled_from(["", "/", "//"]))
    n_params = draw(st.integers(0, 3))
    params = [
        f"{draw(_pkey)}={draw(_pkey)}" for _ in range(n_params)
    ] + draw(
        st.lists(
            st.sampled_from(
                ["utm_source=x", "utm_campaign=Y", "gclid=1", "fbclid=2", "ref=h", ""]
            ),
            max_size=2,
        )
    )
    query = "?" + "&".join(params) if params else ""
    frag = draw(st.sampled_from(["", "#x", "#sec/1?q=2"]))
    return f"{scheme}://{www}{host}{port}{path}{query}{frag}"


def _canon_batch(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = df.select(
        U.canonicalize_url(F.col("url")).alias("c"),
        U.url_dedup_key(F.col("url")).alias("k"),
    ).collect()
    return [(r["c"], r["k"]) for r in rows]


@given(urls=st.lists(_urls(), min_size=1, max_size=8))
@settings(**_SETTINGS)
def test_canonicalize_is_idempotent(spark, urls):
    first = _canon_batch(spark, urls)
    assert all(c is not None for c, _ in first), first
    second = _canon_batch(spark, [c for c, _ in first])
    assert [c for c, _ in second] == [c for c, _ in first]
    assert [k for _, k in second] == [k for _, k in first]


@given(url=_urls(), data=st.data())
@settings(**_SETTINGS)
def test_variants_share_the_dedup_key(spark, url, data):
    """Apply a random collapse-class transformation; the key must hold."""
    import re

    m = re.match(r"^([^:]+)://([^/?#]*)([^?#]*)(\?[^#]*)?(#.*)?$", url)
    scheme, auth, path, query, _ = m.groups()
    query = query or ""
    variant = data.draw(
        st.sampled_from(
            [
                f"{scheme.upper()}://{auth}{path}{query}",
                f"{scheme}://{auth.upper()}{path}{query}",
                f"{scheme}://{auth}{path}{query}#other",
                f"{scheme}://{auth}{path}/{query}",
                f"{'https' if scheme.lower() == 'http' else 'http'}://{auth}{path}{query}",
                f"{scheme}://{auth}{path}{query}"
                + ("&" if query else "?")
                + "utm_medium=z",
            ]
        )
    )
    a, b = _canon_batch(spark, [url, variant])
    assert a[1] == b[1], (url, variant)
