"""The vectorized value_hash must preserve the per-cell canonical
semantics (_canon_value) on every dtype fast path, and stay a pure
multiset comparator (order-insensitive, column-boundary safe)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from etl_ml_pipeline_spark.oracle import _canon_series, _canon_value, value_hash


def test_fast_paths_match_scalar_canonicalization():
    frames = [
        pd.DataFrame({"a": [1, 2, 3], "b": [1.0, 2.5, np.nan], "s": ["x", "y", None]}),
        pd.DataFrame({"f": [0.1, -0.0, 1e16, 1e15 - 1.0, 123456.789, float("nan")]}),
        pd.DataFrame({"i": np.array([1, 2], dtype="int32")}),
        pd.DataFrame(
            {
                "l": [[1, 2], [3.0, None]],
                "t": [pd.Timestamp("2024-01-01 02:03:04"), pd.Timestamp("2020-05-06")],
            }
        ),
        pd.DataFrame({"b": [True, False]}),
    ]
    for df in frames:
        for c in df.columns:
            fast = _canon_series(df[c]).tolist()
            slow = [_canon_value(v) for v in df[c]]  # the old row-tuple path
            assert fast == slow, (c, fast, slow)


def test_multiset_semantics():
    a = pd.DataFrame({"x": [1, 2, 3], "y": ["a", "b", "c"]})
    permuted = a.sample(frac=1, random_state=1).reset_index(drop=True)
    assert value_hash(a) == value_hash(permuted)

    changed = a.copy()
    changed.loc[0, "x"] = 9
    assert value_hash(a) != value_hash(changed)

    # column-boundary collisions are separated
    d1 = pd.DataFrame({"x": ["ab"], "y": ["c"]})
    d2 = pd.DataFrame({"x": ["a"], "y": ["bc"]})
    assert value_hash(d1) != value_hash(d2)

    # cross-dtype: int column == int-valued float column
    assert value_hash(pd.DataFrame({"x": [1, 2]})) == value_hash(
        pd.DataFrame({"x": [1.0, 2.0]})
    )

    # duplicate multiplicity matters
    assert value_hash(pd.DataFrame({"x": [1, 1, 2]})) != value_hash(
        pd.DataFrame({"x": [1, 2, 2]})
    )

    assert value_hash(pd.DataFrame({"x": []})) == value_hash(pd.DataFrame({"x": []}))


def test_nullable_and_extension_int_dtypes_route_to_scalar_path():
    """ADVICE r05: pandas Int64 (extension dtype, kind 'i') carrying
    pd.NA must not hit the astype('int64') fast path (raises), and
    uint64 above 2^63 must not silently wrap."""
    import numpy as np

    s = pd.Series([1, None, 3], dtype="Int64")
    got = _canon_series(s).tolist()
    assert got == ["1", "<null>", "3"]

    big = np.iinfo("uint64").max  # 2^64 - 1: wraps to -1 via int64 view
    s2 = pd.Series([1, big], dtype="uint64")
    got2 = _canon_series(s2).tolist()
    assert got2 == ["1", str(big)]

    # plain in-range ints still take the fast path and agree with scalar
    s3 = pd.Series([1, -5, 0], dtype="int32")
    assert _canon_series(s3).tolist() == [_canon_value(v) for v in s3]
