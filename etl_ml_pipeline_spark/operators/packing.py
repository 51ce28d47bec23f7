"""Distributed first-fit-decreasing (FFD) bin packing.

The prefix-sum packers (``pack_documents_budget`` / ``_capacity``,
``layout_compaction_plan``) are ORDER-PRESERVING: bins are contiguous
id ranges, which is what file compaction and curriculum-ordered packing
want. An episode/sequence assembler optimizing for FILL instead wants
classic bin packing — FFD is the standard heuristic (≤ 11/9·OPT + 6/9
bins, Dósa 2007; any first-fit order leaves at most one bin ≤ half
full).

FFD is inherently sequential (each item goes to the FIRST bin that
fits, given all earlier placements), so the distributed form shards
items into SEGMENTS by a deterministic id hash and runs EXACT FFD
independently per segment inside an Arrow-batched ``applyInPandas``
group — bins never span segments, per-task state is one segment's bin
loads, and the only shuffle is the segment hash partition. The fill
guarantee degrades by at most one under-half bin PER SEGMENT (the
per-segment first-fit bound), so pick n_segments as the parallelism
floor, not higher. At 100 TB: segments of ~1e6 items keep the loads
array in task memory; the packing never sees text, only (id, size).

Oversize items (size > capacity) can never fit a bin: each gets a
dedicated bin, flagged, so the caller can split or reject them — the
same whole-doc-overflow semantics pack_documents_budget documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_ml_pipeline_spark.operators.base import BaseTransform
from etl_ml_pipeline_spark.operators.text import token_hash60
from etl_ml_pipeline_spark.registry import register_transform


def ffd_pack(
    df: DataFrame,
    size_col: str,
    id_col: str,
    capacity: int,
    n_segments: int = 8,
) -> DataFrame:
    """Per-item FFD bin assignment: (id, size, segment_id, bin_id,
    oversize). Deterministic: segment = 60-bit id hash mod n_segments;
    within a segment items are packed in (size DESC, id ASC) order and
    bins are numbered in creation order. ``bin_id`` is unique only
    within a segment — the global bin key is (segment_id, bin_id)."""
    import pandas as pd

    if capacity <= 0:
        raise ValueError(f"ffd_pack: capacity must be positive, got {capacity}")

    items = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(size_col).cast("long").alias("size"),
        (token_hash60(F.col(id_col).cast("string")) % n_segments)
        .cast("int")
        .alias("segment_id"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["size", "id"], ascending=[False, True], kind="mergesort"
        ).reset_index(drop=True)
        # First-fit via a max-residual segment tree with leftmost
        # descent: find the LOWEST-indexed open bin whose residual
        # capacity fits the item in O(log bins), update in O(log bins)
        # — the classic exact-FFD structure. The naive linear scan is
        # O(n*bins) per segment, which the scale ladder measured
        # SUPERLINEAR (sf1 3.8s -> sf10 120.5s) before this landed;
        # assignments are identical (leaf order = bin creation order).
        n = len(pdf)
        width = 1
        while width < max(n, 1):
            width *= 2
        tree = [0] * (2 * width)  # max residual over each node's leaf range
        n_bins = 0

        def open_bin(residual: int) -> int:
            nonlocal n_bins
            idx = n_bins
            n_bins += 1
            node = width + idx
            tree[node] = residual
            node //= 2
            while node:
                tree[node] = max(tree[2 * node], tree[2 * node + 1])
                node //= 2
            return idx

        def place(idx: int, size: int) -> None:
            node = width + idx
            tree[node] -= size
            node //= 2
            while node:
                tree[node] = max(tree[2 * node], tree[2 * node + 1])
                node //= 2

        bin_ids: list[int] = []
        oversize: list[bool] = []
        # First bin opened with a real residual (capacity - size). An
        # oversize dedicated bin has load > capacity, so first-fit must
        # SKIP it even for a 0-size item (load + 0 > capacity) — items
        # sort size DESC, so when any oversize item exists it owns bin 0
        # and 0-size items must not join it (ADVICE r13 #1).
        first_fit_bin = -1
        for size in pdf["size"].to_list():
            if size < 0:
                raise ValueError(f"ffd_pack: negative size {size}")
            if size > capacity:
                # dedicated bin that never accepts another item
                bin_ids.append(open_bin(0))
                oversize.append(True)
                continue
            if size == 0:
                # fits any NON-oversize bin; first-fit puts it in the
                # earliest one. Guarded explicitly: the tree descent
                # below uses residual >= size, and every UNOPENED leaf
                # (and every full or oversize bin) has residual 0 >= 0 —
                # a 0-size item would otherwise land on a phantom or
                # dedicated bin.
                if first_fit_bin < 0:
                    first_fit_bin = open_bin(capacity)
                bin_ids.append(first_fit_bin)
                oversize.append(False)
                continue
            if first_fit_bin < 0:
                first_fit_bin = n_bins  # next open_bin/place target below
            if tree[1] >= size:
                node = 1
                while node < width:
                    node = 2 * node if tree[2 * node] >= size else 2 * node + 1
                idx = node - width
                place(idx, size)
                bin_ids.append(idx)
            else:
                bin_ids.append(open_bin(capacity - size))
            oversize.append(False)
        pdf["bin_id"] = pd.Series(bin_ids, dtype="int64")
        pdf["oversize"] = pd.Series(oversize, dtype="bool")
        return pdf

    return items.groupBy("segment_id").applyInPandas(
        pack,
        schema="id long, size long, segment_id int, bin_id long, oversize boolean",
    )


def ffd_segment_contract(packed: DataFrame, capacity: int) -> DataFrame:
    """Fold a :func:`ffd_pack` assignment into per-segment rows whose
    exact columns a SQL oracle can recompute and whose booleans certify
    the packing:

    - ``n_docs`` / ``seg_tokens`` / ``n_oversize`` / ``lb_bins`` —
      exact arithmetic on the input (lb = oversize bins + ceil(rest
      tokens / capacity), a valid lower bound on ANY packing);
    - ``bins_fit`` — every non-oversize bin's load ≤ capacity;
    - ``lb_ok`` — realized bins ≥ lb_bins;
    - ``ub_ok`` — realized bins ≤ n_oversize + floor(2·rest/capacity)+1
      (the at-most-one-bin-≤-half-full first-fit guarantee).
    """
    bins = packed.groupBy("segment_id", "bin_id").agg(
        F.count("*").alias("bin_docs"),
        F.sum("size").alias("bin_tokens"),
        F.max(F.col("oversize").cast("int")).alias("bin_oversize"),
    )
    seg = bins.groupBy("segment_id").agg(
        F.sum("bin_docs").cast("long").alias("n_docs"),
        F.sum("bin_tokens").cast("long").alias("seg_tokens"),
        F.sum("bin_oversize").cast("long").alias("n_oversize"),
        F.sum(
            F.when(F.col("bin_oversize") == 1, F.col("bin_tokens"))
        ).alias("_oversize_tokens"),
        F.count("*").cast("long").alias("_n_bins"),
        F.max(
            F.when(F.col("bin_oversize") == 0, F.col("bin_tokens"))
        ).alias("_max_fit_load"),
    )
    # rest = seg_tokens - oversize_tokens, inlined into the div exprs.
    # Exact long division (`div`), NOT F.floor(a / b): double division
    # loses integer precision past ~2^53 summed tokens and could flip
    # lb_ok/ub_ok against the oracle's exact `//` (ADVICE r13 #2).
    lb = F.col("n_oversize") + F.expr(
        f"(seg_tokens - coalesce(_oversize_tokens, 0) + {int(capacity)} - 1) "
        f"div {int(capacity)}"
    ).cast("long")
    ub = (
        F.col("n_oversize")
        + F.expr(
            f"(2 * (seg_tokens - coalesce(_oversize_tokens, 0))) "
            f"div {int(capacity)}"
        ).cast("long")
        + F.lit(1)
    )
    return seg.select(
        "segment_id",
        "n_docs",
        "seg_tokens",
        "n_oversize",
        lb.alias("lb_bins"),
        (F.coalesce(F.col("_max_fit_load"), F.lit(0)) <= capacity).alias(
            "bins_fit"
        ),
        (F.col("_n_bins") >= lb).alias("lb_ok"),
        (F.col("_n_bins") <= ub).alias("ub_ok"),
    )


@register_transform("ffd_pack")
class FfdPack(BaseTransform):
    """YAML form of the FFD episode assembler: appends
    (segment_id, bin_id, oversize) to each row so the sink writes the
    packed layout. config: size_col (required), id_col: doc_id,
    capacity (required), n_segments: 8. The global bin key is
    (segment_id, bin_id)."""

    def validate(self, df: DataFrame) -> None:
        cfg = self.config
        for key in ("size_col", "capacity"):
            if key not in cfg:
                raise ValueError(f"ffd_pack: config needs {key!r}")
        for col in (cfg["size_col"], cfg.get("id_col", "doc_id")):
            if col not in df.columns:
                raise ValueError(f"ffd_pack: column {col!r} not in input")
        clash = {"segment_id", "bin_id", "oversize"} & set(df.columns)
        if clash:
            raise ValueError(
                f"ffd_pack: input already has output columns {sorted(clash)}"
            )

    def transform(self, df: DataFrame) -> DataFrame:
        cfg = self.config
        self.validate(df)
        id_col = cfg.get("id_col", "doc_id")
        packed = ffd_pack(
            df,
            cfg["size_col"],
            id_col,
            int(cfg["capacity"]),
            n_segments=int(cfg.get("n_segments", 8)),
        )
        return df.join(
            packed.select(
                F.col("id").alias(id_col), "segment_id", "bin_id", "oversize"
            ),
            id_col,
        )
