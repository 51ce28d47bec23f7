"""Layer-neutral size heuristics shared by operators and queries.

An explicit broadcast hint is only ever SAFE for inputs that are small
by construction. 64 MB of parquet (~a few hundred MB on-heap) is a
comfortable single-executor build side; past it, withholding the hint
lets Catalyst/AQE choose from actual runtime sizes. This module owns
the threshold and the on-disk measurement so both the operators layer
(e.g. the ``decontaminate`` transform's benchmark file) and the
queries layer (``tables.dim`` / ``maybe_broadcast``) share ONE
definition — operators must not import from queries (layering), and a
second copy of the constant would drift.
"""

from __future__ import annotations

BROADCAST_MAX_BYTES = 64 << 20


def path_bytes(path: str) -> int | None:
    """On-disk bytes of a parquet file or part-file directory; None when
    unknowable (remote path) — treat unknown as NOT small."""
    import os

    try:
        if os.path.isdir(path):
            return sum(
                e.stat().st_size for e in os.scandir(path) if e.is_file()
            )
        return os.path.getsize(path)
    except OSError:
        return None
