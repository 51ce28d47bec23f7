"""Plugin registries for sources, transforms, and sinks.

Mirrors the reference's decorator-registry capability
(/root/reference/src/data_extractor/registry.py:22-101): string key ->
class, duplicate registration raises, unknown key raises ``KeyError``
listing the available keys. Pure Python — Spark-agnostic.
"""

from __future__ import annotations

from typing import Callable, Type, TypeVar

T = TypeVar("T")


class Registry:
    """A named string->class registry with fail-fast duplicate detection."""

    def __init__(self, kind: str) -> None:
        self.kind = kind
        self._entries: dict[str, type] = {}

    def register(self, key: str) -> Callable[[Type[T]], Type[T]]:
        def deco(cls: Type[T]) -> Type[T]:
            if key in self._entries:
                raise ValueError(
                    f"Duplicate {self.kind} registration for key '{key}' "
                    f"({self._entries[key].__name__} vs {cls.__name__})"
                )
            self._entries[key] = cls
            return cls

        return deco

    def get(self, key: str) -> type:
        try:
            return self._entries[key]
        except KeyError:
            raise KeyError(
                f"Unknown {self.kind} '{key}'. Available: "
                + ", ".join(sorted(self._entries))
            ) from None

    def keys(self) -> list[str]:
        return sorted(self._entries)

    def items(self) -> list[tuple[str, type]]:
        return sorted(self._entries.items())


SOURCES = Registry("source")
TRANSFORMS = Registry("transform")
SINKS = Registry("sink")

register_source = SOURCES.register
register_transform = TRANSFORMS.register
register_sink = SINKS.register


def list_registered() -> dict[str, list[str]]:
    """Dump all registered plugin keys (CLI ``--list-modules`` support).

    The ``unavailable`` entry surfaces optional modules whose import
    failed (missing third-party dependency) — visible instead of
    silently absent."""
    # Import side-effect modules so every built-in plugin is registered.
    from etl_ml_pipeline_spark import plugins

    return {
        "sources": SOURCES.keys(),
        "transforms": TRANSFORMS.keys(),
        "sinks": SINKS.keys(),
        "unavailable": [
            f"{mod}: {err}" for mod, err in plugins._OPTIONAL_IMPORT_ERRORS.items()
        ],
    }
