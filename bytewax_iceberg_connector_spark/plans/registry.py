"""Central query registry: aggregates every plan module's QUERIES/ORACLE.

The driver contract (/root/repo/__spark_entry__.py) consumes exactly these
two dicts. Modules are imported lazily-but-robustly: a module that fails to
import (e.g. missing optional dependency) drops only its own queries and
records the error instead of breaking the whole surface.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_PLAN_MODULES = (
    "relational",
    "temporal",
    "operator_queries",
    "llm",
    "streaming_queries",
    "lake",
    "curation",
    "behavioral",
)

IMPORT_ERRORS: dict[str, str] = {}


def _modules():
    out = []
    for name in _PLAN_MODULES:
        try:
            out.append(importlib.import_module(f"{__package__}.{name}"))
        except Exception as exc:  # pragma: no cover
            IMPORT_ERRORS[name] = repr(exc)
    return out


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable] = {}
    for mod in _modules():
        q.update(getattr(mod, "QUERIES", {}))
    return q


def all_oracles() -> dict[str, str]:
    o: dict[str, str] = {}
    for mod in _modules():
        o.update(getattr(mod, "ORACLE", {}))
    return o
