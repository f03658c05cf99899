"""Print formatted physical plans for every declared query — the manual
review loop for shuffle/pushdown/codegen auditing.

Usage: python tools/explain_audit.py [sf_dir] [query ...]

Exchange counting rule (round-6 fix, pinned by
tests/test_gates.py::test_explain_audit_exchange_counting_rule): plan
TEXT replays every cached subtree under each ``InMemoryTableScan`` — a
query that persists an iteration frame prints the build-time exchanges
once per cache REFERENCE, so a naive ``plan.count("Exchange")`` reported
``pagerank_copurchase`` at 4686 "exchanges" when the executed plan runs
single-digit. The audit therefore counts exchange NODES in the physical
tree section only, skipping everything indented under an
``InMemoryTableScan`` (those operators already ran, once, when the cache
materialized), and reports the InMemoryTableScan count alongside so a
cache-heavy plan is still visible as such.
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

_TREE_PREFIX_CHARS = " :+-*"


def tree_section(plan: str) -> list[str]:
    """The physical-plan TREE lines of a formatted/toString explain: from
    the root operator down to the first blank line (the formatted mode's
    per-node detail section repeats every node name — including cached
    ones — and must not be counted)."""
    lines = plan.splitlines()
    start = 0
    for i, line in enumerate(lines):
        if line.startswith("== Physical Plan =="):
            start = i + 1
            break
    out: list[str] = []
    for line in lines[start:]:
        if not line.strip():
            break
        out.append(line)
    return out


def executed_tree_lines(plan: str) -> list[str]:
    """Tree lines OUTSIDE InMemoryTableScan-cached subtrees (the scan
    node itself is kept; its already-materialized child plan is not).

    Depth = width of the tree-drawing prefix (spaces, ``:``, ``+-`` and
    the codegen ``*``); a cached subtree is every subsequent line strictly
    deeper than its InMemoryTableScan node.
    """
    out: list[str] = []
    skip_depth: int | None = None
    for line in tree_section(plan):
        body = line.lstrip(_TREE_PREFIX_CHARS)
        depth = len(line) - len(body)
        if skip_depth is not None:
            if depth > skip_depth:
                continue
            skip_depth = None
        out.append(line)
        if body.startswith("InMemoryTableScan"):
            skip_depth = depth
    return out


def count_executed_exchanges(plan: str) -> tuple[int, int]:
    """(exchange nodes outside cached subtrees, InMemoryTableScan count).

    Counts tree NODES whose operator name starts with ``Exchange`` — i.e.
    SHUFFLE exchanges (hash/range/single-partition). ``BroadcastExchange``
    deliberately does not match: a broadcast is bounded data movement by
    construction, and the audit's scale question is shuffle volume. The
    formatted per-node detail section is never counted.
    """
    exchanges = 0
    imts = 0
    for line in executed_tree_lines(plan):
        body = line.lstrip(_TREE_PREFIX_CHARS)
        if body.startswith("Exchange"):
            exchanges += 1
        elif body.startswith("InMemoryTableScan"):
            imts += 1
    return exchanges, imts


def count_single_partition_exchanges(plan: str) -> int:
    """Executed ``Exchange SinglePartition`` nodes — the classic
    scale-killer (one task absorbs the whole frame). The tree section
    shows only ``Exchange (N)``; the partitioning kind lives in node N's
    detail block, so resolve executed node ids → detail ``Arguments:``.
    Legitimate bounded uses exist (a full-frame window over a result-
    sized audit frame); the audit SURFACES them for review, it does not
    forbid them."""
    import re

    ids = []
    for line in executed_tree_lines(plan):
        body = line.lstrip(_TREE_PREFIX_CHARS)
        m = re.match(r"Exchange \((\d+)\)", body)
        if m:
            ids.append(m.group(1))
    n = 0
    for i in ids:
        m = re.search(
            rf"^\({i}\) Exchange\n(?:.*\n)*?Arguments: ([^\n]*)",
            plan,
            re.MULTILINE,
        )
        if m and m.group(1).startswith("SinglePartition"):
            n += 1
    return n


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from bytewax_iceberg_connector_spark.session import get_spark

    spark = get_spark(app_name="explain-audit")
    spark.sparkContext.setLogLevel("ERROR")
    for name, fn in e.queries().items():
        if only and name not in only:
            continue
        print(f"\n{'=' * 70}\n## {name}\n{'=' * 70}")
        try:
            df = fn(spark, sf_dir)
            plan = df.sparkSession._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
            print(plan)
            flags = []
            if "BatchEvalPython" in plan:
                flags.append("PYTHON-UDF")
            if "ArrowEvalPython" in plan:
                flags.append("PANDAS-UDF")
            n_ex, n_imts = count_executed_exchanges(plan)
            if n_ex:
                flags.append(f"exchanges={n_ex}")
            n_sp = count_single_partition_exchanges(plan)
            if n_sp:
                flags.append(f"single_partition={n_sp}")
            if n_imts:
                flags.append(f"cached_scans={n_imts}")
            if "PushedFilters: []" in plan:
                flags.append("NO-PUSHDOWN")
            print(f">>> audit: {', '.join(flags) or 'clean'}")
        except Exception as exc:  # noqa: BLE001
            print(f">>> failed to plan: {exc!r}")
    spark.stop()


if __name__ == "__main__":
    main()
