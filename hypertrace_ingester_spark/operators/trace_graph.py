"""Per-trace graph operators — ApiTraceGraph analog (SURVEY.md §2.4).

The reference partitions each trace's spans into **ApiNodes** (BFS from each
API-entry span, stopping at exit-boundary children / new entry boundaries;
orphan exit roots become their own nodes) and derives ApiNode→ApiNode edges
through exit→entry parent-child pairs
(hypertrace-trace-enricher-api/.../trace/util/ApiTraceGraph.java:155-273
nodes, 275-366 edges). It also computes boundary types from the parent span
(ApiBoundaryTypeAttributeEnricher.java:65-121).

Spark design (SURVEY §7 hard-part 1): a trace is SMALL (≤ thousands of
spans, capped upstream by the G3 row cap), so the graph walk runs per-group
inside ONE ``applyInPandas`` — vectorized Arrow transfer in, plain-Python
BFS over an in-memory adjacency dict per trace, narrow rows out. The
shuffle is a single hash partition on (tenant_id, trace_id); no distributed
graph engine, no iterative joins.

What stays relational: parent←→child pairing for boundary classification is
ALSO expressible as a self-join (`span_boundary_types` below) — used when
only boundary flags are needed (cheaper: no Python, stays codegen'd).
"""

from __future__ import annotations

from collections import deque
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SPANS_SCHEMA = (
    "tenant_id string, trace_id string, span_id string, parent_span_id string, "
    "ts_ms long, kind string, service string"
)

API_NODES_SCHEMA = (
    "tenant_id string, trace_id string, span_id string, api_node_id int, "
    "is_node_head boolean, node_depth int"
)

API_EDGES_SCHEMA = (
    "tenant_id string, trace_id string, src_node_id int, dst_node_id int, "
    "src_span_id string, dst_span_id string"
)


def _build_api_nodes(pdf: pd.DataFrame) -> tuple[dict, list]:
    """ApiTraceGraph.java:155-273 semantics on one trace:

    - every ENTRY span starts a new ApiNode and BFS-claims descendants,
      stopping when a child is itself ENTRY (new node boundary);
    - EXIT/other spans reachable from the entry belong to its node;
    - roots that are not ENTRY (orphan exits) become their own nodes.
    Returns (span_id → (node_id, depth, is_head), ordered head list)."""
    spans = pdf.sort_values(["ts_ms", "span_id"], ignore_index=True)
    kind = dict(zip(spans["span_id"], spans["kind"]))
    children: dict[str, list[str]] = {}
    roots: list[str] = []
    span_ids = set(spans["span_id"])
    for sid, parent in zip(spans["span_id"], spans["parent_span_id"]):
        if parent is None or parent not in span_ids:
            roots.append(sid)  # dangling parents → treated as roots (broken-trace path)
        else:
            children.setdefault(parent, []).append(sid)

    assign: dict[str, tuple[int, int, bool]] = {}
    heads: list[str] = []

    def claim(head: str) -> None:
        node_id = len(heads)
        heads.append(head)
        assign[head] = (node_id, 0, True)
        q = deque([(head, 0)])
        while q:
            sid, depth = q.popleft()
            for child in children.get(sid, ()):
                if child in assign:
                    continue
                if kind[child] == "ENTRY":
                    continue  # boundary: child starts its own node
                assign[child] = (node_id, depth + 1, False)
                q.append((child, depth + 1))

    # pass 1: every ENTRY span heads a node (BFS order: by ts)
    for sid in spans["span_id"]:
        if kind[sid] == "ENTRY" and sid not in assign:
            claim(sid)
    # pass 2: unclaimed roots (orphan exit roots) head their own nodes
    for sid in spans["span_id"]:
        if sid not in assign and (sid in roots or kind.get(sid) != "ENTRY"):
            if sid in roots:
                claim(sid)
    # pass 3: anything still unclaimed (unreachable islands) → own node
    for sid in spans["span_id"]:
        if sid not in assign:
            claim(sid)
    return assign, heads


def api_nodes(spans: DataFrame) -> DataFrame:
    """Span → ApiNode assignment, one ``applyInPandas`` over
    (tenant_id, trace_id) groups."""

    def per_trace(pdf: pd.DataFrame) -> pd.DataFrame:
        assign, _ = _build_api_nodes(pdf)
        rows = [
            {
                "tenant_id": t, "trace_id": tr, "span_id": s,
                "api_node_id": assign[s][0],
                "is_node_head": assign[s][2],
                "node_depth": assign[s][1],
            }
            for t, tr, s in zip(pdf["tenant_id"], pdf["trace_id"], pdf["span_id"])
        ]
        return pd.DataFrame(rows)

    return spans.groupBy("tenant_id", "trace_id").applyInPandas(
        per_trace, schema=API_NODES_SCHEMA
    )


def api_edges(spans: DataFrame) -> DataFrame:
    """ApiNode→ApiNode edges: parent-child span pairs that cross node
    boundaries (exit→entry pairing, ApiTraceGraph.java:275-366; the
    entry→entry case covers proxy-style missing exits)."""

    def per_trace(pdf: pd.DataFrame) -> pd.DataFrame:
        assign, _ = _build_api_nodes(pdf)
        span_ids = set(pdf["span_id"])
        out = []
        t = pdf["tenant_id"].iloc[0]
        tr = pdf["trace_id"].iloc[0]
        for sid, parent in zip(pdf["span_id"], pdf["parent_span_id"]):
            if parent is None or parent not in span_ids:
                continue
            src, dst = assign[parent][0], assign[sid][0]
            if src != dst:
                out.append(
                    {
                        "tenant_id": t, "trace_id": tr,
                        "src_node_id": src, "dst_node_id": dst,
                        "src_span_id": parent, "dst_span_id": sid,
                    }
                )
        return pd.DataFrame(
            out,
            columns=["tenant_id", "trace_id", "src_node_id", "dst_node_id",
                     "src_span_id", "dst_span_id"],
        )

    return spans.groupBy("tenant_id", "trace_id").applyInPandas(
        per_trace, schema=API_EDGES_SCHEMA
    )


def span_boundary_types(spans: DataFrame) -> DataFrame:
    """Relational boundary classification — the join-only subset
    (ApiBoundaryTypeAttributeEnricher.java:65-121): an ENTRY span is an API
    entry iff its parent is missing, not ENTRY, or in another service; an
    EXIT span is an API exit iff it has no children or an ENTRY child.
    Self-join on span_id = parent_span_id; stays fully JVM-side."""
    s = spans.alias("s")
    p = spans.select(
        F.col("span_id").alias("p_span_id"),
        F.col("trace_id").alias("p_trace_id"),
        F.col("kind").alias("parent_kind"),
        F.col("service").alias("parent_service"),
    ).alias("p")
    with_parent = s.join(
        p,
        (F.col("s.parent_span_id") == F.col("p.p_span_id"))
        & (F.col("s.trace_id") == F.col("p.p_trace_id")),
        "left",
    )
    child_stats = (
        spans.filter(F.col("parent_span_id").isNotNull())
        .groupBy(F.col("trace_id").alias("c_trace_id"), F.col("parent_span_id").alias("c_parent"))
        .agg(
            F.count(F.lit(1)).alias("n_children"),
            F.max(F.when(F.col("kind") == "ENTRY", 1).otherwise(0)).alias("has_entry_child"),
        )
    )
    with_children = with_parent.join(
        child_stats,
        (F.col("s.span_id") == F.col("c_parent")) & (F.col("s.trace_id") == F.col("c_trace_id")),
        "left",
    )
    is_api_entry = (F.col("s.kind") == "ENTRY") & (
        F.col("parent_kind").isNull()
        | (F.col("parent_kind") != "ENTRY")
        | (F.col("parent_service") != F.col("s.service"))
    )
    is_api_exit = (F.col("s.kind") == "EXIT") & (
        F.col("n_children").isNull() | (F.col("has_entry_child") == 1)
    )
    return with_children.select(
        "s.tenant_id", "s.trace_id", "s.span_id",
        F.coalesce(is_api_entry, F.lit(False)).alias("is_api_entry"),
        F.coalesce(is_api_exit, F.lit(False)).alias("is_api_exit"),
    )


def spans_fixture(spark, n_traces: int = 4):
    """F2 `spans_small` fixture: deterministic multi-level trees with a
    dangling-parent case (RawSpansGrouperTest.java shapes)."""
    rows = []
    for t in range(n_traces):
        tr = f"trace-{t}"
        tenant = f"tenant{t % 2 + 1}"
        base = 1_700_000_000_000 + t * 10_000
        # root entry -> exit -> (child entry -> exit), plus orphan exit
        rows += [
            (tenant, tr, f"{tr}-e1", None, base, "ENTRY", "svc-a"),
            (tenant, tr, f"{tr}-x1", f"{tr}-e1", base + 10, "EXIT", "svc-a"),
            (tenant, tr, f"{tr}-e2", f"{tr}-x1", base + 20, "ENTRY", "svc-b"),
            (tenant, tr, f"{tr}-x2", f"{tr}-e2", base + 30, "EXIT", "svc-b"),
            (tenant, tr, f"{tr}-orphan", f"{tr}-missing", base + 40, "EXIT", "svc-c"),
        ]
    return spark.createDataFrame(rows, SPANS_SCHEMA)
