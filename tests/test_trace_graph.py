"""ApiTraceGraph analog tests — golden node/edge assignments on the F2
spans fixture (ApiTraceGraph.java node semantics: entry-rooted BFS nodes,
orphan exit roots as own nodes; edges across node boundaries)."""

import pytest

from hypertrace_ingester_spark.operators import trace_graph as tg


@pytest.fixture(scope="module")
def spans(spark):
    return tg.spans_fixture(spark, n_traces=4).cache()


def test_api_nodes_assignment(spark, spans):
    nodes = tg.api_nodes(spans).toPandas()
    one = nodes[nodes.trace_id == "trace-0"].set_index("span_id")
    # e1 heads node 0 and claims its exit child; e2 heads node 1 with x2;
    # the orphan exit is its own node.
    assert one.loc["trace-0-e1", "api_node_id"] == one.loc["trace-0-x1", "api_node_id"]
    assert one.loc["trace-0-e2", "api_node_id"] == one.loc["trace-0-x2", "api_node_id"]
    assert one.loc["trace-0-e1", "api_node_id"] != one.loc["trace-0-e2", "api_node_id"]
    assert one.loc["trace-0-orphan", "api_node_id"] not in {
        one.loc["trace-0-e1", "api_node_id"], one.loc["trace-0-e2", "api_node_id"]
    }
    assert bool(one.loc["trace-0-e1", "is_node_head"])
    assert not bool(one.loc["trace-0-x1", "is_node_head"])
    assert one.loc["trace-0-x1", "node_depth"] == 1
    # every span assigned in every trace
    assert len(nodes) == spans.count()


def test_api_edges(spark, spans):
    edges = tg.api_edges(spans).toPandas()
    one = edges[edges.trace_id == "trace-1"]
    # exactly one cross-node parent-child pair per trace: x1 -> e2
    assert len(one) == 1
    assert one.iloc[0]["src_span_id"] == "trace-1-x1"
    assert one.iloc[0]["dst_span_id"] == "trace-1-e2"
    assert one.iloc[0]["src_node_id"] != one.iloc[0]["dst_node_id"]


def test_boundary_types_relational(spark, spans):
    b = tg.span_boundary_types(spans).toPandas().set_index(["trace_id", "span_id"])
    # root entry: api entry (no parent); e2: api entry (parent is EXIT)
    assert bool(b.loc[("trace-2", "trace-2-e1"), "is_api_entry"])
    assert bool(b.loc[("trace-2", "trace-2-e2"), "is_api_entry"])
    # x1 has an ENTRY child -> api exit; x2 is leaf exit -> api exit
    assert bool(b.loc[("trace-2", "trace-2-x1"), "is_api_exit"])
    assert bool(b.loc[("trace-2", "trace-2-x2"), "is_api_exit"])
    # entries are never api exits
    assert not bool(b.loc[("trace-2", "trace-2-e1"), "is_api_exit"])


def test_deterministic_across_partitionings(spark, spans):
    a = tg.api_nodes(spans.repartition(16)).orderBy("trace_id", "span_id").toPandas()
    b = tg.api_nodes(spans.coalesce(1)).orderBy("trace_id", "span_id").toPandas()
    assert a.equals(b)
