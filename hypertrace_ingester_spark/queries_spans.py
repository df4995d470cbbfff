"""Span-domain catalog queries — ApiTraceGraph, SpanEventView walks,
ServiceCallView union, RawServiceView — each with a DuckDB recursive-CTE
oracle over the SAME deterministic spans derivation (operators/spandom.py).

These close the round-1 fidelity gap: the graph semantics of
ApiTraceGraph.java:155-366, SpanEventViewGenerator.java:77-327,
ServiceCallViewGenerator.java:57-418 and RawServiceViewGenerator.java:25-105
now run on span-shaped data under the full rows+schema+hash gate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .operators import backend as be
from .operators import spandom
from .operators import trace_graph as tg
from .queries import register

_W = "WITH RECURSIVE\n" + spandom.SPANS_SQL


@register(
    "g_api_nodes",
    _W + "," + spandom.MEMBERS_SQL + """
    SELECT tenant_id, trace_id, span_id, head_span_id,
           CAST(node_depth AS BIGINT) AS node_depth,
           (span_id = head_span_id) AS is_node_head
    FROM members
    """,
    doc="ApiTraceGraph node partitioning (ApiTraceGraph.java:155-273): BFS "
        "from entry API boundaries, exit-boundary children unexpanded, "
        "orphan EXIT roots head their own nodes; spans outside any boundary "
        "stay nodeless. Oracle = DuckDB recursive CTE over the same spans "
        "derivation.",
)
def g_api_nodes(spark, sf_dir):
    return tg.api_nodes(spandom.spans(spark, sf_dir))


@register(
    "g_api_edges",
    _W + "," + spandom.MEMBERS_SQL + """
    SELECT m.tenant_id, m.trace_id, m.head_span_id AS src_head_span_id,
           c.span_id AS dst_head_span_id, m.span_id AS src_span_id,
           c.span_id AS dst_span_id
    FROM members m
    JOIN flags x ON x.trace_id = m.trace_id AND x.span_id = m.span_id
    JOIN flags c ON c.trace_id = m.trace_id AND c.parent_span_id = m.span_id
              AND c.is_entry_api
    WHERE x.is_exit_api
    """,
    doc="ApiNode→ApiNode edges through member-exit-boundary → entry-boundary "
        "child pairs (ApiTraceGraph.java:275-326; the entry→entry branch at "
        ":347 is dead code in the reference — see trace_graph.py docstring).",
)
def g_api_edges(spark, sf_dir):
    return tg.api_edges(spandom.spans(spark, sf_dir))


@register(
    "v_span_event_view",
    _W + """,
    walk AS (
      SELECT trace_id, span_id, span_id AS cur FROM flags
      UNION ALL
      SELECT w.trace_id, w.span_id, f.parent_span_id
      FROM walk w JOIN flags f ON f.trace_id = w.trace_id AND f.span_id = w.cur
      WHERE NOT f.is_entry_api AND f.parent_span_id IS NOT NULL
            AND f.parent_span_id <> -1
    ),
    api_entry AS (
      SELECT w.trace_id, w.span_id, w.cur AS api_trace_id
      FROM walk w JOIN flags f ON f.trace_id = w.trace_id AND f.span_id = w.cur
      WHERE f.is_entry_api
    ),
    upath AS (
      SELECT trace_id, span_id AS exit_id, span_id AS cur
      FROM flags WHERE is_exit_api
      UNION ALL
      SELECT u.trace_id, u.exit_id, f.parent_span_id
      FROM upath u
      JOIN flags f ON f.trace_id = u.trace_id AND f.span_id = u.cur
      JOIN flags p ON p.trace_id = u.trace_id AND p.span_id = f.parent_span_id
      WHERE f.parent_span_id IS NOT NULL AND f.parent_span_id <> -1
            AND p.kind <> 'ENTRY'
    ),
    callee AS (
      SELECT trace_id, exit_id, callee_id FROM (
        SELECT x.trace_id, x.span_id AS exit_id, c.span_id AS callee_id,
               row_number() OVER (PARTITION BY x.trace_id, x.span_id
                   ORDER BY c.ts_ms, c.span_id) AS rk
        FROM flags x
        JOIN flags c ON c.trace_id = x.trace_id AND c.parent_span_id = x.span_id
        WHERE x.is_exit_api AND c.is_entry_api
      ) WHERE rk = 1
    ),
    exit_map AS (
      SELECT trace_id, mapped_span, callee_id FROM (
        SELECT u.trace_id, u.cur AS mapped_span, c.callee_id,
               row_number() OVER (PARTITION BY u.trace_id, u.cur
                   ORDER BY xf.ts_ms DESC, xf.span_id DESC) AS rk
        FROM upath u
        JOIN flags s ON s.trace_id = u.trace_id AND s.span_id = u.cur
                   AND s.kind = 'EXIT'
        JOIN flags xf ON xf.trace_id = u.trace_id AND xf.span_id = u.exit_id
        LEFT JOIN callee c ON c.trace_id = u.trace_id AND c.exit_id = u.exit_id
      ) WHERE rk = 1
    )
    SELECT f.tenant_id, f.trace_id, f.span_id, ae.api_trace_id,
           CAST(CASE WHEN ae.api_trace_id = f.span_id THEN 1 ELSE 0 END AS BIGINT)
               AS api_trace_count,
           CASE WHEN f.kind <> 'EXIT' THEN f.service
                WHEN em.callee_id IS NOT NULL THEN cf.service
                WHEN f.backend_name IS NOT NULL AND f.backend_name <> ''
                     THEN f.backend_name
                ELSE f.service END AS display_entity_name,
           CASE WHEN f.kind = 'ENTRY' THEN f.api_name
                WHEN f.kind = 'EXIT' AND em.callee_id IS NOT NULL THEN cf.api_name
                WHEN f.kind = 'EXIT' AND f.backend_path IS NOT NULL
                     AND f.backend_path <> '' THEN f.backend_path
                ELSE f.op_name END AS display_span_name
    FROM flags f
    LEFT JOIN api_entry ae ON ae.trace_id = f.trace_id AND ae.span_id = f.span_id
    LEFT JOIN exit_map em ON em.trace_id = f.trace_id AND em.mapped_span = f.span_id
    LEFT JOIN flags cf ON cf.trace_id = f.trace_id AND cf.span_id = em.callee_id
    """,
    doc="SpanEventView ancestor-walk columns (SpanEventViewGenerator.java:"
        "77-125, 155-327): api_trace_id via nearest entry-boundary ancestor, "
        "api_trace_count on heads, display names via the exit→callee-entry "
        "map with last-writer-wins HashMap semantics.",
)
def v_span_event_full(spark, sf_dir):
    return tg.span_event_walks(spandom.spans(spark, sf_dir))


@register(
    "v_service_call_view",
    _W + "," + spandom.MEMBERS_SQL + """,
    edges AS (
      SELECT m.tenant_id, m.trace_id, m.span_id AS src_span_id,
             c.span_id AS dst_span_id
      FROM members m
      JOIN flags x ON x.trace_id = m.trace_id AND x.span_id = m.span_id
      JOIN flags c ON c.trace_id = m.trace_id AND c.parent_span_id = m.span_id
                 AND c.is_entry_api
      WHERE x.is_exit_api
    ),
    scen_a AS (
      SELECT e.tenant_id, e.trace_id, 'EDGE' AS scenario,
             e.src_span_id AS client_span_id, e.dst_span_id AS server_span_id,
             s.service AS caller_service, d.service AS callee_service,
             CAST(NULL AS VARCHAR) AS callee_backend,
             CAST(NULL AS VARCHAR) AS request_url,
             CAST(CASE WHEN s.error_count + d.error_count > 0 THEN 1 ELSE 0 END
                  AS BIGINT) AS error_count,
             CAST(s.exception_count + d.exception_count AS BIGINT)
                 AS exception_count,
             d.duration_ms
      FROM edges e
      JOIN flags s ON s.trace_id = e.trace_id AND s.span_id = e.src_span_id
      JOIN flags d ON d.trace_id = e.trace_id AND d.span_id = e.dst_span_id
    ),
    scen_b AS (
      SELECT f.tenant_id, f.trace_id, 'ROOT_ENTRY' AS scenario,
             CAST(NULL AS BIGINT) AS client_span_id, f.span_id AS server_span_id,
             CAST(NULL AS VARCHAR) AS caller_service, f.service AS callee_service,
             CAST(NULL AS VARCHAR) AS callee_backend,
             CAST(NULL AS VARCHAR) AS request_url,
             CAST(CASE WHEN f.error_count > 0 THEN 1 ELSE 0 END AS BIGINT)
                 AS error_count,
             CAST(f.exception_count AS BIGINT) AS exception_count, f.duration_ms
      FROM flags f
      WHERE f.is_entry_api AND NOT EXISTS (
        SELECT 1 FROM edges e
        WHERE e.trace_id = f.trace_id AND e.dst_span_id = f.span_id)
    ),
    scen_c AS (
      SELECT m.tenant_id, m.trace_id, 'BACKEND' AS scenario,
             f.span_id AS client_span_id, CAST(NULL AS BIGINT) AS server_span_id,
             f.service AS caller_service, CAST(NULL AS VARCHAR) AS callee_service,
             f.backend_name AS callee_backend,
             CASE WHEN f.backend_name IS NOT NULL
                  THEN 'http://' || f.backend_name || COALESCE(f.backend_path, '')
             END AS request_url,
             CAST(CASE WHEN f.error_count > 0 THEN 1 ELSE 0 END AS BIGINT)
                 AS error_count,
             CAST(f.exception_count AS BIGINT) AS exception_count, f.duration_ms
      FROM members m
      JOIN flags f ON f.trace_id = m.trace_id AND f.span_id = m.span_id
      WHERE f.is_exit_api AND NOT EXISTS (
        SELECT 1 FROM edges e
        WHERE e.trace_id = m.trace_id AND e.src_span_id = f.span_id)
    ),
    dexits AS (
      SELECT m.tenant_id, m.trace_id, m.span_id
      FROM members m
      JOIN flags h ON h.trace_id = m.trace_id AND h.span_id = m.head_span_id
                 AND NOT h.is_entry_api
      JOIN flags f ON f.trace_id = m.trace_id AND f.span_id = m.span_id
                 AND f.is_exit_api
    ),
    rootwalk AS (
      SELECT tenant_id, trace_id, span_id AS exit_id, span_id AS cur FROM dexits
      UNION ALL
      SELECT r.tenant_id, r.trace_id, r.exit_id, f.parent_span_id
      FROM rootwalk r
      JOIN flags f ON f.trace_id = r.trace_id AND f.span_id = r.cur
      WHERE f.parent_span_id IS NOT NULL AND f.parent_span_id <> -1
    ),
    droots AS (
      SELECT DISTINCT r.tenant_id, r.trace_id, r.cur AS root_id
      FROM rootwalk r
      JOIN flags f ON f.trace_id = r.trace_id AND f.span_id = r.cur
      WHERE f.parent_span_id IS NULL OR f.parent_span_id = -1
    ),
    scen_d AS (
      SELECT d.tenant_id, d.trace_id, 'NON_ENTRY_ROOT' AS scenario,
             CAST(NULL AS BIGINT) AS client_span_id, f.span_id AS server_span_id,
             CAST(NULL AS VARCHAR) AS caller_service, f.service AS callee_service,
             CAST(NULL AS VARCHAR) AS callee_backend,
             CAST(NULL AS VARCHAR) AS request_url,
             CAST(CASE WHEN f.error_count > 0 THEN 1 ELSE 0 END AS BIGINT)
                 AS error_count,
             CAST(f.exception_count AS BIGINT) AS exception_count, f.duration_ms
      FROM droots d
      JOIN flags f ON f.trace_id = d.trace_id AND f.span_id = d.root_id
      WHERE NOT f.has_parent_ref
    )
    SELECT * FROM scen_a
    UNION ALL SELECT * FROM scen_b
    UNION ALL SELECT * FROM scen_c
    UNION ALL SELECT * FROM scen_d
    """,
    doc="ServiceCallView 4-scenario union (ServiceCallViewGenerator.java:"
        "57-88, 233-418): ApiNode edges, root entries, backend exits with "
        "composed request URL, and entry-less nodes walked to distinct real "
        "roots (broken-parent spans excluded).",
)
def v_service_call_edges(spark, sf_dir):
    return tg.service_call_edges(spandom.spans(spark, sf_dir))


@register(
    "v_raw_service_view",
    _W + "," + spandom.MEMBERS_SQL + """,
    txn AS (
      SELECT trace_id, api_name AS transaction_name FROM (
        SELECT trace_id, api_name,
               row_number() OVER (PARTITION BY trace_id ORDER BY ts_ms, span_id) AS rk
        FROM flags WHERE kind = 'ENTRY') WHERE rk = 1
    )
    SELECT f.tenant_id, f.trace_id, f.span_id,
           CASE WHEN f.parent_span_id = -1 THEN NULL
                ELSE f.parent_span_id END AS parent_span_id,
           f.service, f.api_name, f.kind, f.start_ms, f.end_ms, f.duration_ms,
           CAST(f.status_code AS BIGINT) AS status_code,
           CAST(f.error_count AS BIGINT) AS error_count,
           CAST(f.exception_count AS BIGINT) AS exception_count,
           CAST(CASE WHEN f.kind = 'ENTRY' THEN 1 ELSE 0 END AS BIGINT) AS num_calls,
           txn.transaction_name
    FROM members m
    JOIN flags f ON f.trace_id = m.trace_id AND f.span_id = m.span_id
    LEFT JOIN txn ON txn.trace_id = f.trace_id
    WHERE m.node_depth = 0
    """,
    doc="RawServiceView (RawServiceViewGenerator.java:25-105): one row per "
        "ApiNode head span, num_calls=1 iff ENTRY head, transaction name = "
        "earliest ENTRY span's api_name (TransactionNameEnricher.java:24-49).",
)
def v_raw_service_view(spark, sf_dir):
    return tg.raw_service_view(spandom.spans(spark, sf_dir))


@register(
    "e_backend_classify",
    _W + """,
    cand AS (
      SELECT *, kv AS m FROM flags WHERE kind = 'EXIT' AND is_leaf
    ),
    resolved AS (
      SELECT tenant_id, trace_id, span_id, service, m,
        CASE WHEN m % 8 = 0 THEN 'HTTP' WHEN m % 8 = 1 THEN 'HTTPS'
             WHEN m % 8 = 2 THEN 'GRPC' WHEN m % 8 = 3 THEN 'REDIS'
             WHEN m % 8 = 4 THEN 'MONGO' WHEN m % 8 = 5 THEN 'JDBC'
             WHEN m % 8 = 6 THEN 'KAFKA'
             WHEN m % 8 = 7 AND m % 3 = 0 THEN 'RABBIT_MQ' END AS backend_type,
        CASE WHEN m % 8 = 0 THEN
               (CASE WHEN m % 16 = 0 THEN 'svc_0'
                     ELSE 'bh' || CAST(m % 5 AS VARCHAR) || '.example.com' END)
               || (CASE WHEN m % 3 = 1 THEN ':8080' ELSE '' END)
             WHEN m % 8 = 1 THEN
               (CASE WHEN m % 16 = 1 THEN 'svc_1'
                     ELSE 'sh' || CAST(m % 5 AS VARCHAR) || '.example.com' END)
               || (CASE WHEN m % 3 = 1 THEN ':9443' ELSE '' END)
             WHEN m % 8 = 2 THEN
               (CASE WHEN m % 16 = 2 THEN 'svc_2'
                     ELSE 'gh' || CAST(m % 4 AS VARCHAR) END) || ':50051'
             WHEN m % 8 = 3 THEN 'red' || CAST(m % 3 AS VARCHAR) || ':6379'
             WHEN m % 8 = 4 THEN
               CASE WHEN m % 16 = 4 THEN 'mg' || CAST(m % 3 AS VARCHAR) || ':27017'
                    ELSE 'ad' || CAST(m % 3 AS VARCHAR) END
             WHEN m % 8 = 5 THEN 'db' || CAST(m % 3 AS VARCHAR) || ':3306'
             WHEN m % 8 = 6 THEN 'kb' || CAST(m % 3 AS VARCHAR) || ':9092'
             WHEN m % 8 = 7 AND m % 3 = 0 THEN 'rk' || CAST(m % 4 AS VARCHAR)
        END AS backend_uri
      FROM cand
    )
    SELECT r.tenant_id, r.trace_id, r.span_id, r.service,
           r.backend_type, r.backend_uri,
           md5(r.backend_type || ':' || r.backend_uri) AS backend_id
    FROM resolved r
    WHERE r.backend_type IS NOT NULL AND r.backend_uri IS NOT NULL
      AND NOT (r.backend_type IN ('HTTP', 'HTTPS', 'GRPC') AND EXISTS (
        SELECT 1 FROM flags s
        WHERE s.trace_id = r.trace_id
          AND s.service = string_split(r.backend_uri, ':')[1]))
      -- peer-service existence probe: the span's peer.service tag names a
      -- same-trace service -> not a backend (partial-trace guard)
      AND NOT (r.backend_type IN ('HTTP', 'HTTPS', 'GRPC') AND r.m % 9 = 0 AND EXISTS (
        SELECT 1 FROM flags s2
        WHERE s2.trace_id = r.trace_id
          AND s2.service = 'svc_' || CAST(r.m % 3 AS VARCHAR)))
    """,
    doc="E8 backend provider chain (AbstractBackendEntityEnricher.java:"
        "96-197, backend/provider/*.java): leaf-exit candidates, 10-provider "
        "priority cascade with later-provider decoy keys, default-port "
        "stripping for HTTP(S), JDBC authority parsing, and the equal-FQN "
        "service rejection anti-join for HTTP/HTTPS/GRPC; identity = "
        "md5(type:uri).",
)
def e_backend_providers(spark, sf_dir):
    sp = spandom.spans(spark, sf_dir)
    m = F.col("kv")

    def s(c):
        return c.cast("string")

    http_base = F.when(m % 16 == 0, F.lit("svc_0")).otherwise(
        F.concat(F.lit("bh"), s(m % 5), F.lit(".example.com"))
    )
    https_base = F.when(m % 16 == 1, F.lit("svc_1")).otherwise(
        F.concat(F.lit("sh"), s(m % 5), F.lit(".example.com"))
    )
    tagged = sp.withColumn(
        "tags",
        F.map_filter(
            F.create_map(
                F.lit("http.method"), F.when(m % 8 == 0, F.lit("GET")),
                F.lit("http.scheme"), F.when(m % 8 == 1, F.lit("https")),
                F.lit("http.host"),
                F.when(
                    m % 8 == 0,
                    F.concat(
                        http_base,
                        F.when(m % 3 == 0, ":80").when(m % 3 == 1, ":8080").otherwise(""),
                    ),
                ).when(
                    m % 8 == 1,
                    F.concat(
                        https_base,
                        F.when(m % 3 == 0, ":443").when(m % 3 == 1, ":9443").otherwise(""),
                    ),
                ),
                F.lit("rpc.system"), F.when(m % 8 == 2, F.lit("grpc")),
                F.lit("grpc.host_port"),
                F.when(
                    m % 8 == 2,
                    F.concat(
                        F.when(m % 16 == 2, F.lit("svc_2")).otherwise(
                            F.concat(F.lit("gh"), s(m % 4))
                        ),
                        F.lit(":50051"),
                    ),
                ),
                F.lit("db.system"),
                F.when(m % 8 == 3, F.lit("redis"))
                .when((m % 8 == 4) & (m % 16 != 4), F.lit("mongodb"))
                .when(m % 8 == 5, F.lit("mysql")),
                F.lit("redis.connection"),
                F.when(m % 8 == 3, F.concat(F.lit("red"), s(m % 3), F.lit(":6379"))),
                F.lit("mongo.url"),
                F.when(m % 16 == 4, F.concat(F.lit("mg"), s(m % 3), F.lit(":27017"))),
                F.lit("address"),
                F.when((m % 8 == 4) & (m % 16 != 4), F.concat(F.lit("ad"), s(m % 3))),
                # later-provider decoys: redis rows also carry a jdbc url,
                # mongo rows a kafka system -- the earlier provider must win
                F.lit("sql.url"),
                F.when(
                    (m % 8 == 5) | (m % 8 == 3),
                    F.concat(F.lit("jdbc:mysql://db"), s(m % 3), F.lit(":3306/shop")),
                ),
                F.lit("messaging.system"),
                F.when((m % 8 == 6) | ((m % 8 == 4) & (m % 2 == 0)), F.lit("kafka")).when(
                    (m % 8 == 7) & (m % 3 == 0), F.lit("rabbitmq")
                ),
                F.lit("messaging.url"),
                F.when(m % 8 == 6, F.concat(F.lit("kb"), s(m % 3), F.lit(":9092"))),
                F.lit("messaging.rabbitmq.routing_key"),
                F.when((m % 8 == 7) & (m % 3 == 0), F.concat(F.lit("rk"), s(m % 4))),
                # peer-service probe: HTTP/HTTPS/GRPC rows sometimes carry a
                # peer.service naming a service that may exist in the trace
                F.lit("peer.service"),
                F.when(
                    ((m % 8 == 0) | (m % 8 == 1) | (m % 8 == 2)) & (m % 9 == 0),
                    F.concat(F.lit("svc_"), s(m % 3)),
                ),
            ),
            lambda k, v: v.isNotNull(),
        ),
    )
    return be.resolve_backends(tagged, "tags")


@register(
    "g_peer_correlation",
    _W + """,
    net AS (
      SELECT f.*, 'env_' || CAST(kv % 2 AS VARCHAR) AS env,
        CASE WHEN kind = 'EXIT' AND kv % 5 <> 0 THEN 'h' || CAST(kv % 6 AS VARCHAR)
             WHEN kind = 'ENTRY' THEN 'p' || CAST(kv % 6 AS VARCHAR) END AS host_addr,
        CASE WHEN kind = 'EXIT' THEN 'p' || CAST(kv % 6 AS VARCHAR)
             WHEN kind = 'ENTRY' AND kv % 7 <> 0
                  THEN 'h' || CAST(kv % 6 AS VARCHAR) END AS peer_addr,
        CAST(8000 + kv % 3 AS BIGINT) AS peer_port
      FROM flags f
    ),
    cl AS (
      SELECT tenant_id, env, host_addr, peer_addr, peer_port,
             arg_max(service, span_id) AS peer_service
      FROM net
      WHERE kind = 'EXIT' AND host_addr IS NOT NULL AND peer_addr IS NOT NULL
      GROUP BY 1, 2, 3, 4, 5
    )
    SELECT s.tenant_id, s.trace_id, s.span_id, s.service, cl.peer_service
    FROM net s
    LEFT JOIN cl ON cl.tenant_id = s.tenant_id AND cl.env = s.env
                AND cl.host_addr = s.peer_addr AND cl.peer_addr = s.host_addr
                AND cl.peer_port = s.peer_port
    WHERE s.kind = 'ENTRY' AND s.host_addr IS NOT NULL AND s.peer_addr IS NOT NULL
    """,
    doc="G4 peer-service correlation on the composite IP tuple "
        "(RawSpansProcessor.java:249-333): client spans publish "
        "(tenant, env, host, peer, port) -> service; server spans look up "
        "with swapped addresses; null tuple members are invalid "
        "(IpIdentityValidator); last-writer state-store put resolved "
        "deterministically as max span_id.",
)
def g_peer_ip_correlation(spark, sf_dir):
    from .operators import group as grp

    sp = spandom.spans(spark, sf_dir)
    m = F.col("kv")
    s = lambda c: c.cast("string")  # noqa: E731
    net = (
        sp.withColumn("env", F.concat(F.lit("env_"), s(m % 2)))
        .withColumn(
            "host_addr",
            F.when(
                (F.col("kind") == "EXIT") & (m % 5 != 0), F.concat(F.lit("h"), s(m % 6))
            ).when(F.col("kind") == "ENTRY", F.concat(F.lit("p"), s(m % 6))),
        )
        .withColumn(
            "peer_addr",
            F.when(F.col("kind") == "EXIT", F.concat(F.lit("p"), s(m % 6))).when(
                (F.col("kind") == "ENTRY") & (m % 7 != 0), F.concat(F.lit("h"), s(m % 6))
            ),
        )
        .withColumn("peer_port", (F.lit(8000) + m % 3).cast("long"))
    )
    return grp.peer_ip_correlation(net)


@register(
    "g_latency_sample",
    _W + """
    SELECT tenant_id, trace_id,
           max(end_ms) - min(start_ms) AS e2e_latency_ms,
           CAST(count(*) AS BIGINT) AS n_spans
    FROM flags
    GROUP BY tenant_id, trace_id
    HAVING substr(md5(CAST(tenant_id AS VARCHAR) || ':'
                      || CAST(trace_id AS VARCHAR)), 1, 1) IN ('0','1','2','3')
    """,
    doc="G6 dataflow latency sampling (TraceLatencyMeter.java): per sampled "
        "trace, first-span-start to last-span-end latency; deterministic "
        "md5-digit sampling (4/16 = 25% expected rate) replaces the "
        "reference's Math.random().",
)
def g_latency_sample(spark, sf_dir):
    from .operators import group as grp

    return grp.latency_samples(spandom.spans(spark, sf_dir))


@register(
    "e_entity_span",
    _W + """,
    sp_env AS (
      SELECT trace_id, span_id, tenant_id, kv, service,
             'env_' || CAST(kv % 3 AS VARCHAR) AS env_val,
             CASE WHEN kv % 2 = 0 THEN 'team_' || CAST(kv % 4 AS VARCHAR) END AS team_val
      FROM flags
    ),
    vals AS (
      SELECT trace_id, env_val AS v FROM sp_env
      UNION ALL
      SELECT trace_id, team_val FROM sp_env
      WHERE team_val IS NOT NULL AND tenant_id <= 2
    ),
    tr AS (
      SELECT trace_id, string_agg(DISTINCT v, ',' ORDER BY v) AS trace_spaces
      FROM vals GROUP BY trace_id
    )
    SELECT e.tenant_id, e.trace_id, e.span_id, e.service,
           CASE WHEN e.kv % 4 <> 3
                THEN 'ent_' || CAST(e.tenant_id AS VARCHAR) || '_' || e.service
           END AS entity_id,
           CASE WHEN e.kv % 4 <> 3 THEN 'SERVICE' END AS entity_type,
           CASE WHEN e.kv % 4 <> 3
                THEN 'rel_' || CAST(e.tenant_id AS VARCHAR) || ',rel_a'
           END AS related_kv,
           CASE WHEN e.tenant_id <= 2 AND e.kv % 2 = 0
                THEN e.env_val || ',' || e.team_val
                ELSE e.env_val END AS span_spaces,
           tr.trace_spaces
    FROM sp_env e JOIN tr ON tr.trace_id = e.trace_id
    """,
    doc="E12+E11 — EntitySpanEnricher (enrichers/EntitySpanEnricher.java): "
        "broadcast entity-relationship lookup on (tenant, service), spans "
        "of unregistered services (svc_3 here) keep NULL entity columns; "
        "fused with space enrichment (SpaceEnricher.java:40-66): per-span "
        "space ids from the tenant's rule-selected attribute keys (rules "
        "broadcast per tenant, missing/empty values filtered), trace space "
        "ids = distinct union over the trace. The two enrichers run in one "
        "pass over the span frame exactly as the reference chains them in "
        "its enricher registry; arrays emitted sorted for "
        "engine-independent comparison.",
)
def e_entity_span(spark, sf_dir):
    from .operators import enrich as en

    sp = spandom.spans(spark, sf_dir)
    m = F.col("kv")
    tagged = sp.withColumn(
        "tags",
        F.map_filter(
            F.create_map(
                F.lit("space.env"),
                F.concat(F.lit("env_"), (m % 3).cast("string")),
                F.lit("space.team"),
                F.when(m % 2 == 0, F.concat(F.lit("team_"), (m % 4).cast("string"))),
            ),
            lambda k, v: v.isNotNull(),
        ),
    )
    # entity registry: every (tenant, service) except svc_3 (kv%4==3 rows
    # are exactly the svc_3 rows since service = 'svc_' || kv%4)
    entities = spark.createDataFrame(
        [
            (t, f"svc_{s}", f"ent_{t}_svc_{s}", "SERVICE", [f"rel_{t}", "rel_a"])
            for t in range(5)
            for s in range(4)
            if s != 3
        ],
        "tenant_id long, service string, entity_id string, entity_type string, "
        "related_entity_ids array<string>",
    )
    rules = spark.createDataFrame(
        [(t, 0, "space.env") for t in range(5)]
        + [(t, 1, "space.team") for t in range(3)]
        + [(t, 1, "space.missing") for t in (3, 4)],
        "tenant_id long, rule_order int, attr_key string",
    )
    ent = en.entity_span_enrich(tagged, entities)
    spc = en.space_ids(tagged, rules).select(
        "trace_id", "span_id", "span_space_ids", "trace_space_ids"
    )
    out = ent.join(spc, on=["trace_id", "span_id"])
    return out.select(
        "tenant_id", "trace_id", "span_id", "service", "entity_id", "entity_type",
        F.when(
            F.col("related_entity_ids").isNotNull(),
            F.concat_ws(",", F.col("related_entity_ids")),
        ).alias("related_kv"),
        F.concat_ws(",", F.col("span_space_ids")).alias("span_spaces"),
        F.concat_ws(",", F.col("trace_space_ids")).alias("trace_spaces"),
    )
