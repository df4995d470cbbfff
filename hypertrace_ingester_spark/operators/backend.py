"""Backend entity resolution — the reference's provider chain re-expressed
as one priority CASE cascade + an FQN-rejection join.

Reference semantics (hypertrace-trace-enricher/.../enrichers/backend/):

- Candidates are **leaf EXIT spans** only
  (AbstractBackendEntityEnricher.java:96-115).
- Providers are tried in a fixed order and the first whose
  ``isValidBackend`` matches wins (BackendEntityEnricher.java:38-51):
  HTTP, GRPC, REDIS, MONGO, JDBC, CASSANDRA, ELASTICSEARCH, RABBIT_MQ,
  KAFKA, SQS, CLIENT_SPAN_ENDPOINT.
- Validity checks (provider/*.java + semantic-convention-utils
  DbSemanticConventionUtils.java:354-394, MessagingSemanticConventionUtils):
  HTTP/GRPC by the enriched protocol; REDIS by redis.connection /
  db.system=redis; MONGO by mongo.url / address / db.system=mongodb;
  JDBC by sql.url + jdbc-ish db.system; CASSANDRA / ELASTICSEARCH by
  db.system; RABBIT_MQ by routing key / messaging.system; KAFKA / SQS by
  messaging.system.
- URIs: http.host with the protocol's default port stripped
  (HttpBackendProvider.java:47-60), grpc.host_port, redis.connection,
  mongo url/address, JDBC authority parsed out of the jdbc: URL
  (JdbcBackendProvider.java:54-75), messaging url / routing key,
  net.peer.name[:port] for the rest.
- **Equal-FQN service rejection** — HTTP/HTTPS/GRPC candidates whose host
  equals a service name present in the same trace are NOT backends
  (AbstractBackendEntityEnricher.java:133-171). Other types are always
  valid. Round 3 adds the **peer-service existence probe** (:164-170):
  the span's OpenTracing ``peer.service`` tag is checked against the same
  service set — rejecting backends of partial traces whose immediate
  child span is missing (service registry analog is trace-local;
  documented divergence from the entity-service cache).
- Identity: deterministic ``md5(type:uri)`` instead of the entity-service
  upsert (SURVEY §2.4 E8 mapping).

Scale shape: the cascade is a single codegen'd projection over the
candidate spans; the rejection is one hash join against the per-trace
distinct service dim keyed (trace_id, service) — co-partitioned with every
other trace-keyed stage, AQE picks broadcast when the dim is small.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from . import fieldgen as fg

SQL_DB_SYSTEMS = [
    "mysql", "postgresql", "mssql", "oracle", "db2", "other_sql",
    "hsqldb", "redshift", "hive", "cloudspace",
]


def _tag(t: Column, key: str) -> Column:
    return F.element_at(t, key)


def resolve_backends(spans: DataFrame, tags_col: str = "tags") -> DataFrame:
    """Leaf-exit spans → (backend_type, backend_uri, backend_id) rows;
    FQN-rejected and unresolved candidates are dropped."""
    t = F.col(tags_col)
    cand = spans.filter((F.col("kind") == "EXIT") & F.col("is_leaf"))

    protocol = fg.protocol_from_tags(t)
    db_system = _tag(t, "db.system")
    messaging = _tag(t, "messaging.system")

    http_valid = protocol.isin("HTTP", "HTTPS")
    grpc_valid = protocol == "GRPC"
    redis_valid = _tag(t, "redis.connection").isNotNull() | (db_system == "redis")
    mongo_valid = (
        _tag(t, "mongo.url").isNotNull()
        | _tag(t, "address").isNotNull()
        | (db_system == "mongodb")
    )
    jdbc_valid = _tag(t, "sql.url").isNotNull() | db_system.isin(*SQL_DB_SYSTEMS)
    cassandra_valid = db_system == "cassandra"
    elastic_valid = db_system == "elasticsearch"
    rabbit_valid = (
        _tag(t, "messaging.rabbitmq.routing_key").isNotNull() | (messaging == "rabbitmq")
    )
    kafka_valid = messaging == "kafka"
    sqs_valid = messaging == "sqs"

    btype = (
        F.when(http_valid, protocol)  # HTTP or HTTPS
        .when(grpc_valid, "GRPC")
        .when(redis_valid, "REDIS")
        .when(mongo_valid, "MONGO")
        .when(jdbc_valid, "JDBC")
        .when(cassandra_valid, "CASSANDRA")
        .when(elastic_valid, "ELASTICSEARCH")
        .when(rabbit_valid, "RABBIT_MQ")
        .when(kafka_valid, "KAFKA")
        .when(sqs_valid, "SQS")
    )

    # HTTP: strip the protocol's default port (HttpBackendProvider.java:47-60)
    http_host = _tag(t, "http.host")
    host_part = F.get(F.split(http_host, ":"), 0)
    port_part = F.get(F.split(http_host, ":"), 1)  # NULL when no port
    default_port = F.when(protocol == "HTTPS", "443").otherwise("80")
    http_uri = F.when(
        port_part.isNull() | (port_part == default_port), host_part
    ).otherwise(http_host)

    # JDBC: authority out of "jdbc:mysql://host:port/db"
    jdbc_uri = F.regexp_extract(_tag(t, "sql.url"), r"://([^/]+)", 1)

    peer_uri = F.when(
        _tag(t, "net.peer.name").isNotNull(),
        F.concat_ws(":", _tag(t, "net.peer.name"), _tag(t, "net.peer.port")),
    )

    uri = (
        F.when(http_valid, http_uri)
        .when(grpc_valid, F.coalesce(_tag(t, "grpc.host_port"), peer_uri))
        .when(redis_valid, F.coalesce(_tag(t, "redis.connection"), peer_uri))
        .when(mongo_valid, F.coalesce(_tag(t, "mongo.url"), _tag(t, "address"), peer_uri))
        .when(jdbc_valid, F.when(jdbc_uri != "", jdbc_uri).otherwise(peer_uri))
        .when(rabbit_valid, _tag(t, "messaging.rabbitmq.routing_key"))
        .when(kafka_valid | sqs_valid, F.coalesce(_tag(t, "messaging.url"), peer_uri))
        .otherwise(peer_uri)  # cassandra / elasticsearch
    )

    resolved = cand.select(
        "tenant_id", "trace_id", "span_id", "service",
        btype.alias("backend_type"), uri.alias("backend_uri"),
        # peer-service probe input (SpanSemanticConventionUtils.java:149-154:
        # the OpenTracing `peer.service` tag)
        _tag(t, "peer.service").alias("peer_service_name"),
    ).filter(F.col("backend_type").isNotNull() & F.col("backend_uri").isNotNull())

    # FQN rejection: HTTP/HTTPS/GRPC whose host matches a same-trace service
    # (trace ids are only unique per tenant — key the dim on both); the
    # peer-service probe (AbstractBackendEntityEnricher.java:164-170) is the
    # same existence check on the span's peer.service tag — it catches
    # partial traces where the immediate child span is missing but the peer
    # is a known service. The service registry analog here is trace-local
    # (documented divergence: the reference probes the entity-service cache).
    services = spans.select(
        F.col("tenant_id").alias("s_tenant_id"),
        F.col("trace_id").alias("s_trace_id"),
        F.col("service").alias("s_service"),
    ).distinct()
    host = F.get(F.split(F.col("backend_uri"), ":"), 0)
    joined = resolved.withColumn("b_host", host).join(
        services,
        (F.col("tenant_id") == F.col("s_tenant_id"))
        & (F.col("trace_id") == F.col("s_trace_id"))
        & (F.col("b_host") == F.col("s_service")),
        "left",
    )
    peers = services.select(
        F.col("s_tenant_id").alias("p_tenant_id"),
        F.col("s_trace_id").alias("p_trace_id"),
        F.col("s_service").alias("p_service"),
    )
    joined = joined.join(
        peers,
        (F.col("tenant_id") == F.col("p_tenant_id"))
        & (F.col("trace_id") == F.col("p_trace_id"))
        & (F.col("peer_service_name") == F.col("p_service")),
        "left",
    )
    kept = joined.filter(
        ~F.col("backend_type").isin("HTTP", "HTTPS", "GRPC")
        | (F.col("s_service").isNull() & F.col("p_service").isNull())
    )
    return kept.select(
        "tenant_id", "trace_id", "span_id", "service",
        "backend_type", "backend_uri",
        F.md5(F.concat_ws(":", F.col("backend_type"), F.col("backend_uri"))).alias(
            "backend_id"
        ),
    )
