"""Protocol field generators — full HTTP/GRPC/SQL tag-extraction tables.

Faithful re-expression of the reference's span-normalizer field generators
over a ``map<string,string>`` tags column, entirely in JVM column
expressions (coalesce chains over ``element_at``, ``map_filter`` prefix
explosion, regexp URL part extraction — no Python in the hot path).

Key tables come from the reference's raw-span constants
(span-normalizer/raw-span-constants/.../span_attribute.proto,
envoy_attributes.proto, opencensus.proto, opentracing.proto) and OTel
semantic-convention constants (span-normalizer-constants/.../
OTelHttpSemanticConventions.java etc.); the priority orders and guard
predicates mirror:

- HTTP:  span-normalizer/.../fieldgenerators/HttpFieldsGenerator.java:84-130
  (alias priority lists), :439-572 (guards/fallbacks), :587-612
  (populateUrlParts), :135-216 (header/param/cookie prefix explosion; exact
  fieldGeneratorMap keys win over prefixes — FieldsGenerator.java:69-105);
  URL validity semantics from
  semantic-convention-utils/.../HttpSemanticConventionUtils.java:417-444
  (isValidUrl accepts relative; only absolute URLs survive in the url
  field, but path/query are still derived from a relative url tag).
- GRPC/RPC: GrpcFieldsGenerator.java:46-341 (status-code priority from
  RpcSemanticConventionUtils.java:88-95, size fallback chain :256-323,
  ``Metadata(k=v,...)`` parsing :342-363), RpcFieldsGenerator.java:1-124.
- SQL:  SqlFieldsGenerator.java:23-74.
- Span-kind alias cascade + protocol detection:
  hypertrace-trace-enricher/.../SpanTypeAttributeEnricher.java:88-179
  (otel span_kind → OC span.kind → Client flag → envoy operationname →
  Sent./Recv. name prefix), :181-276 (grpc-by-prefix scan, http scheme).

Round 3 closed the two previously-documented simplifications: the OTel
client/server-span net.peer URL reconstruction
(HttpSemanticConventionUtils.java:287-318, getHttpUrlForOTelFormat's full
branch ladder) and the db-semantic destination URI with the JDBC
connection-string walk (DbSemanticConventionUtils.getSqlURI:212-231) are
both implemented and oracle-gated via p_http_fields / p_sql_fields.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Literal key tables (string_value entries of the constants protos)
# ---------------------------------------------------------------------------

HTTP_URL_KEYS = ["http.url", "http.request.url", "url"]  # + otel dup "http.url"
HTTP_METHOD_KEYS = ["http.request.method", "http.method"]  # + otel dup
HTTP_USER_AGENT_KEYS = [
    "user.agent", "user_agent", "user-agent",
    "http.request.header.user-agent", "http.user_agent",  # + otel dup
]
HTTP_PATH_KEYS = ["http.request.path", "http.path", "http.target"]
HTTP_REQUEST_SIZE_KEYS = [
    "request_size", "http.request.size",
    "http.request_content_length", "http.request.header.content-length",
]
HTTP_RESPONSE_SIZE_KEYS = [
    "response_size", "http.response.size",
    "http.response_content_length", "http.response.header.content-length",
]
HTTP_STATUS_CODE_KEYS = ["http.status_code", "http.response.status_code"]  # + otel dup

GRPC_STATUS_CODE_KEYS = [  # RpcSemanticConventionUtils.ALL_GRPC_STATUS_CODES
    "rpc.grpc.status_code", "status.code", "grpc.status_code",
    "rpc.status_code", "census.status_code",
]
GRPC_STATUS_MESSAGE_KEYS = ["status.message", "grpc.message"]
GRPC_METHOD_KEYS = ["grpc.method", "rpc.method"]

SQL_QUERY_KEYS = ["sql.query", "db.statement"]
SQL_DB_TYPE_KEYS = ["sql.db_type", "db.system"]

# Declared header keys that the exact-key generator map claims before the
# request-header prefix handler sees them (FieldsGenerator.java:75-82).
DECLARED_REQUEST_HEADER_KEYS = [
    "http.request.header.host", "http.request.header.:authority",
    "http.request.header.content-type", "http.request.header.:path",
    "http.request.header.x-forwarded-for", "http.request.header.cookie",
    "http.request.header.user-agent", "http.request.header.content-length",
]
DECLARED_RESPONSE_HEADER_KEYS = [
    "http.response.header.content-type", "http.response.header.set-cookie",
    "http.response.header.content-length",
]


def _first_key(tags: Column, keys: list[str], valid=None) -> Column:
    """FirstMatchingKeyFinder.java:11-44 — first non-null (and valid)
    value over the priority key list, as one coalesce chain."""
    cols = []
    for k in keys:
        v = F.element_at(tags, k)
        if valid is not None:
            v = F.when(valid(v), v)
        cols.append(v)
    return F.coalesce(*cols)


def _non_blank(v: Column) -> Column:
    return v.isNotNull() & (F.trim(v) != "")


_ABS_URL_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://"


def _is_absolute(u: Column) -> Column:
    return u.rlike(_ABS_URL_RE)


def _url_authority(u: Column) -> Column:
    return F.regexp_extract(u, _ABS_URL_RE + r"([^/?#]*)", 1)


def _url_protocol(u: Column) -> Column:
    return F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.\-]*)://", 1)


def _url_path(u: Column) -> Column:
    """Path component of an absolute OR relative URL string (query/fragment
    stripped), '' when absent."""
    return F.when(
        _is_absolute(u), F.regexp_extract(u, _ABS_URL_RE + r"[^/?#]*([^?#]*)", 1)
    ).otherwise(F.regexp_extract(u, r"^([^?#]*)", 1))


def _url_query(u: Column) -> Column:
    q = F.regexp_extract(u, r"\?([^#]*)", 1)
    return F.when(u.contains("?"), q)


def _strip_trailing_slash(p: Column) -> Column:
    """HttpFieldsGenerator.removeTrailingSlash: strip unless it's just '/'."""
    return F.when(
        p.endswith("/") & (F.length(p) > 1), p.substr(F.lit(1), F.length(p) - 1)
    ).otherwise(p)


def http_fields(df: DataFrame, tags_col: str = "tags", prefix: str = "http_") -> DataFrame:
    """Extract the full HTTP request/response field set from a tags map."""
    t = F.col(tags_col)

    method = _first_key(t, HTTP_METHOD_KEYS, _non_blank)
    user_agent = _first_key(t, HTTP_USER_AGENT_KEYS)

    # URL: relative values pass the validity gate (isValidUrl) but only
    # absolute ones survive as the url field; parts still derive from
    # relative ones (HttpFieldsGenerator.java:587-612).
    url_raw = _first_key(t, HTTP_URL_KEYS, _non_blank)
    scheme_tag = F.element_at(t, "http.scheme")
    host_tag = F.element_at(t, "http.host")
    target_tag = F.element_at(t, "http.target")
    # getHttpUrlForOTelFormat (HttpSemanticConventionUtils.java:287-318):
    # absolute http.url > scheme+host+target > CLIENT-span net.peer
    # reconstruction > SERVER-span server_name/net.host reconstruction >
    # relative http.url fallback. Client/server detection follows
    # SpanSemanticConventionUtils.java:105-147 — the otel `span_kind` key,
    # when PRESENT, decides alone (equalsIgnoreCase); only otherwise does
    # the OC `span.kind` key get a vote.
    otel_kind, oc_kind = F.element_at(t, "span_kind"), F.element_at(t, "span.kind")
    eff_kind = F.lower(F.when(otel_kind.isNotNull(), otel_kind).otherwise(oc_kind))
    peer_host = F.coalesce(  # net.peer.name > net.sock.peer.addr > net.peer.ip
        F.element_at(t, "net.peer.name"),
        F.element_at(t, "net.sock.peer.addr"),
        F.element_at(t, "net.peer.ip"),
    )
    peer_port = F.element_at(t, "net.peer.port")
    server_host = F.coalesce(  # http.server_name > net.host.name
        F.element_at(t, "http.server_name"), F.element_at(t, "net.host.name")
    )
    host_port = F.element_at(t, "net.host.port")

    def _built(h, port):  # buildUrl: scheme://host[:port]target
        return F.concat(
            scheme_tag,
            F.lit("://"),
            h,
            F.when(port.isNotNull(), F.concat(F.lit(":"), port)).otherwise(F.lit("")),
            target_tag,
        )

    composed = F.when(
        scheme_tag.isNotNull() & host_tag.isNotNull() & target_tag.isNotNull(),
        F.concat(scheme_tag, F.lit("://"), host_tag, target_tag),
    ).when(
        (eff_kind == "client")
        & scheme_tag.isNotNull() & target_tag.isNotNull() & peer_host.isNotNull(),
        _built(peer_host, peer_port),
    ).when(
        (eff_kind == "server")
        & scheme_tag.isNotNull() & target_tag.isNotNull() & server_host.isNotNull(),
        _built(server_host, host_port),
    )
    url_eff_expr = F.when(
        url_raw.isNotNull() & _is_absolute(url_raw), url_raw
    ).otherwise(F.coalesce(composed, url_raw))
    # Stage the effective/absolute URL as real projected columns: six
    # downstream expressions (url, scheme, host, path ×2, query) reference
    # them, and inlined they'd each carry a copy of the whole net.peer
    # ladder + validity regex — Catalyst's CollapseProject keeps a
    # non-cheap expression staged when it's referenced more than once, so
    # this makes the sharing explicit instead of relying on codegen
    # subexpression elimination (which the >8KB-method fallback can lose).
    df = df.select(
        "*", url_eff_expr.alias("_ht_url_eff")
    )
    url_eff = F.col("_ht_url_eff")
    df = df.select(
        "*",
        F.when(url_eff.isNotNull() & _is_absolute(url_eff), url_eff).alias(
            "_ht_url_final"
        ),
    )
    url_final = F.col("_ht_url_final")

    # Path: priority keys (must start with '/'), normalized (query stripped,
    # trailing slash removed); else derived from the url value.
    path_attr = _first_key(
        t, HTTP_PATH_KEYS, lambda v: _non_blank(v) & v.startswith("/")
    )
    path_from_attr = _strip_trailing_slash(_url_path(path_attr))
    url_path = _url_path(url_eff)
    path_from_url = _strip_trailing_slash(
        F.when(F.trim(url_path) == "", F.lit("/")).otherwise(url_path)
    )
    path = F.coalesce(path_from_attr, F.when(url_eff.isNotNull(), path_from_url))

    query = F.coalesce(
        F.element_at(t, "http.request.query_string"),
        F.when(url_eff.isNotNull(), _url_query(url_eff)),
    )
    scheme = F.when(url_final.isNotNull(), _url_protocol(url_final)).otherwise(scheme_tag)
    host = F.when(url_final.isNotNull(), _url_authority(url_final)).otherwise(host_tag)

    # Sizes: alias chain, then body-length fallback unless truncated
    # (HttpFieldsGenerator.java:510-562).
    def size(keys, body_key, trunc_key):
        chain = _first_key(t, keys).cast("long")
        body = F.element_at(t, body_key)
        truncated = F.lower(F.coalesce(F.element_at(t, trunc_key), F.lit("false"))) == "true"
        return F.coalesce(chain, F.when(body.isNotNull() & ~truncated, F.length(body).cast("long")))

    request_size = size(HTTP_REQUEST_SIZE_KEYS, "http.request.body", "http.request.body.truncated")
    response_size = size(
        HTTP_RESPONSE_SIZE_KEYS, "http.response.body", "http.response.body.truncated"
    )

    status_code = _first_key(t, HTTP_STATUS_CODE_KEYS).cast("long")
    status_message = F.element_at(t, "http.response.status_message")

    # Prefix explosion: exact generator-map keys win over the prefix
    # handlers (FieldsGenerator.java:75-105), so declared headers are
    # excluded from the "other headers" maps.
    def prefix_map(pfx: str, declared: list[str]) -> Column:
        def pred(k, v):
            cond = k.startswith(pfx) & (F.length(k) > len(pfx))
            if declared:
                cond = cond & ~k.isin(*declared)
            return cond

        sub = F.map_filter(t, pred)
        return F.transform_keys(sub, lambda k, v: F.substring(k, len(pfx) + 1, 10_000))

    request_headers = prefix_map("http.request.header.", DECLARED_REQUEST_HEADER_KEYS)
    response_headers = prefix_map("http.response.header.", DECLARED_RESPONSE_HEADER_KEYS)
    request_params = prefix_map("http.request.param.", [])
    # cookies become "key=value" entries (handleRequestCookie :188-208)
    def cookie_list(pfx: str) -> Column:
        sub = F.map_filter(t, lambda k, v: k.startswith(pfx) & (F.length(k) > len(pfx)))
        return F.array_sort(
            F.transform(
                F.map_entries(sub),
                lambda e: F.concat(
                    F.substring(e["key"], len(pfx) + 1, 10_000), F.lit("="), e["value"]
                ),
            )
        )

    p = prefix
    return df.select(
        "*",
        method.alias(p + "method"),
        url_final.alias(p + "url"),
        scheme.alias(p + "scheme"),
        host.alias(p + "host"),
        path.alias(p + "path"),
        query.alias(p + "query"),
        user_agent.alias(p + "user_agent"),
        request_size.alias(p + "request_size"),
        response_size.alias(p + "response_size"),
        status_code.alias(p + "status_code"),
        status_message.alias(p + "status_message"),
        request_headers.alias(p + "request_headers"),
        response_headers.alias(p + "response_headers"),
        request_params.alias(p + "request_params"),
        cookie_list("http.request.cookie.").alias(p + "request_cookies"),
        cookie_list("http.response.cookie.").alias(p + "response_cookies"),
    ).drop("_ht_url_eff", "_ht_url_final")


def grpc_fields(df: DataFrame, tags_col: str = "tags", prefix: str = "grpc_") -> DataFrame:
    """GRPC/RPC field extraction (GrpcFieldsGenerator.java:46-341,
    RpcFieldsGenerator.java)."""
    t = F.col(tags_col)

    status_code = _first_key(t, GRPC_STATUS_CODE_KEYS).cast("long")
    status_message = _first_key(t, GRPC_STATUS_MESSAGE_KEYS)
    method = _first_key(t, GRPC_METHOD_KEYS)
    host_port = F.element_at(t, "grpc.host_port")
    error_name = F.coalesce(F.element_at(t, "grpc.error_name"), F.element_at(t, "rpc.error_name"))
    error_message = F.coalesce(
        F.element_at(t, "grpc.error_message"), F.element_at(t, "rpc.error_message")
    )

    # Size fallback chain (GrpcFieldsGenerator.java:256-323): envoy size →
    # rpc metadata content-length → grpc body length (unless truncated) →
    # rpc body length (unless truncated).
    def size(envoy_key, meta_key, grpc_body, grpc_trunc, rpc_body, rpc_trunc):
        def body_len(body_key, trunc_key):
            body = F.element_at(t, body_key)
            truncated = (
                F.lower(F.coalesce(F.element_at(t, trunc_key), F.lit("false"))) == "true"
            )
            return F.when(body.isNotNull() & ~truncated, F.length(body).cast("long"))

        return F.coalesce(
            F.element_at(t, envoy_key).cast("long"),
            F.element_at(t, meta_key).cast("long"),
            body_len(grpc_body, grpc_trunc),
            body_len(rpc_body, rpc_trunc),
        )

    request_size = size(
        "request_size", "rpc.request.metadata.content-length",
        "grpc.request.body", "grpc.request.body.truncated",
        "rpc.request.body", "rpc.request.body.truncated",
    )
    response_size = size(
        "response_size", "rpc.response.metadata.content-length",
        "grpc.response.body", "grpc.response.body.truncated",
        "rpc.response.body", "rpc.response.body.truncated",
    )

    # "Metadata(k=v,k2=v2)" → map (parseMetadataString :342-363); entries
    # without exactly one '=' are dropped.
    def metadata_map(key: str) -> Column:
        raw = F.element_at(t, key)
        inner = F.when(
            raw.isNotNull() & raw.startswith("Metadata(") & raw.endswith(")"),
            raw.substr(F.lit(10), F.length(raw) - 10),
        )
        m = F.str_to_map(inner, F.lit(","), F.lit("="))
        # parseMetadataString drops entries without exactly one '=' (:356):
        # str_to_map splits on the FIRST '=', so 'k=v=w' leaves '=' in the
        # value and 'k=' leaves '' — both rejected here; bare 'k' maps to
        # null and is rejected too.
        return F.map_filter(
            m, lambda k, v: v.isNotNull() & (k != "") & (v != "") & ~v.contains("=")
        )

    p = prefix
    body = F.coalesce(F.element_at(t, "grpc.request.body"), F.element_at(t, "rpc.request.body"))
    response_body = F.coalesce(
        F.element_at(t, "grpc.response.body"), F.element_at(t, "rpc.response.body")
    )
    return df.select(
        "*",
        status_code.alias(p + "status_code"),
        status_message.alias(p + "status_message"),
        method.alias(p + "method"),
        host_port.alias(p + "host_port"),
        error_name.alias(p + "error_name"),
        error_message.alias(p + "error_message"),
        request_size.alias(p + "request_size"),
        response_size.alias(p + "response_size"),
        body.alias(p + "request_body"),
        response_body.alias(p + "response_body"),
        metadata_map("grpc.request.metadata").alias(p + "request_metadata"),
        metadata_map("grpc.response.metadata").alias(p + "response_metadata"),
    )


# db.system values the reference treats as SQL backends
# (DbSemanticConventionUtils.java:81-92, OTelDbSemanticConventions)
OTEL_SQL_DB_SYSTEMS = [
    "mysql", "oracle", "mssql", "db2", "postgresql", "redshift",
    "hive", "cloudscape", "hsqldb", "other_sql",
]


def sql_uri(tags: Column) -> Column:
    """DbSemanticConventionUtils.getSqlURI (:212-231) over a tags map:
    for spans whose ``db.system`` is a SQL system, the destination URI is
    sql.url > a valid ``db.connection_string`` > the OTel net.peer URI
    (net.peer.name > net.sock.peer.addr > net.peer.ip, with optional
    :net.peer.port — SpanSemanticConventionUtils.java:37-55), prefixed
    ``jdbc://`` when it carries no scheme. Validity approximates
    java.net.URI: non-blank, no whitespace. (The eventName-prefix branch
    of isSqlBackend needs the span name, not a tag — callers with an
    op-name column OR it in separately.)"""
    is_sql = F.element_at(tags, "db.system").isin(*OTEL_SQL_DB_SYSTEMS)
    conn = F.element_at(tags, "db.connection_string")
    conn_valid = conn.isNotNull() & (F.trim(conn) != "") & ~conn.contains(" ")
    peer = F.coalesce(
        F.element_at(tags, "net.peer.name"),
        F.element_at(tags, "net.sock.peer.addr"),
        F.element_at(tags, "net.peer.ip"),
    )
    port = F.element_at(tags, "net.peer.port")
    otel_uri = F.when(
        peer.isNotNull(),
        F.concat(
            peer,
            F.when(port.isNotNull(), F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        ),
    )
    jdbc_uri = F.when(
        otel_uri.contains("://"), otel_uri
    ).otherwise(F.concat(F.lit("jdbc://"), otel_uri))
    return F.when(
        is_sql,
        F.coalesce(
            F.element_at(tags, "sql.url"),
            F.when(conn_valid, conn),
            F.when(otel_uri.isNotNull(), jdbc_uri),
        ),
    )


def sql_fields(df: DataFrame, tags_col: str = "tags", prefix: str = "sql_") -> DataFrame:
    """SQL field extraction (SqlFieldsGenerator.java:23-74), plus the
    db-semantic destination URI (``sql_uri``) the backend enricher
    resolves from connection strings / net.peer parts."""
    t = F.col(tags_col)
    p = prefix
    return df.select(
        "*",
        _first_key(t, SQL_QUERY_KEYS).alias(p + "query"),
        _first_key(t, SQL_DB_TYPE_KEYS).alias(p + "db_type"),
        F.element_at(t, "sql.url").alias(p + "url"),
        F.element_at(t, "sql.params").alias(p + "params"),
        F.element_at(t, "sql.sqlstate").alias(p + "sqlstate"),
        sql_uri(t).alias(p + "uri"),
    )


# ---------------------------------------------------------------------------
# Span-kind alias cascade + protocol detection
# (SpanTypeAttributeEnricher.java:88-276)
# ---------------------------------------------------------------------------

def span_kind_from_tags(tags: Column, op_name: Column) -> Column:
    """ENTRY/EXIT/UNSPECIFIED via the full alias cascade. Each containsKey
    branch short-circuits — an unrecognized value yields UNSPECIFIED, it
    does NOT fall through to the next alias (the reference's else-if
    chain on containsKey)."""
    otel = F.lower(F.element_at(tags, "span_kind"))
    oc = F.lower(F.element_at(tags, "span.kind"))
    client_flag = F.lower(F.element_at(tags, "Client"))
    envoy_op = F.lower(F.element_at(tags, "operationname"))

    def tri(v: Column, entry_vals, exit_vals) -> Column:
        return (
            F.when(v.isin(*entry_vals), "ENTRY")
            .when(v.isin(*exit_vals), "EXIT")
            .otherwise("UNSPECIFIED")
        )

    return (
        F.when(otel.isNotNull(), tri(otel, ["server", "consumer"], ["client", "producer"]))
        .when(oc.isNotNull(), tri(oc, ["server", "consumer"], ["client", "producer"]))
        .when(client_flag.isNotNull(), tri(client_flag, ["false"], ["true"]))
        .when(envoy_op.isNotNull(), tri(envoy_op, ["ingress"], ["egress"]))
        .when(op_name.startswith("Sent."), "EXIT")
        .when(op_name.startswith("Recv."), "ENTRY")
        .otherwise("UNSPECIFIED")
    )


def protocol_from_tags(tags: Column) -> Column:
    """GRPC/HTTP/HTTPS/UNSPECIFIED detection: rpc.system / OT component /
    grpc.* key-prefix scan first; then http scheme; then the http.* prefix
    scan that is vetoed by any grpc.* key
    (SpanTypeAttributeEnricher.java:181-276)."""
    has_grpc_prefix = F.exists(F.map_keys(tags), lambda k: F.upper(k).startswith("GRPC"))
    has_http_prefix = F.exists(F.map_keys(tags), lambda k: F.upper(k).startswith("HTTP"))
    rpc_system = F.lower(F.element_at(tags, "rpc.system"))
    component = F.lower(F.element_at(tags, "component"))
    scheme = F.upper(F.element_at(tags, "http.scheme"))
    is_grpc = (
        (rpc_system.isNotNull() & (rpc_system == "grpc"))
        | (component.isNotNull() & (component == "grpc"))
        | has_grpc_prefix
    )
    return (
        F.when(is_grpc, "GRPC")
        .when(scheme.isin("HTTP", "HTTPS"), scheme)
        .when(has_http_prefix & ~has_grpc_prefix, "HTTP")
        .otherwise("UNSPECIFIED")
    )


# ---------------------------------------------------------------------------
# E15 — GrpcAttributeEnricher (enrichers/GrpcAttributeEnricher.java:21-48)
# ---------------------------------------------------------------------------

def _sanitize_path(c: Column) -> Column:
    """RpcSemanticConventionUtils.sanitizePath: split on '/', drop empties,
    join with '.' — '/pkg.Svc/M1' → 'pkg.Svc.M1'; blank → null."""
    joined = F.array_join(
        F.filter(F.split(F.trim(c), "/"), lambda x: x != ""), "."
    )
    # a slash-only path sanitizes to '' — treat as absent so the endpoint
    # coalesce chain falls through (Optional.empty analog)
    return F.when(c.isNotNull() & (F.trim(c) != "") & (joined != ""), joined)


def grpc_request_endpoint(tags: Column, op_name: Column) -> Column:
    """RpcSemanticConventionUtils.getGrpcRequestEndpoint (:509-539):
    Recv./Sent.-prefixed event name → stripped name; else
    rpc.request.metadata.:path (sanitized) → rpc.service '.' rpc.method →
    http.request.header.:path (sanitized) → grpc.path (sanitized) →
    event name."""
    stripped = F.when(
        op_name.startswith("Recv.") | op_name.startswith("Sent."),
        F.when(F.trim(op_name.substr(F.lit(6), F.length(op_name))) != "",
               F.trim(op_name.substr(F.lit(6), F.length(op_name)))),
    )
    svc = F.element_at(tags, "rpc.service")
    mth = F.element_at(tags, "rpc.method")
    rpc_path = F.when(
        svc.isNotNull() & (F.trim(svc) != "") & mth.isNotNull() & (F.trim(mth) != ""),
        F.concat(svc, F.lit("."), mth),
    )
    return F.when(
        op_name.startswith("Recv.") | op_name.startswith("Sent."), stripped
    ).otherwise(
        F.coalesce(
            _sanitize_path(F.element_at(tags, "rpc.request.metadata.:path")),
            rpc_path,
            _sanitize_path(F.element_at(tags, "http.request.header.:path")),
            _sanitize_path(F.element_at(tags, "grpc.path")),
            op_name,
        )
    )


def grpc_request_url(tags: Column, op_name: Column, kind: Column) -> Column:
    """E15: 'Recv.'/'Sent.'-prefixed request url for GRPC spans
    (GrpcAttributeEnricher.java:21-48); null for non-GRPC spans."""
    endpoint = grpc_request_endpoint(tags, op_name)
    prefix = (
        F.when(kind == "ENTRY", "Recv.").when(kind == "EXIT", "Sent.").otherwise("")
    )
    return F.when(
        (protocol_from_tags(tags) == "GRPC") & endpoint.isNotNull(),
        F.concat(prefix, endpoint),
    )


# ---------------------------------------------------------------------------
# P13 — dispatcher (FieldsGenerator.java:69-105): every tag key routes to
# its protocol generator; unclaimed keys land in the attribute bag.
# ---------------------------------------------------------------------------

_CLAIMED_EXACT = set(
    HTTP_URL_KEYS + HTTP_METHOD_KEYS + HTTP_USER_AGENT_KEYS + HTTP_PATH_KEYS
    + HTTP_REQUEST_SIZE_KEYS + HTTP_RESPONSE_SIZE_KEYS + HTTP_STATUS_CODE_KEYS
    + GRPC_STATUS_CODE_KEYS + GRPC_STATUS_MESSAGE_KEYS + GRPC_METHOD_KEYS
    + SQL_QUERY_KEYS + SQL_DB_TYPE_KEYS
    + DECLARED_REQUEST_HEADER_KEYS + DECLARED_RESPONSE_HEADER_KEYS
    + [
        "http.scheme", "http.host", "http.target", "http.request.body",
        "http.response.body", "http.request.body.truncated",
        "http.response.body.truncated", "http.response.status_message",
        "http.request.query_string",
        "grpc.host_port", "grpc.error_name", "grpc.error_message",
        "grpc.request.body", "grpc.response.body",
        "grpc.request.body.truncated", "grpc.response.body.truncated",
        "grpc.request.metadata", "grpc.response.metadata",
        "grpc.request.call_options", "grpc.path",
        "rpc.error_name", "rpc.error_message", "rpc.request.body",
        "rpc.response.body", "rpc.request.body.truncated",
        "rpc.response.body.truncated",
        "sql.url", "sql.params", "sql.sqlstate",
    ]
)

_CLAIMED_PREFIXES = [
    "http.request.header.", "http.response.header.", "http.request.param.",
    "http.request.cookie.", "http.response.cookie.",
    "rpc.request.metadata.", "rpc.response.metadata.",
]


def residual_attributes(tags: Column) -> Column:
    """The attribute bag: tags claimed by NO generator key/prefix
    (FieldsGenerator.java:84-99 fallthrough put)."""
    def unclaimed(k, v):
        cond = ~k.isin(*sorted(_CLAIMED_EXACT))
        for p in _CLAIMED_PREFIXES:
            cond = cond & ~k.startswith(p)
        return cond

    return F.map_filter(tags, unclaimed)


def extract_all_fields(df: DataFrame, tags_col: str = "tags") -> DataFrame:
    """P13 dispatcher: run the HTTP, GRPC and SQL generators plus the
    residual attribute bag in one pass — the columnar equivalent of the
    reference's per-key routing (exact generator keys first, then prefix
    handlers, then the attribute map)."""
    out = http_fields(df, tags_col)
    out = grpc_fields(out, tags_col)
    out = sql_fields(out, tags_col)
    return out.withColumn("attributes", residual_attributes(F.col(tags_col)))


def http_struct(df: DataFrame, prefix: str = "http_") -> DataFrame:
    """P8 typed-struct assembly: fold the flat http_* extraction columns
    into the nested Event.http record shape (request/response sub-records,
    structured-trace-schema.json `Http`/`Request`/`Response`). Runs after
    :func:`http_fields`; pure column re-nesting, no recomputation."""
    p = prefix
    request = F.struct(
        F.col(p + "method").alias("method"),
        F.col(p + "url").alias("url"),
        F.col(p + "scheme").alias("scheme"),
        F.col(p + "host").alias("host"),
        F.col(p + "path").alias("path"),
        F.col(p + "query").alias("query_string"),
        F.col(p + "user_agent").alias("user_agent"),
        F.col(p + "request_size").alias("size"),
        F.struct(
            F.col(p + "request_headers").alias("other_headers"),
        ).alias("headers"),
        F.col(p + "request_params").alias("params"),
        F.col(p + "request_cookies").alias("cookies"),
    )
    response = F.struct(
        F.col(p + "response_size").alias("size"),
        F.col(p + "status_code").alias("status_code"),
        F.col(p + "status_message").alias("status_message"),
        F.struct(
            F.col(p + "response_headers").alias("other_headers"),
        ).alias("headers"),
        F.col(p + "response_cookies").alias("cookies"),
    )
    return df.withColumn("http", F.struct(request.alias("request"), response.alias("response")))
