"""Field-generator unit tests mirroring the reference test cases
(span-normalizer/.../fieldgenerators/HttpFieldsGeneratorTest.java,
GrpcFieldsGeneratorTest.java, SqlFieldsGeneratorTest.java) with hand-built
tag maps and per-field assertions."""

import pytest
from pyspark.sql import functions as F

from hypertrace_ingester_spark.operators import fieldgen as fg


def _run(spark, op, tags: dict, **extra_cols):
    df = spark.createDataFrame([{"id": 1, "tags": tags, **extra_cols}])
    return op(df, "tags").collect()[0].asDict()


# --- HTTP (HttpFieldsGeneratorTest.java:60-150 shape) -----------------------

def test_http_alias_priorities(spark):
    row = _run(
        spark, fg.http_fields,
        {
            "http.request.method": "GET", "http.method": "PUT",
            "http.url": "https://example.ai/url1",
            "http.request.url": "https://example.ai/url2",
            "url": "https://example.ai/url3",
            "user.agent": "Chrome 1", "user_agent": "Chrome 2",
            "user-agent": "Chrome 3",
            "http.request.header.user-agent": "Chrome 4",
            "http.user_agent": "Chrome 5",
            "request_size": "50", "http.request.size": "40",
            "http.status_code": "200", "http.response.status_code": "201",
        },
    )
    assert row["http_method"] == "GET"
    assert row["http_url"] == "https://example.ai/url1"
    assert row["http_user_agent"] == "Chrome 1"
    assert row["http_request_size"] == 50
    assert row["http_status_code"] == 200


def test_http_relative_url_sets_parts_only(spark):
    # HttpFieldsGenerator.java:587-612 — relative url tag: url unset,
    # path + query still derived.
    row = _run(spark, fg.http_fields, {"http.url": "/customer/23?x=2&y=3"})
    assert row["http_url"] is None
    assert row["http_scheme"] is None
    assert row["http_host"] is None
    assert row["http_path"] == "/customer/23"
    assert row["http_query"] == "x=2&y=3"


def test_http_absolute_url_parts(spark):
    row = _run(spark, fg.http_fields, {"http.url": "https://example.ai:8443/api/v1/?a=b"})
    assert row["http_url"] == "https://example.ai:8443/api/v1/?a=b"
    assert row["http_scheme"] == "https"
    assert row["http_host"] == "example.ai:8443"  # authority keeps the port
    assert row["http_path"] == "/api/v1"  # trailing slash stripped
    assert row["http_query"] == "a=b"


def test_http_path_attr_validation(spark):
    # path attrs must start with '/'; trailing slash stripped; home '/'kept
    assert _run(spark, fg.http_fields, {"http.request.path": "/path1/"})["http_path"] == "/path1"
    assert _run(spark, fg.http_fields, {"http.request.path": "path1", "http.path": "  "})["http_path"] is None
    assert _run(spark, fg.http_fields, {"http.path": "/"})["http_path"] == "/"
    # url with empty path -> '/'
    assert _run(spark, fg.http_fields, {"http.url": "http://example.ai"})["http_path"] == "/"


def test_http_otel_url_composition(spark):
    row = _run(
        spark, fg.http_fields,
        {"http.scheme": "https", "http.host": "example.ai", "http.target": "/t?z=1"},
    )
    assert row["http_url"] == "https://example.ai/t?z=1"
    assert row["http_path"] == "/t"
    assert row["http_query"] == "z=1"


def test_http_body_size_fallback_and_truncation(spark):
    body = {"http.request.body": "abcdef"}
    assert _run(spark, fg.http_fields, body)["http_request_size"] == 6
    assert (
        _run(spark, fg.http_fields, {**body, "http.request.body.truncated": "true"})[
            "http_request_size"
        ]
        is None
    )
    # explicit size beats body length
    assert _run(spark, fg.http_fields, {**body, "request_size": "50"})["http_request_size"] == 50


def test_http_prefix_explosion_excludes_declared(spark):
    row = _run(
        spark, fg.http_fields,
        {
            "http.request.header.authorization": "Bearer x",
            "http.request.header.user-agent": "Chrome",  # declared -> excluded
            "http.request.header.content-length": "12",  # declared -> excluded
            "http.request.param.p1": "v1",
            "http.request.cookie.c1": "cv1",
            "http.response.cookie.r1": "rv1",
        },
    )
    assert row["http_request_headers"] == {"authorization": "Bearer x"}
    assert row["http_request_params"] == {"p1": "v1"}
    assert row["http_request_cookies"] == ["c1=cv1"]
    assert row["http_response_cookies"] == ["r1=rv1"]


# --- GRPC -------------------------------------------------------------------

def test_grpc_status_and_metadata(spark):
    row = _run(
        spark, fg.grpc_fields,
        {
            "census.status_code": "13", "grpc.status_code": "5",
            "status.message": "msg1", "grpc.message": "msg2",
            "grpc.request.metadata": "Metadata(k1=v1,k2=v2,bad)",
        },
    )
    # priority: otel > census status.code > grpc.status_code > ...
    assert row["grpc_status_code"] == 5 or row["grpc_status_code"] == 13
    # census 'status.code' isn't set; 'census.status_code' is LAST in the
    # priority list so grpc.status_code (position 3) wins
    assert row["grpc_status_code"] == 5
    assert row["grpc_status_message"] == "msg1"
    assert row["grpc_request_metadata"] == {"k1": "v1", "k2": "v2"}


def test_grpc_size_chain(spark):
    # envoy > rpc content-length > grpc body > rpc body
    t = {
        "rpc.request.metadata.content-length": "77",
        "grpc.request.body": "abc",
    }
    assert _run(spark, fg.grpc_fields, t)["grpc_request_size"] == 77
    assert _run(spark, fg.grpc_fields, {"grpc.request.body": "abc"})["grpc_request_size"] == 3
    assert (
        _run(
            spark, fg.grpc_fields,
            {"grpc.request.body": "abc", "grpc.request.body.truncated": "true",
             "rpc.request.body": "defgh"},
        )["grpc_request_size"]
        == 5
    )


# --- SQL --------------------------------------------------------------------

def test_sql_fields(spark):
    row = _run(
        spark, fg.sql_fields,
        {
            "sql.query": "SELECT 1", "db.statement": "SELECT 2",
            "db.system": "mysql", "sql.url": "jdbc:mysql://db:3306/shop",
            "sql.sqlstate": "42000",
        },
    )
    assert row["sql_query"] == "SELECT 1"
    assert row["sql_db_type"] == "mysql"
    assert row["sql_url"] == "jdbc:mysql://db:3306/shop"
    assert row["sql_sqlstate"] == "42000"


# --- span-kind cascade ------------------------------------------------------

@pytest.mark.parametrize(
    "tags,op_name,expect",
    [
        ({"span_kind": "SERVER"}, "x", "ENTRY"),
        ({"span_kind": "consumer"}, "x", "ENTRY"),
        ({"span_kind": "client"}, "x", "EXIT"),
        # unrecognized value short-circuits (no fallthrough to span.kind)
        ({"span_kind": "weird", "span.kind": "server"}, "x", "UNSPECIFIED"),
        ({"span.kind": "server"}, "x", "ENTRY"),
        ({"Client": "false"}, "x", "ENTRY"),
        ({"Client": "true"}, "x", "EXIT"),
        ({"operationname": "ingress"}, "x", "ENTRY"),
        ({"operationname": "egress"}, "x", "EXIT"),
        ({}, "Sent.Svc.M", "EXIT"),
        ({}, "Recv.Svc.M", "ENTRY"),
        ({}, "plain", "UNSPECIFIED"),
    ],
)
def test_span_kind_cascade(spark, tags, op_name, expect):
    df = spark.createDataFrame(
        [(1, tags, op_name)], schema="id long, tags map<string,string>, op string"
    )
    got = df.select(
        fg.span_kind_from_tags(F.col("tags"), F.col("op")).alias("k")
    ).collect()[0]["k"]
    assert got == expect


@pytest.mark.parametrize(
    "tags,expect",
    [
        ({"rpc.system": "grpc"}, "GRPC"),
        ({"component": "gRPC"}, "GRPC"),
        ({"grpc.authority": "x"}, "GRPC"),
        ({"http.scheme": "https"}, "HTTPS"),
        ({"http.method": "GET"}, "HTTP"),
        ({"http.method": "GET", "grpc.x": "1"}, "GRPC"),  # grpc veto
        ({"other": "1"}, "UNSPECIFIED"),
    ],
)
def test_protocol_detection(spark, tags, expect):
    df = spark.createDataFrame([(1, tags)], schema="id long, tags map<string,string>")
    got = df.select(fg.protocol_from_tags(F.col("tags")).alias("p")).collect()[0]["p"]
    assert got == expect


def test_http_struct_assembly(spark):
    df = spark.createDataFrame(
        [(1, {"http.url": "https://example.ai/a?x=1", "http.request.method": "GET",
              "http.response.status_code": "201"})],
        "id long, tags map<string,string>",
    )
    row = fg.http_struct(fg.http_fields(df, "tags")).collect()[0]
    http = row["http"]
    assert http["request"]["method"] == "GET"
    assert http["request"]["url"] == "https://example.ai/a?x=1"
    assert http["request"]["path"] == "/a"
    assert http["response"]["status_code"] == 201
    assert http["response"]["size"] is None
