"""LIVE S3 object-sink test (reference S4, flows/main_flow.py:141-147):
exercises the REAL boto3 code path — client construction, per-record
``put_object`` over HTTP, key templating, pretty bytes — against a
moto server (a real S3-API HTTP endpoint in-process), from Spark
EXECUTOR workers via foreachPartition.

Rounds 1-7 could only fake-client this branch (no boto3 in the
container); round 8's container ships boto3 + moto, closing the S4
"partial" in SURVEY §2.1. moto's SERVER mode (not @mock_aws) is
required: the in-process botocore patch never reaches Spark's Python
worker processes, but an HTTP endpoint does.
"""

from __future__ import annotations

import json

import pytest

boto3 = pytest.importorskip("boto3")
pytest.importorskip("moto")

from moto.server import ThreadedMotoServer  # noqa: E402

from prefect_flow_arc_alto_to_json_spark.sinks.objects import (  # noqa: E402
    write_json_objects,
)


@pytest.fixture(scope="module")
def s3_endpoint():
    server = ThreadedMotoServer(port=0, verbose=False)
    server.start()
    host, port = server.get_host_and_port()
    yield f"http://{host}:{port}"
    server.stop()


def _factory(endpoint: str):
    """Real boto3 client against the moto endpoint — a zero-arg picklable
    closure, invoked once per partition on the executor (the same shape
    the reference's endpoint-override config produces,
    flows/main_flow.py:126)."""

    def make():
        return boto3.client(
            "s3",
            endpoint_url=endpoint,
            region_name="us-east-1",
            aws_access_key_id="testing",
            aws_secret_access_key="testing",
        )

    return make


def test_s3_put_object_live_from_executors(spark, s3_endpoint):
    factory = _factory(s3_endpoint)
    factory().create_bucket(Bucket="corpus")

    rows = [
        ("alto_001.xml.json", json.dumps({"fileName": "alto_001.xml", "text": ["a", "b"]})),
        ("alto_002.xml.json", json.dumps({"fileName": "alto_002.xml", "text": []})),
        ("alto_003.xml.json", json.dumps({"fileName": None, "error": "unsupported"})),
    ]
    df = spark.createDataFrame(rows, "s3_key string, json string").repartition(2)
    write_json_objects(df, "s3://corpus/out", client_factory=factory)

    client = factory()
    listed = client.list_objects_v2(Bucket="corpus", Prefix="out/")
    keys = sorted(o["Key"] for o in listed.get("Contents", []))
    assert keys == [f"out/{k}" for k, _ in rows]

    # byte contract: pretty-printed 2-space JSON (JSON.stringify(..., null, 2)
    # parity, reference js:24070-24072)
    for key, compact in rows:
        body = client.get_object(Bucket="corpus", Key=f"out/{key}")["Body"].read()
        assert body.decode("utf-8") == json.dumps(
            json.loads(compact), indent=2, ensure_ascii=False
        )


def test_s3_put_is_idempotent_under_rerun(spark, s3_endpoint):
    """PUT-by-key overwrite: re-running the sink (task retry / job rerun)
    leaves the same N objects with the same bytes — SURVEY §7.4.4."""
    factory = _factory(s3_endpoint)
    factory().create_bucket(Bucket="rerun")
    df = spark.createDataFrame(
        [("k1.json", '{"v": 1}'), ("k2.json", '{"v": 2}')],
        "s3_key string, json string",
    )
    write_json_objects(df, "s3://rerun", client_factory=factory)
    write_json_objects(df, "s3://rerun", client_factory=factory)
    client = factory()
    listed = client.list_objects_v2(Bucket="rerun")
    assert sorted(o["Key"] for o in listed["Contents"]) == ["k1.json", "k2.json"]
    body = client.get_object(Bucket="rerun", Key="k1.json")["Body"].read()
    assert json.loads(body) == {"v": 1}
