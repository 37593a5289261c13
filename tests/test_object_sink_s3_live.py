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


def test_full_pipeline_against_live_s3(spark, s3_endpoint, tmp_path):
    """The reference's ENTIRE main_flow against live-ish backends: parquet
    catalog → file:// fetch → ALTO parse/simplify → one pretty JSON object
    per document PUT to a real S3 HTTP endpoint (moto server) → keyed
    UPDATE + INSERT into a DB-API store → watermark advance. The closest
    in-sandbox replica of flows/main_flow.py:111-157 end to end."""
    import datetime
    import os
    import sqlite3

    from prefect_flow_arc_alto_to_json_spark.pipeline import (
        PipelineConfig,
        run_pipeline,
    )

    fixtures = os.path.join(os.path.dirname(__file__), "fixtures")
    ts = lambda d: datetime.datetime(2024, 1, d)  # noqa: E731
    rows = [
        ("f1", "rep1", f"file://{fixtures}/alto_v2.xml", "application/xml", "schema_alto_v2", ts(10)),
        ("f2", "rep2", f"file://{fixtures}/alto_v3.xml", "application/xml", "alto", ts(12)),
        ("f7", "rep7", "file:///does/not/exist.xml", "application/xml", "alto", ts(13)),
    ]
    file_df = spark.createDataFrame(
        rows,
        "id string, representation_id string, premis_stored_at string,"
        "ebucore_has_mime_type string, schema_name string, updated_at timestamp",
    )
    includes = spark.createDataFrame([("f1",), ("f2",), ("f7",)], "file_id string")
    cat_dir = str(tmp_path / "catalog")
    file_df.write.parquet(os.path.join(cat_dir, "file.parquet"))
    includes.write.parquet(os.path.join(cat_dir, "includes.parquet"))

    db_path = str(tmp_path / "sink.db")
    conn = sqlite3.connect(db_path)
    conn.execute("CREATE TABLE representation (id TEXT PRIMARY KEY, schema_transcript TEXT)")
    conn.execute(
        "CREATE TABLE schema_transcript_url (representation_id TEXT, schema_transcript_url TEXT)"
    )
    for rep in ("rep1", "rep2", "rep7"):
        conn.execute("INSERT INTO representation (id) VALUES (?)", (rep,))
    conn.commit()
    conn.close()

    factory = _factory(s3_endpoint)
    factory().create_bucket(Bucket="alto-json")
    cfg = PipelineConfig(
        catalog_dir=cat_dir,
        objects_target="s3://alto-json/transcripts",
        s3_endpoint=s3_endpoint,
        s3_bucket="alto-json",
        watermark_dir=str(tmp_path / "wm"),
        full_sync=True,
    )
    dbf = lambda: sqlite3.connect(db_path)  # noqa: E731
    counts = run_pipeline(
        spark,
        cfg,
        representation_conn_factory=dbf,
        transcript_url_conn_factory=dbf,
        objects_client_factory=factory,
    )
    assert counts == {"processed": 2, "failed": 1}

    client = factory()
    keys = sorted(
        o["Key"]
        for o in client.list_objects_v2(Bucket="alto-json", Prefix="transcripts/")[
            "Contents"
        ]
    )
    assert keys == [
        "transcripts/alto_v2.xml.json",
        "transcripts/alto_v3.xml.json",
    ]
    body = client.get_object(Bucket="alto-json", Key="transcripts/alto_v2.xml.json")[
        "Body"
    ].read().decode("utf-8")
    payload = json.loads(body)
    assert [t["text"] for t in payload["text"]] == ["Hello", "world", "again", "block2"]
    assert body == json.dumps(payload, indent=2, ensure_ascii=False)  # pretty bytes

    conn = sqlite3.connect(db_path)
    got = dict(conn.execute("SELECT id, schema_transcript FROM representation").fetchall())
    assert got["rep1"] == "Hello world again block2"
    assert got["rep7"] is None
    conn.close()

    from prefect_flow_arc_alto_to_json_spark.streaming.watermark import (
        WatermarkStore,
    )

    assert WatermarkStore(str(tmp_path / "wm")).load() == "2024-01-13"
