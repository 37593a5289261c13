"""Multimodal plumbing tests: schema/batching/error isolation of the
pandas-UDF decode path with the deterministic fake decoder."""

from __future__ import annotations

import pytest

from prefect_flow_arc_alto_to_json_spark.operators.multimodal import (
    FEATURE_DIM,
    dedup_by_payload,
    extract_features,
    frame_sample_plan,
    payload_stats,
)
from prefect_flow_arc_alto_to_json_spark.schemas import MULTIMODAL_ASSET_SCHEMA


@pytest.fixture(scope="module")
def assets(spark):
    rows = [
        (1, "image", b"\x89PNG-fake-bytes-1", ("png", 64, 64, None, {})),
        (2, "image", b"\x89PNG-fake-bytes-2", ("png", 32, 32, None, {})),
        (3, "image", b"\x89PNG-fake-bytes-1", ("png", 64, 64, None, {})),  # dup payload
        (4, "audio", b"RIFF-fake", ("wav", None, None, 2500, {})),
        (5, "video", b"\x00\x00ftyp-fake", ("mp4", 640, 360, 3200, {})),
        (6, "image", None, ("png", 1, 1, None, {})),  # corrupt: null payload
    ]
    return spark.createDataFrame(rows, MULTIMODAL_ASSET_SCHEMA)


def test_extract_features_shape_and_errors(assets):
    out = extract_features(assets).collect()
    by_id = {r["asset_id"]: r for r in out}
    assert len(out) == 6
    ok = by_id[1]
    assert ok["decode_error"] is None
    assert ok["feature_dim"] == FEATURE_DIM and len(ok["feature"]) == FEATURE_DIM
    # deterministic: same payload+modality → same features
    assert by_id[1]["feature"] == by_id[3]["feature"]
    assert by_id[1]["feature"] != by_id[2]["feature"]
    # corrupt payload → error row, not task failure
    bad = by_id[6]
    assert bad["feature"] is None and "ValueError" in bad["decode_error"]


def test_payload_stats_jvm_only(assets):
    out = {r["asset_id"]: r for r in payload_stats(assets).collect()}
    assert out[1]["payload_bytes"] == len(b"\x89PNG-fake-bytes-1")
    assert out[1]["payload_md5"] == out[3]["payload_md5"]
    assert out[6]["payload_bytes"] is None


def test_dedup_by_payload(assets):
    groups = {r["keeper_id"]: r["n_copies"] for r in dedup_by_payload(assets).collect()}
    assert groups[1] == 2  # assets 1 and 3 share bytes
    assert groups[2] == 1


def test_frame_sample_plan(assets):
    frames = frame_sample_plan(assets.where("modality = 'video'"), every_n_ms=1000)
    ts = sorted(r["frame_ts_ms"] for r in frames.collect())
    assert ts == [0, 1000, 2000, 3000]
