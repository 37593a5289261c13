"""Versioned snapshot table: the minimal metadata-layer pattern behind
Delta/Iceberg time travel, on plain parquet.

Every write is a NEW immutable directory ``v{n}`` plus an atomic manifest
commit (write-temp + rename — atomic on local/HDFS; an object-store lake
moves exactly this commit into a log service, which is the entire
difference). Readers resolve the manifest once and pin a snapshot: a
query against version N is repeatable forever, concurrent writers never
disturb it, and "what did the corpus look like before yesterday's dedup
pass" is a constant-time metadata lookup — the provenance question every
training-data pipeline eventually gets asked.

Scale: the data path is ordinary parquet (pushdown, pruning, bucketing
all apply per version directory); the manifest is O(versions) JSON.
Old versions are reclaimed by an explicit ``vacuum`` (keep-last-K), never
implicitly — readers of pinned snapshots must keep working until the
retention an operator chose expires.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

_MANIFEST = "manifest.json"


def _manifest_path(path: str) -> str:
    return os.path.join(path, _MANIFEST)


def _read_manifest(path: str) -> list[dict]:
    try:
        with open(_manifest_path(path)) as fh:
            return json.load(fh)["versions"]
    except FileNotFoundError:
        return []


def _commit_manifest(path: str, versions: list[dict]) -> None:
    # atomic commit: temp write + rename is the whole "transaction log"
    tmp = _manifest_path(path) + ".__tmp__"
    with open(tmp, "w") as fh:
        json.dump({"versions": versions}, fh, indent=1)
    os.replace(tmp, _manifest_path(path))


def write_version(df: DataFrame, path: str) -> int:
    """Write ``df`` as the next immutable snapshot of the table at
    ``path``; returns the new version number (1-based). The data lands
    fully before the manifest commit makes it visible — a crash between
    the two leaves an orphan directory, never a corrupt table."""
    os.makedirs(path, exist_ok=True)
    versions = _read_manifest(path)
    n = (versions[-1]["version"] + 1) if versions else 1
    vdir = os.path.join(path, f"v{n}")
    df.write.mode("errorifexists").parquet(vdir)
    _commit_manifest(path, versions + [{"version": n, "dir": f"v{n}"}])
    return n


def read_version(
    spark: SparkSession, path: str, version: int | None = None
) -> DataFrame:
    """Read a pinned snapshot (``version``) or the latest when None."""
    versions = _read_manifest(path)
    if not versions:
        raise FileNotFoundError(f"no committed versions at {path}")
    if version is None:
        entry = versions[-1]
    else:
        by_v = {v["version"]: v for v in versions}
        if version not in by_v:
            raise ValueError(
                f"version {version} not in manifest "
                f"(have {sorted(by_v)})"
            )
        entry = by_v[version]
    return spark.read.parquet(os.path.join(path, entry["dir"]))


def list_versions(path: str) -> list[int]:
    return [v["version"] for v in _read_manifest(path)]


def vacuum(path: str, keep_last: int = 1) -> list[int]:
    """Drop all but the last ``keep_last`` snapshots: manifest commit
    FIRST (readers immediately stop resolving the dropped versions), then
    physical deletes — the crash-safe order. Returns dropped versions."""
    import shutil

    if keep_last < 1:
        raise ValueError(f"keep_last must be >= 1, got {keep_last}")
    versions = _read_manifest(path)
    keep, drop = versions[-keep_last:], versions[:-keep_last]
    _commit_manifest(path, keep)
    for v in drop:
        shutil.rmtree(os.path.join(path, v["dir"]), ignore_errors=True)
    return [v["version"] for v in drop]
