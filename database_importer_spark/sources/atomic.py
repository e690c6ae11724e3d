"""Atomic table overwrite — write-then-swap publication.

The reference stages with per-chunk commits (importer.py:261): a
mid-load failure leaves partial staging visible. The engine's
improvement (SURVEY §4.3): materialize the new table version into a
versioned directory, then publish it with one atomic pointer flip —
readers see the old version or the new one, never a mix.

On a real deployment the "pointer" is a metastore location update or
a table-format commit (Delta/Iceberg do exactly this internally);
on a filesystem it's an atomic symlink swap, which is what this
implements. Version directories make retries idempotent and keep the
previous version for instant rollback.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

CURRENT = "current"


def _versions_dir(root: str) -> str:
    d = os.path.join(root, "_versions")
    os.makedirs(d, exist_ok=True)
    return d


def _swap_symlink(root: str, target: str, link: str) -> None:
    """Atomically (re)point ``link`` at ``target``: create the symlink
    at a unique path owned by this process (mkdtemp — race-free,
    unlike the deprecated mktemp), then rename(2) it over the link."""
    tmpdir = tempfile.mkdtemp(dir=root, prefix=".swap_")
    try:
        tmp = os.path.join(tmpdir, "link")
        os.symlink(target, tmp)
        os.replace(tmp, link)
    finally:
        try:
            os.rmdir(tmpdir)
        except OSError:
            pass


def atomic_overwrite(df: DataFrame, root: str, version: str) -> str:
    """Write ``df`` as parquet under ``root/_versions/<version>`` and
    atomically repoint ``root/current`` at it. Returns the published
    path. Re-running the same version overwrites its directory before
    the swap (idempotent retry)."""
    vdir = os.path.join(_versions_dir(root), version)
    df.write.mode("overwrite").parquet(vdir)

    _swap_symlink(root, vdir, os.path.join(root, CURRENT))
    return vdir


def read_current(spark: SparkSession, root: str) -> DataFrame:
    """Read whatever version is currently published."""
    return spark.read.parquet(os.path.join(root, CURRENT))


def list_versions(root: str) -> list[str]:
    return sorted(os.listdir(_versions_dir(root)))


def rollback(root: str, version: str) -> None:
    """Point ``current`` back at an existing prior version."""
    vdir = os.path.join(_versions_dir(root), version)
    if not os.path.isdir(vdir):
        raise ValueError(f"unknown version: {version!r}")
    _swap_symlink(root, vdir, os.path.join(root, CURRENT))
