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

With Iceberg configured (``spark.sql.catalog...``), construct the runner
with ``use_iceberg=True`` and a catalog namespace: each stage becomes
``catalog.ns.<stage>`` written with ``createOrReplace()`` (an atomic
Iceberg snapshot commit with overwrite semantics — a stage retry or
re-run REPLACES, never duplicates) carrying the config fingerprint as a
table property; resume = the table exists and its recorded fingerprint
matches. The Iceberg calls go through two seam functions
(``_iceberg_write`` / ``_iceberg_fingerprint``) so the skip logic is
unit-testable with a stubbed catalog (no Iceberg jar in this sandbox —
SURVEY.md §7.0).
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


def write_table(
    df: DataFrame,
    table_dir: str,
    extra: dict | None = None,
    fmt: str = "parquet",
) -> dict:
    """Write a stage table + commit manifest (atomic via temp-file rename).

    ``fmt="iceberg"`` writes through the Iceberg catalog (``table_dir``
    is then a table identifier, e.g. ``cat.db.scored_pairs``) with
    ``createOrReplace()``: the Iceberg snapshot IS the commit point
    (atomic, and overwrite semantics make stage retries idempotent — no
    duplicate rows), so no local manifest file is written (a catalog
    identifier is not a filesystem path). The config fingerprint rides as
    a table property for the resume check (``_iceberg_fingerprint``). No
    Iceberg runtime jar ships in this sandbox, so tests exercise this
    branch through the stubbed seam (``tests/test_io_extras.py``).
    """
    t0 = time.time()
    if fmt == "iceberg":
        _iceberg_write(df, table_dir, (extra or {}).get("fingerprint"))
        return {
            "table": table_dir,
            "wall_s": round(time.time() - t0, 3),
            "schema": df.schema.jsonValue(),
            "commit": "iceberg-snapshot",
            **(extra or {}),
        }
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


FINGERPRINT_PROP = "pipeline.stage.fingerprint"


def _iceberg_write(df: DataFrame, ident: str, fingerprint: str | None) -> None:
    """Iceberg seam: atomic createOrReplace with the fingerprint property.
    Tests stub this (no Iceberg jar in the sandbox)."""
    writer = df.writeTo(ident).using("iceberg")
    if fingerprint is not None:
        writer = writer.tableProperty(FINGERPRINT_PROP, fingerprint)
    writer.createOrReplace()


def _iceberg_fingerprint(spark: SparkSession, ident: str) -> str | None:
    """Iceberg seam: the committed fingerprint of ``ident`` or None if the
    table doesn't exist / carries no fingerprint property.

    Only TABLE_OR_VIEW_NOT_FOUND maps to None (= stage not committed,
    rebuild). Any OTHER failure — misconfigured catalog, typo'd
    namespace, transient connectivity — re-raises: swallowing it would
    silently recompute a multi-hour committed stage on every run while
    resume appears to 'work'."""
    from pyspark.errors import AnalysisException

    try:
        rows = spark.sql(f"SHOW TBLPROPERTIES {ident}").collect()
    except AnalysisException as e:
        cond = getattr(e, "getCondition", lambda: None)() or ""
        if "TABLE_OR_VIEW_NOT_FOUND" in cond or "TABLE_OR_VIEW_NOT_FOUND" in str(e):
            return None
        raise
    for r in rows:
        if r["key"] == FINGERPRINT_PROP:
            return r["value"]
    return None


def read_table(spark: SparkSession, table_dir: str, fmt: str = "parquet") -> DataFrame:
    if fmt == "iceberg":
        return spark.read.table(table_dir)
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


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str = "conv_id",
    n_buckets: int = 32,
) -> None:
    """Persist a stage table BUCKETED by the join key.

    At 100-TB scale the two feature joins in pair scoring and the
    blocking self-join dominate shuffle volume; storing docs/features
    bucketed by ``conv_id`` (Iceberg: ``bucket(N, conv_id)`` hidden
    partitioning; Hive tables here) lets Catalyst plan storage-partitioned
    joins with NO Exchange on the bucketed side —
    ``tests/test_plans.py::test_bucketed_join_avoids_shuffle`` proves the
    Exchange disappears from the plan.
    """
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(table_name)
    )


def export_results_csv(df: DataFrame, out_dir: str) -> None:
    """CSV result sink — reference ``export_results_to_csv``
    (optimized.py:947-994) exports a flat result table; here any stage
    DataFrame (scored pairs, clusters, audit) writes as headered CSV.
    Arrays/maps are JSON-encoded first (CSV source requires flat types).
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    flat = df
    for field in df.schema.fields:
        if isinstance(field.dataType, (T.ArrayType, T.MapType, T.StructType)):
            flat = flat.withColumn(field.name, F.to_json(field.name))
    flat.write.mode("overwrite").option("header", "true").csv(out_dir)


def list_tables(spark: SparkSession, out_dir: str | None = None) -> list[str]:
    """Catalog listing — reference ``list_available_indices``
    (ultimate_address_matcher.py:1232-1258, GET _cat/indices). With a
    catalog configured it's ``spark.catalog.listTables()``; for the
    parquet seam it lists committed stage tables under ``out_dir``."""
    names = [t.name for t in spark.catalog.listTables()]
    if out_dir and os.path.isdir(out_dir):
        names += sorted(
            d for d in os.listdir(out_dir) if is_committed(os.path.join(out_dir, d))
        )
    return names


@dataclass
class StageRunner:
    """Staged materialization with skip-on-commit resume.

    Parquet mode (default): commit = atomic ``_MANIFEST.json`` rename;
    resume = manifest exists with a matching config fingerprint.

    Iceberg mode (``use_iceberg=True``; ``out_dir`` is then a catalog
    namespace like ``cat.db``): commit = the ``createOrReplace()``
    snapshot carrying the fingerprint as a table property; resume = the
    table's recorded fingerprint matches. Retries are idempotent in both
    modes (rename-commit / snapshot-replace).
    """

    spark: SparkSession
    out_dir: str
    fingerprint: str = "default"
    use_iceberg: bool = False
    # resume=False ignores existing commit manifests: every stage
    # recomputes and overwrite-commits in place. This is the whole of
    # --no-resume — nothing is ever deleted (the output dir may hold
    # non-stage artifacts, e.g. committed incremental state)
    resume: bool = True
    metrics: list[dict] = field(default_factory=list)

    def stage_dir(self, name: str) -> str:
        if self.use_iceberg:
            return f"{self.out_dir}.{name}"
        return os.path.join(self.out_dir, name)

    def _committed(self, ident: str) -> bool:
        if not self.resume:
            return False
        if self.use_iceberg:
            return _iceberg_fingerprint(self.spark, ident) == self.fingerprint
        return is_committed(ident, self.fingerprint)

    def run(self, name: str, fn: Callable[[], DataFrame]) -> DataFrame:
        """Build-or-load stage ``name``. ``fn`` produces the DataFrame."""
        fmt = "iceberg" if self.use_iceberg else "parquet"
        d = self.stage_dir(name)
        if self._committed(d):
            self.metrics.append({"stage": name, "resumed": True})
            return read_table(self.spark, d, fmt)
        df = fn()
        manifest = write_table(
            df, d, {"fingerprint": self.fingerprint}, fmt=fmt
        )
        self.metrics.append(
            {"stage": name, "resumed": False, "wall_s": manifest["wall_s"]}
        )
        return read_table(self.spark, d, fmt)
