"""Structured Streaming ingestion for the linkage pipeline.

The reference is strictly batch/request-response and the north rule asks
for a *resumable batch* job (SURVEY.md §2.10) — so the matching stages
stay batch. What streaming adds here is the INGESTION edge a production
deployment needs: transcript turns arriving continuously land in the
bronze turns table exactly-once (file-source + checkpoint), and a
watermarked windowed aggregation feeds the audit table with arrival
stats. The batch linkage job then runs over the bronze table on its own
cadence, resuming via stage manifests.

Both entry points use ``trigger(availableNow=True)`` in tests — the same
code runs continuously in production with a processing-time trigger.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TURNS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("role", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("tool", T.StringType()),
        T.StructField("ts", T.TimestampType()),
    ]
)


def ingest_turns_stream(
    spark: SparkSession,
    input_dir: str,
    bronze_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """File-source stream -> bronze turns table, exactly-once.

    The checkpoint directory makes re-runs skip already-committed source
    files — the streaming twin of the batch stage manifests.
    Returns the StreamingQuery (caller awaits/stops it).
    """
    stream = (
        spark.readStream.schema(TURNS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )
    writer = (
        stream.writeStream.format("parquet")
        .option("path", bronze_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_exact_dedup(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "10 minutes",
):
    """Stateful streaming exact-dedup: drop turns whose (conv_id,
    turn_idx, text-hash) was already seen, across micro-batches, state
    bounded by the event-time watermark — built-in
    ``dropDuplicatesWithinWatermark`` state store (no custom state code
    needed; the keyed state is the applyInPandasWithState analogue for
    this op)."""
    stream = (
        spark.readStream.schema(TURNS_SCHEMA)
        .option("maxFilesPerTrigger", 4)
        .parquet(input_dir)
    )
    deduped = (
        stream.withColumn("text_hash", F.xxhash64("conv_id", "turn_idx", "text"))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["text_hash"])
        .drop("text_hash")
    )
    return (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


CANON_STATE_SCHEMA = "turns ARRAY<STRUCT<turn_idx: INT, role: STRING, text: STRING>>, last_ts LONG"
CANON_OUT_SCHEMA = (
    "conv_id STRING, canonical_text STRING, n_turns INT, roles_sig STRING"
)


def streaming_canonicalize(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    idle_timeout_ms: int = 0,
):
    """Custom stateful streaming canonicalization via
    ``applyInPandasWithState``: turns arrive in any order across
    micro-batches; per-conv_id state accumulates (turn_idx, role, text);
    when the conversation goes idle (processing-time timeout; with
    ``availableNow`` test runs, at end-of-stream state timeout) the
    canonical document is emitted — same semantics as the batch
    canonicalizer (sort by turn_idx, \\x1e join), incrementally.

    This is the streaming twin of ``pipeline.canonicalize.canonicalize``;
    the batch path stays authoritative (north rule: resumable batch), but
    a deployment that wants fresh canonical docs within minutes of
    arrival runs this against the bronze stream.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def _update(key, pdfs, state: GroupState):
        (conv_id,) = key
        if state.hasTimedOut:
            turns, _ = state.get
            state.remove()
            ordered = sorted(turns, key=lambda t: t[0])
            yield pd.DataFrame(
                {
                    "conv_id": [conv_id],
                    "canonical_text": ["\x1e".join(t[2] for t in ordered)],
                    "n_turns": [len(ordered)],
                    # match batch canonicalize: array_join silently drops
                    # null entries and substring('',1,1)='' — null/empty
                    # roles contribute nothing to the signature
                    "roles_sig": ["".join(t[1][0] for t in ordered if t[1])],
                }
            )
            return
        rows = []
        for pdf in pdfs:
            rows.extend(
                (int(i), r, x or "")
                for i, r, x in zip(pdf["turn_idx"], pdf["role"], pdf["text"])
            )
        if state.exists:
            prev, _ = state.get
            rows = list(prev) + rows
        state.update((rows, 0))
        state.setTimeoutDuration(max(idle_timeout_ms, 1))
        return
        yield  # generator function with no batch output

    stream = (
        spark.readStream.schema(TURNS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )
    out = stream.groupBy("conv_id").applyInPandasWithState(
        _update,
        outputStructType=CANON_OUT_SCHEMA,
        stateStructType=CANON_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
    return (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def streaming_incremental_link(
    spark: SparkSession,
    input_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    cfg=None,
    max_files_per_trigger: int = 1,
):
    """CONTINUOUS entity resolution: ``foreachBatch`` turns every
    micro-batch of arriving conversations into an increment against the
    committed linkage state under ``state_dir`` — the streaming
    composition of ``pipeline.incremental.incremental_link`` (the
    daily-cadence batch step becomes a minutes-cadence one; SURVEY.md
    §2.10 extension).

    Committed state layout (all parquet; Iceberg snapshots in
    production):

      features_b{n}/   append-only per-batch increment feature rows
      keys_b{n}/       append-only per-batch increment blocking keys
      counts_b{n}/     FULL merged member counts as of batch n (narrow)
      clusters_b{n}/   FULL labeling as of batch n (narrow)
      _LATEST.json     atomic pointer {batch_id, feature_dirs, key_dirs,
                       counts, clusters} — rename-committed

    Exactly-once: the streaming checkpoint prevents re-processing on
    restart; a REPLAYED batch (crash between state write and checkpoint
    commit) overwrites its own ``*_b{n}`` dirs and re-points — and the
    step's re-delivery anti-join makes a duplicated conv a no-op, so
    recovery is idempotent. The corpus-sized tables are only ever
    APPENDED (features/keys); the per-batch rewrites are the two narrow
    tables (counts, labels).

    Precondition: each micro-batch must carry WHOLE conversations (turns
    of one conv_id must not straddle batches — a later fragment would be
    dropped as a re-delivery). Feed this from a conversation-complete
    upstream, e.g. ``streaming_canonicalize``'s idle-timeout output or a
    sessionized bronze table.

    Returns the StreamingQuery.
    """
    import json
    import os

    from pipeline.config import DEFAULT_CONFIG
    from pipeline.incremental import incremental_link
    from pipeline.linkage import build_plan, cluster_edges
    from pipeline.session import release_caches

    cfg = cfg or DEFAULT_CONFIG
    latest_path = os.path.join(state_dir, "_LATEST.json")

    def _read_latest():
        if not os.path.exists(latest_path):
            return None
        with open(latest_path) as f:
            return json.load(f)

    def _commit_latest(payload: dict) -> None:
        os.makedirs(state_dir, exist_ok=True)
        tmp = latest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(payload, f)
        os.replace(tmp, latest_path)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        state = _read_latest()
        fdir = os.path.join(state_dir, f"features_b{batch_id}")
        kdir = os.path.join(state_dir, f"keys_b{batch_id}")
        cdir = os.path.join(state_dir, f"counts_b{batch_id}")
        ldir = os.path.join(state_dir, f"clusters_b{batch_id}")
        if state is None:
            plan = build_plan(batch_df, cfg)
            clusters, _ = cluster_edges(plan["edges"], plan["features"])
            from pipeline.blocking import key_table_with_counts

            keys, counts = key_table_with_counts(plan["features"], cfg)
            plan["features"].write.mode("overwrite").parquet(fdir)
            keys.write.mode("overwrite").parquet(kdir)
            counts.write.mode("overwrite").parquet(cdir)
            clusters.write.mode("overwrite").parquet(ldir)
            feature_dirs, key_dirs = [fdir], [kdir]
        else:
            feats = spark.read.parquet(*state["feature_dirs"])
            keys = spark.read.parquet(*state["key_dirs"])
            counts = spark.read.parquet(state["counts"])
            clusters0 = spark.read.parquet(state["clusters"])
            out = incremental_link(
                feats, clusters0, batch_df, cfg,
                existing_keys=keys, existing_key_counts=counts,
            )
            # append-only commits for the corpus-sized state; full
            # rewrites only for the two narrow tables
            out["new_features"].write.mode("overwrite").parquet(fdir)
            new_keys_only = out["keys"].join(
                out["new_features"].select("conv_id"), "conv_id", "semi"
            )
            new_keys_only.write.mode("overwrite").parquet(kdir)
            out["key_counts"].write.mode("overwrite").parquet(cdir)
            out["clusters"].write.mode("overwrite").parquet(ldir)
            feature_dirs = state["feature_dirs"] + [fdir]
            key_dirs = state["key_dirs"] + [kdir]
        release_caches()
        _commit_latest(
            {
                "batch_id": batch_id,
                "feature_dirs": feature_dirs,
                "key_dirs": key_dirs,
                "counts": cdir,
                "clusters": ldir,
            }
        )

    stream = (
        spark.readStream.schema(TURNS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def arrival_stats_stream(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window: str = "1 minute",
    watermark: str = "2 minutes",
):
    """Watermarked windowed arrival stats (audit feed): turns per
    (event-time window, role); late data beyond the watermark dropped."""
    stream = (
        spark.readStream.schema(TURNS_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(input_dir)
    )
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "role")
        .agg(F.count(F.lit(1)).alias("n_turns"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "role",
            "n_turns",
        )
    )
    return (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
