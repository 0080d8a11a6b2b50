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
    # Dedup key = (conv_id, turn_idx, hash(text)), NOT the bare 64-bit
    # hash of the triple: with only the hash in the key, a birthday
    # collision (~2^32 rows at 100-TB scale) silently drops a distinct,
    # never-seen turn. Keeping the natural keys alongside the text hash
    # means a loss additionally requires identical conv_id AND turn_idx;
    # state stays small (two narrow keys + 8 bytes vs the full text).
    deduped = (
        stream.withColumn("text_hash", F.xxhash64("text"))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["conv_id", "turn_idx", "text_hash"])
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


CANON_STATE_SCHEMA = "turns ARRAY<STRUCT<turn_idx: INT, role: STRING, text: STRING>>"
CANON_OUT_SCHEMA = (
    "conv_id STRING, canonical_text STRING, n_turns INT, roles_sig STRING"
)


def streaming_canonicalize(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    idle_timeout_ms: int = 300_000,
    max_files_per_trigger: int = 8,
    continuous: bool = False,
    trigger_interval: str = "10 seconds",
):
    """Custom stateful streaming canonicalization via
    ``applyInPandasWithState``: turns arrive in any order across
    micro-batches; per-conv_id state accumulates (turn_idx, role, text);
    when the conversation goes idle for ``idle_timeout_ms`` of
    processing time the canonical document is emitted — same semantics
    as the batch canonicalizer (sort by turn_idx, \\x1e join),
    incrementally.

    ``idle_timeout_ms`` is the operator's ONE correctness knob: it must
    exceed the longest gap between a conversation's turn arrivals. A
    conversation that goes idle past the timeout and then resumes emits
    TWO partial documents (ProcessingTimeTimeout has no retraction), so
    size it to the ingestion SLA, not to zero — the default is 5
    minutes; tests pass small values deliberately. Two further
    consequences of the timeout contract: (a) a timeout only fires
    while batches run, so an ``availableNow`` pass leaves end-of-stream
    state unsent until a later pass (continuous deployments always have
    a next trigger; one-shot runs need a follow-up pass — see
    ``tests/test_streaming.py``); (b) turns of one conversation split
    ACROSS micro-batches merge through the keyed state
    (``state.exists`` below) as long as the gap between those batches
    stays under the timeout.

    Two deployment modes, because the no-data-micro-batch conf cuts BOTH
    ways (round-5 review):

    - ``continuous=False`` (default, the test/drain shape): one-shot
      ``availableNow`` pass with no-data micro-batches DISABLED for this
      query. Spark's ``FlatMapGroupsWithStateExec.shouldRunAnotherBatch``
      is unconditionally true under ProcessingTimeTimeout, so with
      no-data batches enabled an ``availableNow`` run never reaches
      termination — it spins empty micro-batches forever after the data
      is drained (observed as hundreds of checkpoint versions and a
      leaked CPU-burning query per test). Disabled, the drain terminates
      after the data batches; expired timers fire on the NEXT pass's
      batches (the sentinel-pass tests).
    - ``continuous=True`` (the production tail-the-bronze-stream shape):
      processing-time trigger every ``trigger_interval`` with no-data
      micro-batches LEFT ENABLED — an idle source still runs empty
      micro-batches, so ``idle_timeout_ms`` timers flush the last
      conversations without waiting for more data. Disabling the conf
      here would withhold the final documents of a quiet stream
      indefinitely; termination is not wanted in this mode, so the
      spin that breaks availableNow is exactly the behavior that makes
      the timeout contract hold.

    This is the streaming twin of ``pipeline.canonicalize.canonicalize``;
    the batch path stays authoritative (north rule: resumable batch), but
    a deployment that wants fresh canonical docs within minutes of
    arrival runs this against the bronze stream with ``continuous=True``.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def _sort_key(t):
        # Match batch canonicalize's array_sort over struct(turn_idx,
        # role, text) EXACTLY: ascending, per-field NULLS FIRST (verified
        # against Spark), full-struct comparison so duplicate turn_idx
        # values order deterministically instead of by arrival /
        # micro-batch split (which would silently diverge the canonical
        # text and exact-dup signature from the batch twin's).
        i, r, x = t
        return (
            i is not None, i if i is not None else 0,
            r is not None, r if r is not None else "",
            x is not None, x if x is not None else "",
        )

    def _opt(v):
        # nullable columns reach pandas as NaN (ints become float64) —
        # preserve SQL NULL instead of crashing int() on NaN (a single
        # null turn_idx row would otherwise wedge the stream permanently:
        # every replay of the poison micro-batch fails identically)
        return None if v is None or pd.isna(v) else v

    def _update(key, pdfs, state: GroupState):
        (conv_id,) = key
        if state.hasTimedOut:
            (turns,) = state.get
            state.remove()
            ordered = sorted(turns, key=_sort_key)
            yield pd.DataFrame(
                {
                    "conv_id": [conv_id],
                    "canonical_text": [
                        "\x1e".join(
                            (t[2] or "").replace("\x1e", " ")
                            for t in ordered
                        )
                    ],
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
                (
                    None if _opt(i) is None else int(i),
                    _opt(r),
                    _opt(x),
                )
                for i, r, x in zip(pdf["turn_idx"], pdf["role"], pdf["text"])
            )
        if state.exists:
            (prev,) = state.get
            rows = list(prev) + rows
        state.update((rows,))
        state.setTimeoutDuration(max(idle_timeout_ms, 1))
        return
        yield  # generator function with no batch output

    stream = (
        spark.readStream.schema(TURNS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )
    out = stream.groupBy("conv_id").applyInPandasWithState(
        _update,
        outputStructType=CANON_OUT_SCHEMA,
        stateStructType=CANON_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
    writer = (
        out.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if continuous:
        # no-data micro-batches stay at the session default (enabled):
        # they are what fires idle-timeout flushes on a quiet source
        return writer.trigger(processingTime=trigger_interval).start()
    # One-shot drain: set/restore around start(). StreamingQueryManager
    # clones the session synchronously inside start(), so the cloned
    # stream session keeps noDataMicroBatches=false for its whole life
    # while the caller's session is restored before this function
    # returns — scoped to THIS mode only (see docstring).
    conf_key = "spark.sql.streaming.noDataMicroBatches.enabled"
    try:
        prev = spark.conf.get(conf_key)
    except Exception:
        prev = None
    spark.conf.set(conf_key, "false")
    try:
        return writer.trigger(availableNow=True).start()
    finally:
        if prev is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, prev)


def _pointer_fs(spark: SparkSession, path_str: str):
    """(jvm, conf, fs, qualified Path) for the Hadoop FS owning ``path_str``.

    The state pointer must live on the SAME filesystem as the parquet
    state it references — driver-local ``open()`` silently diverges from
    the data on HDFS/S3 deployments (round-4 ADVICE)."""
    sc = spark.sparkContext
    jvm = sc._jvm
    conf = sc._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(path_str)
    fs = hpath.getFileSystem(conf)
    return jvm, conf, fs, fs.makeQualified(hpath)


def _pointer_read(spark: SparkSession, path_str: str):
    import json

    jvm, conf, fs, hpath = _pointer_fs(spark, path_str)
    if not fs.exists(hpath):
        return None
    stream = fs.open(hpath)
    try:
        data = bytes(stream.readAllBytes())
    finally:
        stream.close()
    return json.loads(data.decode("utf-8"))


def _pointer_commit(spark: SparkSession, path_str: str, payload: dict) -> None:
    """Write-then-atomic-rename through Hadoop ``FileContext`` (the
    ``Options.Rename.OVERWRITE`` API — atomic on HDFS and local FS;
    on S3A rename is copy+delete, so production object-store deployments
    should keep state in a table format with atomic commits, e.g. the
    Iceberg seam in ``pipeline.io``)."""
    import json

    jvm, conf, fs, hpath = _pointer_fs(spark, path_str)
    parent = hpath.getParent()
    if parent is not None:
        fs.mkdirs(parent)
    tmp = fs.makeQualified(jvm.org.apache.hadoop.fs.Path(path_str + ".tmp"))
    out = fs.create(tmp, True)
    try:
        out.write(json.dumps(payload).encode("utf-8"))
    finally:
        out.close()
    fc = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
        hpath.toUri(), conf
    )
    opts = spark.sparkContext._gateway.new_array(
        jvm.org.apache.hadoop.fs.Options.Rename, 1
    )
    opts[0] = jvm.org.apache.hadoop.fs.Options.Rename.OVERWRITE
    fc.rename(tmp, hpath, opts)


def _load_state(spark: SparkSession, state: dict):
    """Committed pointer dict -> (features, keys, counts, clusters)
    DataFrames, with tombstones applied.

    ``tombstones`` (written by ``retract_from_state``) is an ids-only
    parquet of retracted conversations: the corpus-sized feature/key
    dirs are append-only, so deletion is LOGICAL — an ids anti-join at
    load time — until ``compact_state`` physically rewrites. The
    tombstone table is bounded by retraction volume since the last
    compaction (deletion requests, not corpus-scale), hence the
    broadcast."""
    feats = spark.read.parquet(*state["feature_dirs"])
    keys = spark.read.parquet(*state["key_dirs"])
    tomb = state.get("tombstones")
    if tomb:
        tdf = F.broadcast(spark.read.parquet(tomb).select("conv_id"))
        feats = feats.join(tdf, "conv_id", "left_anti")
        keys = keys.join(tdf, "conv_id", "left_anti")
    counts = spark.read.parquet(state["counts"])
    clusters = spark.read.parquet(state["clusters"])
    return feats, keys, counts, clusters


def _load_edges(spark: SparkSession, state: dict):
    """Committed pointer dict -> the union (src, dst) match-edge table
    with tombstones applied to BOTH endpoints, or None for states
    committed before edges were part of the layout. Same append-only +
    logical-delete contract as features/keys."""
    dirs = state.get("edge_dirs")
    if not dirs:
        return None
    edges = spark.read.parquet(*dirs)
    tomb = state.get("tombstones")
    if tomb:
        tdf = F.broadcast(spark.read.parquet(tomb).select("conv_id"))
        edges = edges.join(
            tdf.withColumnRenamed("conv_id", "src"), "src", "left_anti"
        ).join(tdf.withColumnRenamed("conv_id", "dst"), "dst", "left_anti")
    return edges


def _load_dups(spark: SparkSession, state: dict):
    """Committed pointer dict -> the union ``(conv_id, rep_id, hit)``
    collapsed-member table (contracted states), tombstone-filtered on
    BOTH columns, or None when the state has no dup dirs. The ``rep_id``
    filter is what makes representative promotion read-consistent: a
    promoted class's superseded rows point at the tombstoned old rep and
    vanish at load, leaving only the re-pointed rows the promotion
    appended (``retract_from_state``)."""
    dirs = state.get("dup_dirs")
    if not dirs:
        return None
    dups = spark.read.parquet(*dirs)
    tomb = state.get("tombstones")
    if tomb:
        tdf = F.broadcast(spark.read.parquet(tomb).select("conv_id"))
        dups = dups.join(tdf, "conv_id", "left_anti").join(
            tdf.withColumnRenamed("conv_id", "rep_id"), "rep_id", "left_anti"
        )
    return dups


def _link_batch(
    spark: SparkSession, batch_df: DataFrame, batch_id: int,
    state_dir: str, cfg, contracted: bool = False,
) -> None:
    """One ``foreachBatch`` step of ``streaming_incremental_link``.

    Crash-safety contract (each window has a test in
    ``tests/test_streaming.py``):

    - crash BEFORE the pointer commit: the ``*_b{n}`` dirs written so far
      are unreferenced garbage; the replayed batch recomputes against the
      OLD pointer and overwrites them wholesale (every dir it writes
      carries this batch's id, so no committed dir is ever a write
      target);
    - crash AFTER the pointer commit but before the streaming checkpoint
      commit: the replayed batch sees ``state['batch_id'] >= batch_id``
      and returns immediately — committed state is never rewritten (a
      replay that re-ran would anti-join away its own convs and clobber
      its committed features/keys with empty tables).
    """
    import os

    from pipeline.incremental import incremental_link, incremental_link_contracted
    from pipeline.linkage import build_contracted_plan, build_plan, cluster_edges
    from pipeline.session import release_caches

    if batch_df.isEmpty():
        return
    latest_path = os.path.join(state_dir, "_LATEST.json")
    state = _pointer_read(spark, latest_path)
    if state is not None and int(state["batch_id"]) >= batch_id:
        # replay of an already-committed batch (crash landed between the
        # pointer rename and the checkpoint commit): nothing to do
        return
    if state is not None and bool(state.get("contracted", False)) != contracted:
        # rep-only vs full feature state are different contracts — a
        # flipped flag would silently corrupt the committed state (e.g.
        # an uncontracted step would treat the rep table as the full
        # corpus and re-add collapsed members as new docs)
        raise ValueError(
            f"state at {state_dir} was committed with contracted="
            f"{bool(state.get('contracted', False))}; don't flip the "
            f"mode mid-stream"
        )
    if state is not None and state.get("tombstones"):
        # A tombstoned conversation is DELETED, not merely hidden: an
        # at-least-once upstream replaying the very data a takedown
        # removed must not resurrect it. Without this filter the
        # re-delivery anti-join (which sees only tombstone-FILTERED
        # committed features) would admit the id as new — labeled in
        # clusters but invisible in every _load_state read, since the
        # tombstone anti-joins ALL dirs including post-retraction ones:
        # a half-resurrected id that can never match again and silently
        # splits to a singleton on the next retraction touching its
        # entity (round-5 review). Legitimate re-admission is an
        # explicit maintenance sequence: compact_state (clears the
        # tombstones) first, then ingest.
        tomb_ids = F.broadcast(
            spark.read.parquet(state["tombstones"]).select("conv_id")
        )
        batch_df = batch_df.join(tomb_ids, "conv_id", "left_anti")
        if batch_df.isEmpty():
            return
    fdir = os.path.join(state_dir, f"features_b{batch_id}")
    kdir = os.path.join(state_dir, f"keys_b{batch_id}")
    cdir = os.path.join(state_dir, f"counts_b{batch_id}")
    ldir = os.path.join(state_dir, f"clusters_b{batch_id}")
    adir = os.path.join(state_dir, f"anchors_b{batch_id}")
    edir = os.path.join(state_dir, f"edges_b{batch_id}")
    ddir = os.path.join(state_dir, f"dups_b{batch_id}")
    if state is None:
        from pipeline.blocking import key_table_with_counts, token_df

        if contracted:
            plan = build_contracted_plan(batch_df, cfg)
            # committed feature state holds REP rows only; the labeling
            # covers every doc (collapsed members ride dup_map edges)
            stored_feats = plan["rep_features"]
            # class-multiplicity-weighted (token, df) == token_df over
            # the FULL base corpus — the snapshot the rep pairing used
            anchor_snapshot = plan["anchor_df"]
        else:
            plan = build_plan(batch_df, cfg)
            stored_feats = plan["features"]
            # the same (token, df) stats candidate_pairs derived
            # internally — frozen here so every increment (and
            # retraction) blocks against base-population anchors
            # instead of recomputing df over its own tiny slice
            anchor_snapshot = token_df(plan["features"], cfg)
        # the batch's MATCH-EDGE contribution (src, dst) — append-only
        # like features/keys. Committing it is what makes
        # retract_from_state's zero-rescore mode possible (retract's
        # match_edges path: filter committed edges instead of
        # re-blocking + re-scoring survivors) — match edges are a small
        # fraction of pair volume and were being computed then thrown
        # away every batch (round-5 review). In contracted mode
        # plan["edges"] already includes the (rep, member) expansions.
        # Written FIRST and read back so the iterative CC below consumes
        # the parquet leaf instead of re-running the scoring subtree.
        plan["edges"].write.mode("overwrite").parquet(edir)
        clusters, _ = cluster_edges(
            spark.read.parquet(edir), plan["features"]
        )
        anchor_snapshot.write.mode("overwrite").parquet(adir)
        anchor_snapshot = spark.read.parquet(adir)
        # the committed keys MUST be built with the same anchor stats as
        # the pairing: unweighted token_df over rep rows only would
        # commit an anchor-key table inconsistent with the clusters
        keys, counts = key_table_with_counts(
            stored_feats, cfg, anchor_snapshot
        )
        stored_feats.write.mode("overwrite").parquet(fdir)
        keys.write.mode("overwrite").parquet(kdir)
        counts.write.mode("overwrite").parquet(cdir)
        clusters.write.mode("overwrite").parquet(ldir)
        edge_dirs = [edir]
        dup_dirs: list[str] = []
        if contracted:
            # (conv_id, rep_id, hit) per collapsed member — the audit
            # trail for docs that skipped the pair pipeline, and the
            # class enumeration a contracted-state takedown needs
            plan["dup_map"].withColumn("hit", F.lit(False)).write.mode(
                "overwrite"
            ).parquet(ddir)
            dup_dirs = [ddir]
        feature_dirs, key_dirs = [fdir], [kdir]
        anchors_dir = adir
    else:
        from pipeline.incremental import increment_tuning

        # a committed state WITHOUT edge dirs predates the match-edge
        # layout. Appending this batch's edges would commit edge_dirs
        # holding ONLY post-upgrade batches — retract_from_state would
        # then see a non-empty edge table and run its zero-rescore
        # repair over a graph missing every pre-upgrade match edge,
        # silently splitting old entities (round-5 review). Uncontracted
        # states stay pre-edges (retraction keeps the rescore
        # fallback); contracted states REQUIRE the complete layout.
        has_edges = bool(state.get("edge_dirs"))
        if contracted and (not has_edges or not state.get("dup_dirs")):
            raise ValueError(
                f"contracted state at {state_dir} is missing committed "
                "edge/dup dirs; representative promotion and the exact-"
                "dup short-circuit need the complete layout — rebuild "
                "the state (bootstrap commits both)"
            )
        feats, keys, counts, clusters0 = _load_state(spark, state)
        anchors_dir = state.get("anchors")
        adf = spark.read.parquet(anchors_dir) if anchors_dir else None
        with increment_tuning(spark):
            if contracted:
                out = incremental_link_contracted(
                    feats, clusters0, batch_df, cfg, anchor_df=adf,
                    existing_keys=keys, existing_key_counts=counts,
                )
                new_feats = out["new_rep_features"]
            else:
                out = incremental_link(
                    feats, clusters0, batch_df, cfg, anchor_df=adf,
                    existing_keys=keys, existing_key_counts=counts,
                )
                new_feats = out["new_features"]
            # append-only commits for the corpus-sized state; full
            # rewrites only for the two narrow tables
            new_feats.write.mode("overwrite").parquet(fdir)
            # the increment's key rows: the exact pre-cap ``nk`` the
            # step already built inside incremental_candidate_pairs —
            # returned as out["new_keys"] so the commit neither
            # re-explodes the increment nor re-joins the anchor
            # snapshot, and never semi-joins the FULL committed key
            # table (round-5 review; committed-state mode always
            # produces it)
            out["new_keys"].write.mode("overwrite").parquet(kdir)
            out["key_counts"].write.mode("overwrite").parquet(cdir)
            out["clusters"].write.mode("overwrite").parquet(ldir)
            # this batch's match-edge contribution: scored matches
            # (match_only scoring — every row IS an edge), plus in
            # contracted mode the (rep, member) expansions, mirroring
            # build_contracted_plan's edge semantics
            new_edges = out["scored"].select(
                F.col("conv_id_a").alias("src"),
                F.col("conv_id_b").alias("dst"),
            )
            if contracted:
                new_edges = new_edges.unionByName(
                    out["dup_assign"].select(
                        F.col("rep_id").alias("src"),
                        F.col("conv_id").alias("dst"),
                    )
                )
                out["dup_assign"].write.mode("overwrite").parquet(ddir)
            if has_edges:
                new_edges.write.mode("overwrite").parquet(edir)
        feature_dirs = state["feature_dirs"] + [fdir]
        key_dirs = state["key_dirs"] + [kdir]
        # pre-edges states stay pre-edges (see the guard above): never
        # start an edge list that would shadow the rescore fallback
        edge_dirs = state["edge_dirs"] + [edir] if has_edges else []
        dup_dirs = (
            state.get("dup_dirs", []) + [ddir] if contracted else
            state.get("dup_dirs", [])
        )
    release_caches()
    payload = {
        "batch_id": batch_id,
        "feature_dirs": feature_dirs,
        "key_dirs": key_dirs,
        "edge_dirs": edge_dirs,
        "counts": cdir,
        "clusters": ldir,
        # the state's mode is part of its contract: rep-only feature/key
        # state (contracted) must never be consumed by an uncontracted
        # step, and retraction routes by it (_retract_contracted_state's
        # representative promotion vs retract's survivor re-score)
        "contracted": contracted,
    }
    if dup_dirs:
        payload["dup_dirs"] = dup_dirs
    if anchors_dir:
        payload["anchors"] = anchors_dir
    if state is not None:
        # carry maintenance metadata (retraction tombstones, revision
        # counter) forward through increment commits
        if state.get("tombstones"):
            payload["tombstones"] = state["tombstones"]
        if state.get("rev"):
            payload["rev"] = state["rev"]
    _pointer_commit(spark, latest_path, payload)


def streaming_incremental_link(
    spark: SparkSession,
    input_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    cfg=None,
    max_files_per_trigger: int = 1,
    contracted: bool = False,
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
      edges_b{n}/      append-only per-batch MATCH edges (src, dst) —
                       the committed match graph; feeds
                       retract_from_state's zero-rescore mode
      dups_b{n}/       (contracted only) per-batch (conv_id, rep_id,
                       hit) — which collapsed members rode which rep:
                       the audit/enumeration table for docs that
                       skipped the pair pipeline
      counts_b{n}/     FULL merged member counts as of batch n (narrow)
      clusters_b{n}/   FULL labeling as of batch n (narrow)
      anchors_b0/      frozen (token, df) anchor snapshot of the BASE
                       corpus — every increment/retraction blocks
                       against these population statistics (the
                       incremental_link anchor_df contract); refresh by
                       rebuilding the base, never per-increment
      _LATEST.json     atomic pointer {batch_id, feature_dirs, key_dirs,
                       counts, clusters, contracted} — rename-committed through the
                       Hadoop FS API, so it lives on the SAME filesystem
                       as the parquet state (atomic on HDFS/local; on
                       S3A use an atomic table format instead)

    Exactly-once: the streaming checkpoint prevents re-processing on
    restart, and a REPLAYED batch (crash after the pointer rename but
    before the checkpoint commit) is detected by ``batch_id <=
    committed batch_id`` and skipped — committed state is never
    overwritten. A crash BEFORE the pointer rename leaves only
    unreferenced ``*_b{n}`` dirs, which the replay overwrites wholesale.
    See ``_link_batch`` for the per-window argument; both windows are
    crash-injected in ``tests/test_streaming.py``. The corpus-sized
    tables are only ever APPENDED (features/keys); the per-batch
    rewrites are the two narrow tables (counts, labels).

    Caveat: ``state_dir`` is bound to the streaming checkpoint's batch
    numbering — reusing a populated ``state_dir`` with a FRESH
    checkpoint restarts batch ids at 0 and the replay guard would skip
    them; always wipe or version the two together.

    Precondition: each micro-batch must carry WHOLE conversations (turns
    of one conv_id must not straddle batches — a later fragment would be
    dropped as a re-delivery). Feed this from a conversation-complete
    upstream, e.g. ``streaming_canonicalize``'s idle-timeout output or a
    sessionized bronze table.

    ``contracted=True`` (round-5): committed feature/key state holds only
    exact-dup class REPRESENTATIVES (``linkage.contract_exact_dups``) and
    every micro-batch runs ``incremental_link_contracted`` — an arriving
    conversation whose ``(norm_text, roles_sig)`` signature is already
    committed never enters blocking or scoring, it rides one broadcast
    hash join into its twin's entity. At 100 TB this is the dominant
    arrival shape (boilerplate re-sends), so the steady-state cost per
    duplicate arrival drops from a full pair-pipeline pass to one narrow
    lookup; committed state stays contracted forever (state size tracks
    DISTINCT signatures, not arrivals). Labels remain equal to the plain
    batch run — same theorem as the batch contraction, pinned by
    ``tests/test_streaming.py``. A populated ``state_dir`` is bound to
    its mode: don't flip ``contracted`` mid-stream (rep-only vs full
    feature state are different contracts).

    Returns the StreamingQuery.
    """
    from pipeline.config import DEFAULT_CONFIG

    cfg = cfg or DEFAULT_CONFIG

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        _link_batch(
            spark, batch_df, batch_id, state_dir, cfg, contracted=contracted
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


# -- committed-state maintenance: retraction, compaction, vacuum -------------
# The continuous-ER state machine is: increments APPEND (features/keys),
# retractions TOMBSTONE (logical delete + label repair), compactions
# REWRITE (fold the dir list and drop tombstoned rows). All three commit
# through the same atomic pointer rename as the stream itself, so a crash
# at any point leaves the previous committed state fully readable.


def retract_from_state(
    spark: SparkSession, state_dir: str, remove_ids, cfg=None
) -> dict:
    """Delete conversations from a committed ``streaming_incremental_link``
    state and repair the labeling — the operational form of
    ``pipeline.incremental.retract`` / ``retract_contracted``
    (right-to-be-forgotten / takedown requests against the
    continuously-maintained entity state). Both state modes are
    supported: CONTRACTED states route through representative promotion
    (``_retract_contracted_state`` below).

    Run with the stream STOPPED (maintenance window): the pointer rename
    is atomic, but a concurrently-running increment would commit a
    pointer that resurrects the retracted ids' features.

    Deletion is LOGICAL for the corpus-sized tables: the removed ids are
    appended to the tombstone table and every subsequent ``_load_state``
    anti-joins them out of features/keys/edges; only the two NARROW
    tables (clusters — repaired entity-bounded, see ``retract`` — and
    key counts) are rewritten. A tombstoned id is DELETED for good:
    ``_link_batch`` drops it from every later increment, so an upstream
    replay cannot resurrect it (re-admit via ``compact_state`` first).
    States carrying ``edge_dirs`` repair connectivity by FILTERING the
    committed match edges (``retract``'s zero-rescore ``match_edges``
    mode); pre-edges layouts fall back to entity-bounded re-scoring.
    Physical reclamation is
    ``compact_state``. Crash-safe: all dirs are written under a fresh
    revision suffix, the pointer renames last; idempotent — re-running
    the same removal finds no affected entities and commits an identical
    labeling under a new revision.

    ``remove_ids``: DataFrame with a ``conv_id`` column, or an iterable
    of id strings. Returns the committed pointer dict.
    """
    import os

    from pipeline.config import DEFAULT_CONFIG
    from pipeline.incremental import increment_tuning, retract

    cfg = cfg or DEFAULT_CONFIG
    latest_path = os.path.join(state_dir, "_LATEST.json")
    state = _pointer_read(spark, latest_path)
    if state is None:
        raise ValueError(f"no committed state at {state_dir}")
    if not isinstance(remove_ids, DataFrame):
        remove_ids = spark.createDataFrame(
            [(str(i),) for i in remove_ids], "conv_id string"
        )
    if state.get("contracted"):
        return _retract_contracted_state(
            spark, state_dir, latest_path, state, remove_ids, cfg
        )

    feats, keys, counts, clusters = _load_state(spark, state)

    anchors_dir = state.get("anchors")
    adf = spark.read.parquet(anchors_dir) if anchors_dir else None
    # committed match edges (layouts from the edges_b{n} era): the
    # zero-rescore path — retraction filters the committed edge table to
    # survivors of affected entities instead of re-featurizing +
    # re-blocking + re-scoring them (retract's match_edges mode, "the
    # 100-TB path"). Older states without edge_dirs fall back to the
    # re-scoring mode.
    match_edges = _load_edges(spark, state)
    with increment_tuning(spark):
        out = retract(
            feats, clusters, remove_ids, cfg, anchor_df=adf,
            match_edges=match_edges,
            existing_keys=keys, existing_key_counts=counts,
        )
        return _commit_retraction(
            spark, state_dir, latest_path, state, out, contracted=False
        )


def _commit_retraction(
    spark: SparkSession,
    state_dir: str,
    latest_path: str,
    state: dict,
    out: dict,
    *,
    contracted: bool,
    promoted=(),
) -> dict:
    """Shared commit tail for BOTH retraction modes — the crash/commit
    protocol lives here and only here (round-5 review: the contracted
    path had copied this sequence and the two copies had already started
    to drift). Call inside ``increment_tuning``.

    Tombstones accumulate (union with the committed table) until
    compaction; clusters/key counts are narrow full rewrites — the same
    cadence the stream itself pays. ``promoted`` is a sequence of
    ``(df, dir_suffix, payload_dirs_key)`` promotion deltas (contracted
    mode): each is written to ``{dir_suffix}_rev{rev}`` and APPENDED to
    the payload's dir list, keeping the corpus-sized tables append-only.
    Everything lands under a fresh revision suffix; the pointer renames
    last, so a crash anywhere before that leaves the previous committed
    state fully readable.
    """
    import os

    from pipeline.session import release_caches

    rev = int(state.get("rev", 0)) + 1
    tdir = os.path.join(state_dir, f"tombstones_rev{rev}")
    cdir = os.path.join(state_dir, f"counts_rev{rev}")
    ldir = os.path.join(state_dir, f"clusters_rev{rev}")
    tomb = out["removed"].select("conv_id")
    if state.get("tombstones"):
        tomb = tomb.unionByName(
            spark.read.parquet(state["tombstones"]).select("conv_id")
        ).distinct()
    tomb.write.mode("overwrite").parquet(tdir)
    out["clusters"].write.mode("overwrite").parquet(ldir)
    out["key_counts"].write.mode("overwrite").parquet(cdir)
    payload = {
        "batch_id": state["batch_id"],
        "feature_dirs": list(state["feature_dirs"]),
        "key_dirs": list(state["key_dirs"]),
        "counts": cdir,
        "clusters": ldir,
        "tombstones": tdir,
        "rev": rev,
        "contracted": contracted,
    }
    # edge/dup dirs stay append-only: removed ids are tombstone-filtered
    # at load (_load_edges / _load_dups); compact_state reclaims
    if state.get("edge_dirs"):
        payload["edge_dirs"] = list(state["edge_dirs"])
    if state.get("dup_dirs"):
        payload["dup_dirs"] = list(state["dup_dirs"])
    for df, suffix, dirs_key in promoted:
        pdir = os.path.join(state_dir, f"{suffix}_rev{rev}")
        df.write.mode("overwrite").parquet(pdir)
        payload[dirs_key] = payload.get(dirs_key, []) + [pdir]
    if state.get("anchors"):
        payload["anchors"] = state["anchors"]
    # never-silent: requested ids that matched no committed doc are NOT
    # tombstoned (they would blackhole a future first ingestion) — they
    # are counted into the committed pointer so the no-op is auditable
    if out.get("unmatched") is not None:
        n_unmatched = out["unmatched"].count()
        if n_unmatched:
            payload["unmatched_removed"] = n_unmatched
    release_caches()
    _pointer_commit(spark, latest_path, payload)
    return payload


def _retract_contracted_state(
    spark: SparkSession,
    state_dir: str,
    latest_path: str,
    state: dict,
    remove_ids: DataFrame,
    cfg,
) -> dict:
    """``retract_from_state`` for CONTRACTED (rep-only) states —
    representative promotion over the committed layout.

    The committed tables stay append-only + tombstoned exactly like an
    increment commit: the removal set joins the tombstone table (which
    hides the retracted docs AND every superseded row of a promoted
    class — old-rep feature/key rows, old-rep-endpoint edges, old-rep
    dup rows — at load time via ``_load_state`` / ``_load_edges`` /
    ``_load_dups``), and the promotion DELTAS (the class's rows
    re-issued under the new rep, ``incremental.retract_contracted``) are
    appended as one fresh revision-suffixed dir per table. Clusters and
    key counts are narrow full rewrites, as everywhere else. Crash-safe
    and idempotent via the shared ``_commit_retraction`` tail — a re-run
    finds the ids already tombstoned, promotes nothing, and commits an
    identical labeling under a new revision.
    """
    from pipeline.incremental import increment_tuning, retract_contracted

    # cfg is already defaulted by the only caller (retract_from_state)
    match_edges = _load_edges(spark, state)
    if match_edges is None:
        raise ValueError(
            f"contracted state at {state_dir} has no committed edge dirs; "
            "representative promotion rewrites committed match edges and "
            "cannot run without them (pre-edges layouts: rebuild the "
            "state uncontracted)"
        )
    feats, keys, counts, clusters = _load_state(spark, state)
    dups = _load_dups(spark, state)
    if dups is None:
        dups = spark.createDataFrame(
            [], "conv_id string, rep_id string, hit boolean"
        )
    with increment_tuning(spark):
        out = retract_contracted(
            feats, clusters, dups, remove_ids, cfg,
            match_edges=match_edges,
            existing_keys=keys, existing_key_counts=counts,
        )
        return _commit_retraction(
            spark, state_dir, latest_path, state, out, contracted=True,
            promoted=(
                (out["promoted_features"], "features_prom", "feature_dirs"),
                (out["promoted_keys"], "keys_prom", "key_dirs"),
                (out["promoted_edges"], "edges_prom", "edge_dirs"),
                (
                    out["promoted_dups"].select("conv_id", "rep_id", "hit"),
                    "dups_prom",
                    "dup_dirs",
                ),
            ),
        )


def compact_state(spark: SparkSession, state_dir: str) -> dict:
    """Fold a committed state's per-batch feature/key dir lists into one
    dir each, physically dropping tombstoned rows, and clear the
    tombstone table. Labels and logical content are unchanged — this is
    pure layout hygiene: a long-running stream accumulates one dir per
    micro-batch (small-file pressure + O(batches) listing per load) and
    every retraction leaves logically-deleted rows on disk until here.

    Run with the stream STOPPED. Crash-safe via the same
    write-new-revision-then-rename-pointer protocol; after the pointer
    commit the superseded dirs are unreferenced garbage for
    ``vacuum_state``. Returns the committed pointer dict.
    """
    import os

    latest_path = os.path.join(state_dir, "_LATEST.json")
    state = _pointer_read(spark, latest_path)
    if state is None:
        raise ValueError(f"no committed state at {state_dir}")
    feats, keys, _, _ = _load_state(spark, state)
    rev = int(state.get("rev", 0)) + 1
    fdir = os.path.join(state_dir, f"features_compact_rev{rev}")
    kdir = os.path.join(state_dir, f"keys_compact_rev{rev}")
    feats.write.mode("overwrite").parquet(fdir)
    keys.write.mode("overwrite").parquet(kdir)
    payload = {
        "batch_id": state["batch_id"],
        "feature_dirs": [fdir],
        "key_dirs": [kdir],
        "counts": state["counts"],
        "clusters": state["clusters"],
        "rev": rev,
        "contracted": bool(state.get("contracted", False)),
    }
    # Edges MUST compact through the same tombstone filter BEFORE the
    # tombstones are cleared: the anti-join that hides a retracted id's
    # edges lives at load time, so folding the raw dirs and dropping the
    # tombstone table in one commit would resurrect every edge touching
    # a removed endpoint.
    edges = _load_edges(spark, state)
    if edges is not None:
        edir = os.path.join(state_dir, f"edges_compact_rev{rev}")
        edges.write.mode("overwrite").parquet(edir)
        payload["edge_dirs"] = [edir]
    # same load-time filter as every dup reader (_load_dups): the rep_id
    # anti-join must run BEFORE the tombstones are cleared, or a promoted
    # class's superseded old-rep rows would resurrect
    dups = _load_dups(spark, state)
    if dups is not None:
        ddir = os.path.join(state_dir, f"dups_compact_rev{rev}")
        dups.write.mode("overwrite").parquet(ddir)
        payload["dup_dirs"] = [ddir]
    if state.get("anchors"):
        payload["anchors"] = state["anchors"]
    _pointer_commit(spark, latest_path, payload)
    return payload


def vacuum_state(spark: SparkSession, state_dir: str) -> list[str]:
    """Delete state subdirectories no longer referenced by the committed
    pointer (superseded by compaction / retraction revisions or orphaned
    by a crash before a pointer commit). Run ONLY with the stream
    stopped — an in-flight micro-batch writes its dirs BEFORE the
    pointer references them, and vacuum would eat them. Idempotent.
    Returns the deleted paths."""
    import os

    latest_path = os.path.join(state_dir, "_LATEST.json")
    state = _pointer_read(spark, latest_path)
    if state is None:
        raise ValueError(f"no committed state at {state_dir}")
    keep = {
        os.path.basename(p)
        for p in (
            state["feature_dirs"]
            + state["key_dirs"]
            + state.get("edge_dirs", [])
            + state.get("dup_dirs", [])
            + [state["counts"], state["clusters"]]
            + ([state["tombstones"]] if state.get("tombstones") else [])
            + ([state["anchors"]] if state.get("anchors") else [])
        )
    }
    jvm, conf, fs, root = _pointer_fs(spark, state_dir)
    deleted: list[str] = []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if st.isDirectory() and name not in keep:
            fs.delete(st.getPath(), True)
            deleted.append(name)
    return deleted
