"""Running vertex degrees over a growing transcripts table (engine-new).

The batch engine recomputes degrees from the full edge table; when
transcripts stream in at 10¹²-turn scale that rescan is the bottleneck, so
this maintains degree counts *incrementally* with the log-structured
merge-on-read pattern. Log layout under one root:

    <root>/live/batch_id=<N>/   per-micro-batch degree DELTAS (appended by
                                the stream; overwrite-per-batch → a retried
                                micro-batch replaces itself, so the
                                checkpointed file-source offsets give
                                exactly-once end to end)
    <root>/base/gen=<k>/        folded absolute counts (one generation per
                                compaction)
    <root>/MANIFEST-<k>.json    pointer {gen, folded_upto}; readers use the
                                highest-numbered parsable manifest

Correctness comes from the MANIFEST, not from deletion: readers use
base/gen=<gen> plus only live partitions with batch_id > folded_upto
(micro-batch ids are strictly increasing under one checkpoint), so a crash
anywhere inside compaction leaves either the old manifest (old base + all
live — consistent) or the new one (new base + the not-yet-folded live —
consistent); removing folded partitions, stale generations and superseded
manifests is merely garbage collection, retried on the next compaction.
Manifests are *monotonically versioned*, never updated in place: a new
generation lands as a brand-new MANIFEST-<k>.json (tmp-write + rename to a
name that does not exist yet), so there is no delete/rename gap in which no
manifest exists — a crash at any point leaves the previous highest manifest
readable. As a last-ditch guard, GC refuses to delete base generations when
no manifest is readable at all. All filesystem access goes through the
Hadoop FileSystem API, so hdfs://, s3a:// and plain local paths all work;
single-writer compaction is assumed on S3 (rename is copy+delete there —
or land the same dataflow as an Iceberg MERGE, the intended production
target).

The reference is batch-only (SURVEY §2.10); no parity requirement.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from halvesting_geometric_spark.streaming.ingest import stream_conv_edges

_DELTA_SCHEMA = "src_conv string, out_deg_delta long"


def _fs(spark: SparkSession, path: str):
    """(Hadoop FileSystem, Path) for any scheme the session supports."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def _exists(spark: SparkSession, path: str) -> bool:
    fs, p = _fs(spark, path)
    return bool(fs.exists(p))


def _list_dirs(spark: SparkSession, path: str) -> list[str]:
    fs, p = _fs(spark, path)
    if not fs.exists(p):
        return []
    return [
        st.getPath().getName()
        for st in fs.listStatus(p)
        if st.isDirectory()
    ]


def _delete(spark: SparkSession, path: str) -> None:
    fs, p = _fs(spark, path)
    fs.delete(p, True)


def _manifest_versions(spark: SparkSession, root: str) -> list[int]:
    """Versions of all MANIFEST-<n>.json files under root, ascending."""
    fs, p = _fs(spark, root)
    if not fs.exists(p):
        return []
    out = []
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if name.startswith("MANIFEST-") and name.endswith(".json"):
            try:
                out.append(int(name[len("MANIFEST-"):-len(".json")]))
            except ValueError:
                continue
    return sorted(out)


def _write_manifest(spark: SparkSession, root: str, gen: int, upto: int) -> None:
    """tmp-write + rename to a NEW versioned name — the previous manifest is
    never touched, so readers always find one (see module docstring)."""
    fs, _ = _fs(spark, root)
    jvm = spark._jvm
    tmp = jvm.org.apache.hadoop.fs.Path(f"{root}/_MANIFEST-{gen}.tmp")
    final = jvm.org.apache.hadoop.fs.Path(f"{root}/MANIFEST-{gen}.json")
    out = fs.create(tmp, True)
    out.write(bytearray(json.dumps({"gen": gen, "folded_upto": upto}).encode()))
    out.close()
    # only a crashed retry of THIS generation can leave the target present;
    # deleting it is safe because the previous generation's manifest remains
    if fs.exists(final):
        fs.delete(final, False)
    fs.rename(tmp, final)
    # GC superseded manifests (legacy unversioned + lower versions); a crash
    # mid-loop leaves extras that readers ignore (max-version wins)
    legacy = jvm.org.apache.hadoop.fs.Path(f"{root}/MANIFEST.json")
    if fs.exists(legacy):
        fs.delete(legacy, False)
    for n in _manifest_versions(spark, root):
        if n < gen:
            _delete(spark, f"{root}/MANIFEST-{n}.json")


def _read_one_manifest(spark: SparkSession, path: str) -> tuple[int | None, int]:
    # a tiny Spark text read instead of py4j stream plumbing: works on any
    # Hadoop-supported filesystem with no byte-array marshalling pitfalls
    rows = spark.read.text(path).collect()
    try:
        m = json.loads("".join(r["value"] for r in rows))
        return int(m["gen"]), int(m["folded_upto"])
    except (ValueError, KeyError):
        return None, -1


def _read_manifest(spark: SparkSession, root: str) -> tuple[int | None, int]:
    """(gen or None, folded_upto) from the highest-numbered parsable
    manifest, falling back to the legacy unversioned MANIFEST.json, else
    (None, -1) — no base, nothing folded: the pre-compaction state."""
    for n in reversed(_manifest_versions(spark, root)):
        gen, upto = _read_one_manifest(spark, f"{root}/MANIFEST-{n}.json")
        if gen is not None:
            return gen, upto
    if _exists(spark, f"{root}/MANIFEST.json"):
        return _read_one_manifest(spark, f"{root}/MANIFEST.json")
    return None, -1


def degree_deltas_available_now(
    spark: SparkSession,
    transcripts_path: str,
    log_root: str,
    checkpoint_dir: str,
) -> None:
    """Drain currently-available transcript files into the degree-delta log
    and stop (Trigger.AvailableNow). Re-running after new files land
    processes only the new files."""
    edges = stream_conv_edges(spark, transcripts_path)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        delta = batch_df.groupBy("src_conv").agg(
            F.count("*").alias("out_deg_delta")
        )
        # per-batch directory + overwrite = idempotent on micro-batch retry
        delta.write.mode("overwrite").parquet(
            f"{log_root}/live/batch_id={batch_id}"
        )

    q = (
        edges.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _live_parts(
    spark: SparkSession, log_root: str, folded_upto: int
) -> tuple[DataFrame | None, list[int]]:
    """Un-folded live deltas as one frame + the batch ids it covers."""
    ids = sorted(
        int(d.split("=", 1)[1])
        for d in _list_dirs(spark, f"{log_root}/live")
        if d.startswith("batch_id=")
    )
    fresh = [b for b in ids if b > folded_upto]
    if not fresh:
        return None, []
    df = (
        spark.read.schema(_DELTA_SCHEMA)
        .parquet(*[f"{log_root}/live/batch_id={b}" for b in fresh])
        .select("src_conv", "out_deg_delta")
    )
    return df, fresh


def read_running_degrees(spark: SparkSession, log_root: str) -> DataFrame:
    """Merge-on-read view of the delta log: (src_conv, out_deg). An absent
    or empty log reads as zero rows."""
    gen, upto = _read_manifest(spark, log_root)
    parts: list[DataFrame] = []
    if gen is not None and _exists(spark, f"{log_root}/base/gen={gen}"):
        parts.append(
            spark.read.schema(_DELTA_SCHEMA)
            .parquet(f"{log_root}/base/gen={gen}")
            .select("src_conv", "out_deg_delta")
        )
    live, _ = _live_parts(spark, log_root, upto)
    if live is not None:
        parts.append(live)
    if not parts:
        return spark.createDataFrame([], "src_conv string, out_deg long")
    log = parts[0]
    for p in parts[1:]:
        log = log.unionByName(p)
    return log.groupBy("src_conv").agg(
        F.sum("out_deg_delta").cast("long").alias("out_deg")
    )


def compact_degree_deltas(spark: SparkSession, log_root: str) -> int:
    """Fold base + the currently un-folded live partitions into a new base
    generation and atomically advance the manifest. Returns the number of
    live partitions folded. Crash-safe (see module docstring); folded
    partitions and stale generations are garbage-collected best-effort here
    and again on the next compaction."""
    gen, upto = _read_manifest(spark, log_root)
    live, fresh = _live_parts(spark, log_root, upto)
    # GC debris from any earlier crash/partial cleanup first
    for d in _list_dirs(spark, f"{log_root}/live"):
        if d.startswith("batch_id=") and int(d.split("=", 1)[1]) <= upto:
            _delete(spark, f"{log_root}/live/{d}")
    # gen is None means NO manifest was readable — never GC base history on
    # that signal alone (a lost/corrupt manifest must not cascade into
    # deleting every folded generation); stale gens get collected on the
    # next compaction once a manifest exists again
    if gen is not None:
        for d in _list_dirs(spark, f"{log_root}/base"):
            if d != f"gen={gen}":
                _delete(spark, f"{log_root}/base/{d}")
    if live is None:
        return 0
    parts = [live]
    if gen is not None and _exists(spark, f"{log_root}/base/gen={gen}"):
        parts.append(
            spark.read.schema(_DELTA_SCHEMA)
            .parquet(f"{log_root}/base/gen={gen}")
            .select("src_conv", "out_deg_delta")
        )
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p)
    folded = merged.groupBy("src_conv").agg(
        F.sum("out_deg_delta").alias("out_deg_delta")
    )
    new_gen = 0 if gen is None else gen + 1
    folded.write.mode("overwrite").parquet(f"{log_root}/base/gen={new_gen}")
    _write_manifest(spark, log_root, new_gen, max(fresh))
    # best-effort cleanup; a crash here only leaves excluded debris
    for b in fresh:
        _delete(spark, f"{log_root}/live/batch_id={b}")
    if gen is not None:
        _delete(spark, f"{log_root}/base/gen={gen}")
    return len(fresh)
