"""applyInPandasWithState: per-conversation streaming dedup across batches."""

from __future__ import annotations

from halvesting_geometric_spark.datagen import generate_transcripts
from halvesting_geometric_spark.operators.extract import extract_conv_edges
from halvesting_geometric_spark.schemas import TRANSCRIPTS_SCHEMA
from halvesting_geometric_spark.streaming.stateful import streaming_dedup_edges


def test_stateful_streaming_dedup_across_batches(spark, tmp_path):
    tr_dir = str(tmp_path / "tr")
    out_dir = str(tmp_path / "out")
    ck_dir = str(tmp_path / "ck")

    def drain():
        stream = spark.readStream.schema(TRANSCRIPTS_SCHEMA).parquet(tr_dir)
        q = (
            streaming_dedup_edges(stream)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ck_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    full = generate_transcripts(spark, 40, seed=12)
    # batch 1: first 2 turns of each conversation; batch 2: the rest —
    # duplicate refs across batches must NOT re-emit (state carries the set)
    full.filter("turn_idx < 2").write.parquet(tr_dir)
    drain()
    full.filter("turn_idx >= 2").write.mode("append").parquet(tr_dir)
    drain()

    got = spark.read.parquet(out_dir).toPandas()
    # exactly the batch-dedup result: one row per distinct (src, dst)
    assert got.duplicated(["src_conv", "dst_conv"]).sum() == 0
    exp = extract_conv_edges(full).toPandas()
    assert set(zip(got.src_conv, got.dst_conv)) == set(
        zip(exp.src_conv, exp.dst_conv)
    )
    # first_seen_turn is the earliest turn containing that ref
    import re

    pat = re.compile(r"\[\[ref:([^\]]+)\]\]")
    pdf = full.toPandas().sort_values(["conv_id", "turn_idx"])
    first_seen: dict[tuple, int] = {}
    for _, row in pdf.iterrows():
        for d in pat.findall(row.text or ""):
            first_seen.setdefault((row.conv_id, d), row.turn_idx)
    got_map = {
        (r.src_conv, r.dst_conv): r.first_seen_turn for r in got.itertuples()
    }
    assert got_map == first_seen
