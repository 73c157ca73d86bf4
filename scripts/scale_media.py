"""Media-codec family scale run.

Generates media payloads ON EXECUTORS (mapInPandas over a range — no
driver-side fixture list), then drives each real pure-stdlib codec pipeline
end-to-end and reports wall time + items/s + decoded MB/s. This is the
100 TB evidence for the multimodal family: every stage is a narrow Arrow
kernel over the payload column, so throughput scales with scan parallelism
and the numbers here are per-32-core-node rates.

Usage: python scripts/scale_media.py [n_images n_audio n_video]
Writes BENCH/raw/scale_media_codecs.json.
"""

from __future__ import annotations

import json
import sys
import time
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from halvesting_geometric_spark.operators import media_analysis as MA
from halvesting_geometric_spark.operators import multimodal as MM

N_IMG = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
N_AUD = int(sys.argv[2]) if len(sys.argv) > 2 else 150_000
N_VID = int(sys.argv[3]) if len(sys.argv) > 3 else 30_000

spark = (
    SparkSession.builder.master("local[32]")
    .appName("scale_media")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", "48g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")


def gen_media(n: int, kind: str, parts: int = 64):
    """Distributed fixture table: payload built per-row on executors."""

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for i in pdf["id"]:
                i = int(i)
                if kind == "image":
                    # rotate through the three real image codecs
                    # multiples of 16 so the ViT patchify stage accepts them
                    w, h = 48 + (i % 3) * 16, 48 + (i % 5) * 16
                    fmt = i % 3
                    if fmt == 0:
                        p = MM.png_full_bytes(w, h, seed=i % 251, color_type=2)
                        f = "png"
                    elif fmt == 1:
                        p = MM.gif_full_bytes(w, h, seed=i % 251)
                        f = "gif"
                    else:
                        # JPEG tiles are 8x8; keep dims multiple of 8
                        w, h = (w // 8) * 8, (h // 8) * 8
                        p = MM.jpeg_full_bytes(w, h, seed=i % 251)
                        f = "jpeg"
                    meta = (f, w, h, None)
                elif kind == "audio":
                    n_samp = 2000 + (i % 7) * 500
                    p = MM.wav_full_bytes(1, 8000, n_samp, seed=i % 251)
                    meta = ("wav", None, None, n_samp * 1000 // 8000)
                else:
                    p = MM.avi_mjpeg_bytes(32, 32, 4, seed=i % 251)
                    meta = ("avi", 32, 32, 400)
                out.append((i, kind, p, meta))
            yield pd.DataFrame(
                out, columns=["media_id", "kind", "payload", "meta"]
            )

    return (
        spark.range(0, n, 1, parts)
        .mapInPandas(build, schema=MM.MEDIA_SCHEMA)
    )


def timed(name: str, df, bytes_col_df=None):
    t0 = time.time()
    row = df.agg(F.count("*").alias("n")).collect()[0]
    w = time.time() - t0
    return name, w, int(row["n"])


results: dict = {}

# --- images: decode-dispatch resize pipeline (decode + downscale + re-encode)
img = gen_media(N_IMG, "image").persist()
n_img = img.count()  # materialize generation outside the timed window
img_bytes = img.agg(F.sum(F.length("payload"))).collect()[0][0]

t0 = time.time()
resized = MM.resize_images(img, factor=2)
agg = resized.agg(
    F.count("*").alias("n"), F.sum(F.length("payload")).alias("out_bytes")
).collect()[0]
w = time.time() - t0
results["resize_images"] = {
    "wall_s": round(w, 1),
    "items": int(agg["n"]),
    "in_mb": round(img_bytes / 1e6, 1),
    "items_per_sec": int(agg["n"] / w),
    "decoded_mb_per_sec": round(img_bytes / 1e6 / w, 1),
}

# --- images: ViT patchify (decode + patch-token means)
t0 = time.time()
n_patches = MA.patchify(img, patch=16).count()
w = time.time() - t0
results["patchify16"] = {
    "wall_s": round(w, 1),
    "images": n_img,
    "patch_rows": int(n_patches),
    "images_per_sec": int(n_img / w),
}
img.unpersist()

# --- audio: PCM decode + autocorrelation pitch
aud = gen_media(N_AUD, "audio").persist()
n_aud = aud.count()
aud_bytes = aud.agg(F.sum(F.length("payload"))).collect()[0][0]
t0 = time.time()
n_pitch = MA.pitch_estimate(aud, max_lag=8).count()
w = time.time() - t0
results["pitch_estimate"] = {
    "wall_s": round(w, 1),
    "clips": n_aud,
    "rows": int(n_pitch),
    "clips_per_sec": int(n_aud / w),
    "pcm_mb_per_sec": round(aud_bytes / 1e6 / w, 1),
}
aud.unpersist()

# --- video: AVI walk + per-frame JPEG decode + frame differencing
vid = gen_media(N_VID, "video", parts=32).persist()
n_vid = vid.count()
vid_bytes = vid.agg(F.sum(F.length("payload"))).collect()[0][0]
t0 = time.time()
n_frames = MM.video_frame_stats(vid).count()
w1 = time.time() - t0
t0 = time.time()
n_diffs = MA.frame_diff_stats(vid).count()
w2 = time.time() - t0
results["video_frames"] = {
    "wall_s": round(w1, 1),
    "videos": n_vid,
    "frames": int(n_frames),
    "frames_per_sec": int(n_frames / w1),
    "container_mb_per_sec": round(vid_bytes / 1e6 / w1, 1),
}
results["frame_diffs"] = {
    "wall_s": round(w2, 1),
    "videos": n_vid,
    "diff_rows": int(n_diffs),
    "frames_per_sec": int(n_vid * 4 / w2),
}
vid.unpersist()

out = "/root/repo/BENCH/raw/scale_media_codecs.json"
with open(out, "w") as f:
    json.dump(results, f, indent=1)
print(json.dumps(results, indent=1))
spark.stop()
