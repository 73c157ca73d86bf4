"""Media ANALYSIS over real decodes: ViT patchify, video frame differencing
(scene cuts), integer audio autocorrelation (pitch).

These are the preprocessing operators a multimodal training pipeline runs
after decode: images become fixed-size patch tokens (ViT), videos become
shot/scene segments via frame differencing, audio becomes pitch/periodicity
features. Every operator here consumes the REAL pure-stdlib codecs in
:mod:`multimodal` (signature-dispatch image decode, AVI/MJPEG frame decode,
WAV PCM16 decode) and reduces to EXACT integer statistics, so each has a
bit-exact DuckDB oracle twin over closed-form fixtures.

Scale: all three are Arrow-batched ``mapInPandas`` over the binary column —
narrow (no shuffle), so a 100 TB media table processes at scan parallelism;
per-item output is bounded (patch grid, frame count, lag count), never a
cross join. Reference scope: the reference engine has no media path at all
(halvesting_geometric is text/graph only) — this extends the engine-new
multimodal surface.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from halvesting_geometric_spark.operators.multimodal import (
    decode_avi,
    decode_image,
    decode_wav,
)

PATCH_SCHEMA = (
    "media_id long, py int, px int, patch_sum long, patch_min int, "
    "patch_max int, mean_e6 long"
)


def patchify(media: DataFrame, patch: int = 16) -> DataFrame:
    """ViT-style patch extraction over REAL decoded images: signature-
    dispatch decode (PNG/GIF/baseline-JPEG), split into a ``patch×patch``
    grid, one output row per patch with exact integer stats over all
    channel values (sum/min/max and the e6 fixed-point mean — the "patch
    token" a vision tower would embed). Image dims must be multiples of
    ``patch`` (standard ViT preprocessing resizes first —
    :func:`multimodal.resize_images` composes upstream); ValueError
    otherwise, surfaced per-payload.

    Arrow-batched mapInPandas; narrow. Output is ``(w/p)·(h/p)`` rows per
    image — bounded fan-out, no shuffle until the caller aggregates."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                px = decode_image(bytes(payload))
                h, w, ch = px.shape
                if h % patch or w % patch:
                    raise ValueError(
                        f"media {mid}: dims {w}x{h} not multiples of "
                        f"patch {patch}"
                    )
                # (gy, patch, gx, patch, ch) → per-patch reductions
                g = px.astype(np.int64).reshape(
                    h // patch, patch, w // patch, patch, ch
                )
                sums = g.sum(axis=(1, 3, 4))
                mins = g.min(axis=(1, 3)).min(axis=2)
                maxs = g.max(axis=(1, 3)).max(axis=2)
                n = patch * patch * ch
                for gy in range(h // patch):
                    for gx in range(w // patch):
                        s = int(sums[gy, gx])
                        rows.append(
                            (
                                int(mid), gy, gx, s,
                                int(mins[gy, gx]), int(maxs[gy, gx]),
                                (s * 1_000_000 + n // 2) // n,
                            )
                        )
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "media_id", "py", "px", "patch_sum", "patch_min",
                        "patch_max", "mean_e6",
                    ],
                )

    return media.select("media_id", "payload").mapInPandas(
        run, schema=PATCH_SCHEMA
    )


FRAME_DIFF_SCHEMA = (
    "media_id long, frame_idx int, diff_sum long, changed_px long, "
    "max_px_diff int"
)


def frame_diff_stats(media: DataFrame) -> DataFrame:
    """Video frame differencing over REAL decoded AVI/MJPEG frames: one
    output row per consecutive frame pair ``(f, f+1)`` keyed by the LATER
    frame's index, with the exact integer L1 difference
    ``Σ |v_{f+1} − v_f|`` over all channel values, the count of pixels
    whose summed-channel value changed, and the max per-value change.
    Scene-cut detection is then a plain Catalyst filter on ``diff_sum``
    (the gate's oracle thresholds in SQL) — the expensive decode runs once,
    narrow, and the policy stays declarative.

    Arrow-batched mapInPandas; narrow; per-item state is two frames."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                frames, _ = decode_avi(bytes(payload))
                for f in range(1, len(frames)):
                    a = frames[f - 1].astype(np.int64)
                    b = frames[f].astype(np.int64)
                    d = np.abs(b - a)
                    rows.append(
                        (
                            int(mid), f, int(d.sum()),
                            int((b.sum(axis=2) != a.sum(axis=2)).sum()),
                            int(d.max()),
                        )
                    )
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=[
                        "media_id", "frame_idx", "diff_sum", "changed_px",
                        "max_px_diff",
                    ],
                )

    return media.select("media_id", "payload").mapInPandas(
        run, schema=FRAME_DIFF_SCHEMA
    )


AUTOCORR_SCHEMA = "media_id long, lag int, r long"
PITCH_SCHEMA = "media_id long, pitch_lag int, r_peak long, r0 long"


def audio_autocorr(media: DataFrame, max_lag: int = 8) -> DataFrame:
    """Integer autocorrelation of REAL decoded WAV PCM16 audio: for each
    lag ``k in 0..max_lag``, ``R(k) = Σ_t Σ_c v[t,c]·v[t+k,c]`` in exact
    int64 over the decoded samples — the classic periodicity feature under
    pitch trackers, computed with NO floats so a SQL oracle replays it
    bit-exactly with a lagged self-join over the fixture waveform.

    One row per (media, lag); Arrow-batched mapInPandas, narrow."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                samples, _ = decode_wav(bytes(payload))
                v = samples.astype(np.int64)
                n = v.shape[0]
                for k in range(0, max_lag + 1):
                    if k >= n:
                        break
                    rows.append(
                        (int(mid), k, int((v[: n - k] * v[k:]).sum()))
                    )
            if rows:
                yield pd.DataFrame(rows, columns=["media_id", "lag", "r"])

    return media.select("media_id", "payload").mapInPandas(
        run, schema=AUTOCORR_SCHEMA
    )


def pitch_estimate(media: DataFrame, max_lag: int = 8) -> DataFrame:
    """Autocorrelation pitch estimate: the lag in ``1..max_lag`` with the
    maximal ``R(k)`` (ties → smallest lag, so the result is deterministic
    and SQL-replayable with a window over the autocorr rows), plus the
    peak value and the energy ``R(0)`` for voicing decisions downstream.
    Composes :func:`audio_autocorr` declaratively — the decode kernel runs
    once; the argmax is pure Catalyst (no second pass over audio)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    r = audio_autocorr(media, max_lag=max_lag)
    r0 = r.filter(F.col("lag") == 0).select(
        "media_id", F.col("r").alias("r0")
    )
    w = Window.partitionBy("media_id").orderBy(
        F.col("r").desc(), F.col("lag").asc()
    )
    best = (
        r.filter(F.col("lag") >= 1)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "media_id",
            F.col("lag").alias("pitch_lag"),
            F.col("r").alias("r_peak"),
        )
    )
    return best.join(r0, "media_id")
