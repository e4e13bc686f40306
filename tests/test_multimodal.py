"""Multimodal plumbing: batch shapes, row expansion, and stub-decoder
determinism for the mapInPandas stages (SURVEY §7 step 7)."""

from __future__ import annotations

from riot_graphs_spark.operators.multimodal import (
    audio_window_features,
    extract_image_features,
    synthetic_media,
)


def test_audio_windows_expand_and_cover_all_samples(spark):
    media = synthetic_media(spark, n=12)
    out = audio_window_features(media, hop_ms=500).collect()
    by_id: dict[int, list] = {}
    for r in out:
        by_id.setdefault(r.media_id, []).append(r)
    audio_ids = {r.media_id for r in media.filter("media_type = 'audio'").collect()}
    assert set(by_id) == audio_ids
    for mid, rows in by_id.items():
        dur = 1000 * (1 + mid % 10)
        # inclusive range(0, dur, 500): dur/500 + 1 windows
        assert len(rows) == dur // 500 + 1
        assert sorted(r.window_start_ms for r in rows) == list(
            range(0, dur + 1, 500)
        )
        # every window scores a non-empty slice; payload is 16 bytes total
        assert all(r.n_samples >= 1 for r in rows)
        assert all(r.rms >= 0.0 for r in rows)


def test_audio_rms_deterministic_across_runs(spark):
    media = synthetic_media(spark, n=6)
    a = {(r.media_id, r.window_start_ms): r.rms
         for r in audio_window_features(media).collect()}
    b = {(r.media_id, r.window_start_ms): r.rms
         for r in audio_window_features(media).collect()}
    assert a == b and len(a) > 0


def test_image_features_null_payload_yields_null_feature(spark):
    from pyspark.sql import functions as F

    media = synthetic_media(spark, n=6).withColumn(
        "payload", F.when(F.col("media_id") % 2 == 0, F.col("payload"))
    )
    got = {r.media_id: (r.n_bytes, r.feature)
           for r in extract_image_features(media).collect()}
    assert got[1][0] == 0 and got[1][1] is None  # tolerated, not crashed
    assert got[0][0] == 16 and len(got[0][1]) == 8
