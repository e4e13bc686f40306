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


def _png(w: int, h: int) -> bytes:
    import struct

    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + struct.pack(">II", w, h)
        + b"\x08\x06\x00\x00\x00"
    )


def _jpeg(w: int, h: int) -> bytes:
    import struct

    # SOI, APP0 (JFIF stub), then SOF0 with dimensions
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 17)
        + b"\x08"
        + struct.pack(">HH", h, w)
        + b"\x03" + b"\x00" * 9
    )
    return b"\xff\xd8" + app0 + sof0


def _wav(rate: int, channels: int) -> bytes:
    import struct

    fmt = (
        b"fmt "
        + struct.pack("<I", 16)
        + struct.pack("<HH", 1, channels)
        + struct.pack("<I", rate)
        + b"\x00" * 8  # byte rate + block align + bits: 16-byte fmt body
    )
    return b"RIFF" + struct.pack("<I", 36) + b"WAVE" + fmt


def test_sniff_media_headers_parses_real_containers(spark):
    from riot_graphs_spark.operators.multimodal import sniff_media_headers

    rows = [
        (1, bytearray(_png(640, 480)), "image", None, None, None),
        (2, bytearray(_jpeg(1920, 1080)), "image", None, None, None),
        (3, bytearray(_wav(44100, 2)), "audio", None, None, None),
        (4, bytearray(b"\x00garbage"), "image", None, None, None),
        (5, None, "image", None, None, None),
    ]
    media = spark.createDataFrame(
        rows,
        "media_id long, payload binary, media_type string, "
        "width int, height int, duration_ms long",
    )
    got = {r.media_id: r for r in sniff_media_headers(media).collect()}
    assert (got[1].detected_format, got[1].detected_width, got[1].detected_height) == ("png", 640, 480)
    assert (got[2].detected_format, got[2].detected_width, got[2].detected_height) == ("jpeg", 1920, 1080)
    assert (got[3].detected_format, got[3].sample_rate, got[3].channels) == ("wav", 44100, 2)
    assert got[4].detected_format == "unknown"
    assert got[5].detected_format == "unknown"


def test_resize_images_aspect_fit_and_corrupt_raises(spark):
    import pytest as _pytest

    from riot_graphs_spark.operators.multimodal import (
        resize_images,
        synthetic_media,
    )

    media = synthetic_media(spark, n=12)
    got = {r.media_id: r for r in resize_images(media, 64, 48).collect()}
    for r in got.values():
        # fits the box, preserves aspect within floor-division error
        assert r.out_width <= 64 and r.out_height <= 48
        assert r.out_width == 64 or r.out_height == 48  # touches one edge
        assert r.n_bytes_out == r.out_width * r.out_height * 3
        if r.out_height == 48:
            assert r.out_width == max(1, (r.orig_width * 48) // r.orig_height)
    # corrupt payload raises like a real decoder
    bad = spark.createDataFrame(
        [(99, None, "image", 10, 10, 0)], media.schema
    )
    with _pytest.raises(Exception, match="corrupt|NotImplemented"):
        resize_images(bad).collect()


def test_sniff_extended_containers(spark):
    import struct

    from riot_graphs_spark.operators.multimodal import _sniff_header

    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 8
    assert _sniff_header(gif) == ("gif", 320, 200, None, None)
    mp4 = struct.pack(">I", 24) + b"ftypisom" + b"\x00" * 16
    assert _sniff_header(mp4) == ("mp4", None, None, None, None)
    # MPEG-1 Layer III, 44100 Hz, joint stereo
    mp3 = bytes([0xFF, 0xFB, 0b10010000, 0b01000000]) + b"\x00" * 8
    assert _sniff_header(mp3) == ("mp3", None, None, 44100, 2)
    # mono (mode bits = 11)
    mp3m = bytes([0xFF, 0xFB, 0b10010000, 0b11000000]) + b"\x00" * 8
    assert _sniff_header(mp3m) == ("mp3", None, None, 44100, 1)
    assert _sniff_header(b"ID3\x04\x00" + b"\x00" * 16) == (
        "mp3", None, None, None, None,
    )
    # existing formats unaffected
    assert _sniff_header(b"garbage")[0] == "unknown"


def test_phash_dct_basis_is_orthonormal():
    import numpy as np

    from riot_graphs_spark.operators.multimodal import _dct2_matrix

    d = _dct2_matrix(32)
    assert np.allclose(d @ d.T, np.eye(32), atol=1e-12)


def test_phash_deterministic_and_signed64(spark):
    from riot_graphs_spark.operators.multimodal import phash_images, synthetic_media

    media = synthetic_media(spark, n=24)
    a = {r.media_id: r.phash for r in phash_images(media).collect()}
    b = {r.media_id: r.phash for r in phash_images(media).collect()}
    assert a == b and len(a) == 8  # images only (n % 3 == 0 rows)
    assert all(-(2**63) <= v < 2**63 for v in a.values())
    assert len(set(a.values())) > 1  # payload-sensitive, not constant


def test_phash_pairs_find_exact_duplicates(spark):
    from riot_graphs_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        phash_near_dup_pairs,
    )

    payload = bytes(range(16))
    other = bytes(255 - b for b in range(16))
    rows = [
        (1, payload, "image", 64, 64, 0),
        (2, payload, "image", 32, 32, 0),  # same bytes, different metadata
        (3, other, "image", 64, 64, 0),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in phash_near_dup_pairs(media, max_hamming=0).collect()}
    assert pairs == {(1, 2): 0}


def test_phash_banding_has_total_recall_vs_brute_force(spark):
    from riot_graphs_spark.operators.multimodal import (
        phash_images,
        phash_near_dup_pairs,
        synthetic_media,
    )

    media = synthetic_media(spark, n=48)
    hashes = {r.media_id: r.phash for r in phash_images(media).collect()}
    radius = 15  # bands=16 divides 64 and exceeds the radius (pigeonhole)
    ids = sorted(hashes)
    brute = {
        (a, b): bin((hashes[a] ^ hashes[b]) & (2**64 - 1)).count("1")
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin((hashes[a] ^ hashes[b]) & (2**64 - 1)).count("1") <= radius
    }
    banded = {
        (r.doc_a, r.doc_b): r.hamming
        for r in phash_near_dup_pairs(media, max_hamming=radius, bands=16).collect()
    }
    assert banded == brute  # pigeonhole: no pair within radius is missed


def test_phash_corrupt_payload_raises(spark):
    import pytest

    from riot_graphs_spark.operators.multimodal import MEDIA_SCHEMA, phash_images

    media = spark.createDataFrame(
        [(1, None, "image", 8, 8, 0)], MEDIA_SCHEMA
    )
    with pytest.raises(Exception, match="corrupt|NotImplemented|PythonException"):
        phash_images(media).collect()


def test_phash_vectorized_matches_scalar_reference(spark):
    from riot_graphs_spark.operators.multimodal import (
        _dct2_matrix,
        _luma_matrix_stub,
        _phash64,
        phash_images,
        synthetic_media,
    )

    media = synthetic_media(spark, n=24)
    got = {r.media_id: r.phash for r in phash_images(media).collect()}
    d = _dct2_matrix(32)
    for r in media.filter("media_type = 'image'").collect():
        assert got[r.media_id] == _phash64(_luma_matrix_stub(bytes(r.payload)), d)


def test_audio_fingerprint_deterministic_and_32bit(spark):
    from riot_graphs_spark.operators.multimodal import (
        audio_fingerprints,
        synthetic_media,
    )

    media = synthetic_media(spark, n=24)
    a = {r.media_id: r.afp for r in audio_fingerprints(media).collect()}
    b = {r.media_id: r.afp for r in audio_fingerprints(media).collect()}
    assert a == b and len(a) == 8  # audio rows only (media_id % 3 == 1)
    assert all(0 <= v < 2**32 for v in a.values())
    assert len(set(a.values())) > 1


def test_audio_pairs_find_exact_duplicates_and_recall(spark):
    from riot_graphs_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        audio_fingerprints,
        audio_near_dup_pairs,
        synthetic_media,
    )

    payload = bytes((i * 13 + 7) % 256 for i in range(64))
    rows = [
        (1, payload, "audio", None, None, 1000),
        (2, payload, "audio", None, None, 2000),  # same signal, diff meta
        (3, bytes(reversed(payload)), "audio", None, None, 1000),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    pairs = {
        (r.doc_a, r.doc_b): r.hamming
        for r in audio_near_dup_pairs(media, max_hamming=0).collect()
    }
    assert pairs == {(1, 2): 0}

    # total recall vs brute force at radius 7 (8 bands of 4 bits divide 32)
    big = synthetic_media(spark, n=48)
    fps = {r.media_id: r.afp for r in audio_fingerprints(big).collect()}
    ids = sorted(fps)
    radius = 7
    brute = {
        (a, b): bin(fps[a] ^ fps[b]).count("1")
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(fps[a] ^ fps[b]).count("1") <= radius
    }
    banded = {
        (r.doc_a, r.doc_b): r.hamming
        for r in audio_near_dup_pairs(big, max_hamming=radius, bands=8).collect()
    }
    assert banded == brute


def test_audio_fingerprint_batch_matches_scalar():
    from riot_graphs_spark.operators.multimodal import (
        _afp_batch,
        _audio_fingerprint,
    )

    pcms = [
        [((i * 31 + j * 7) % 256) - 128 for j in range(n)]
        for i, n in enumerate([5, 16, 33, 64, 64, 257])
    ]
    batch = _afp_batch(pcms)
    for i, p in enumerate(pcms):
        assert int(batch[i]) == _audio_fingerprint(p)
