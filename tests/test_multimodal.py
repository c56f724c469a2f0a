"""Multimodal plumbing tests: the GENUINE PPM decode path (r4 VERDICT
task #3) plus parity for the Arrow-batched binary pipeline."""

from __future__ import annotations

import pytest

from bigdataanalytics_textsummarization_spark.extensions import multimodal as mm
from tests.conftest import SF_DIR, assert_parity


def _ppm(w: int, h: int, raster: bytes, maxval: int = 255) -> bytes:
    return f"P6\n{w} {h}\n{maxval}\n".encode() + raster


def test_decode_ppm_parses_header_and_sums_channels():
    # 2x1 image: pixels (1,2,3) and (10, 0x0A, 30) — second pixel's G byte
    # IS the header delimiter 0x0A, so maxsplit discipline is load-bearing
    raster = bytes([1, 2, 3, 10, 0x0A, 30])
    w, h, n_px, sr, sg, sb = mm.decode_ppm(_ppm(2, 1, raster))
    assert (w, h, n_px) == (2, 1, 2)
    assert (sr, sg, sb) == (1 + 10, 2 + 0x0A, 3 + 30)


def test_decode_ppm_rejects_corruption():
    with pytest.raises(ValueError, match="magic"):
        mm.decode_ppm(b"P5\n1 1\n255\n" + bytes(3))
    with pytest.raises(ValueError, match="maxval"):
        mm.decode_ppm(_ppm(1, 1, bytes(3), maxval=65535))
    with pytest.raises(ValueError, match="raster"):
        mm.decode_ppm(_ppm(2, 2, bytes(3)))  # 3 bytes for a 2x2x3 raster
    with pytest.raises(NotImplementedError):
        mm.decode_ppm(None)


def test_synth_ppm_payloads_are_valid_ppm(spark):
    rows = mm.synth_ppm(spark, SF_DIR).limit(20).collect()
    assert rows
    for r in rows:
        w, h, n_px, *_ = mm.decode_ppm(bytes(r["payload"]))
        assert 1 <= w <= 2 and 1 <= h <= 2 and n_px == w * h


def test_multimodal_decode_oracle_parity(spark, oracle):
    assert_parity(
        spark,
        oracle,
        mm.multimodal_decode,
        mm.ORACLES["multimodal_decode"],
    )


def test_decode_payload_real_parse_and_milli_means():
    """decode_payload (graduated r10) format-parses a genuine P6 and
    emits exact per-channel + overall milli-means."""
    # 2x2 image, channel-constant pixels: R=10, G=20, B=255
    raster = bytes([10, 20, 255] * 4)
    f0, f1, f2, f3 = mm.decode_payload(_ppm(2, 2, raster))
    assert (f0, f1, f2) == (10000, 20000, 255000)
    assert f3 == (1000 * (10 + 20 + 255) * 4) // 12
    # non-constant channels: integer division, never rounding
    raster = bytes([1, 0, 0, 2, 0, 0, 2, 0, 0, 2, 0, 0])
    f0, _, _, f3 = mm.decode_payload(_ppm(2, 2, raster))
    assert f0 == (1000 * 7) // 4 == 1750
    assert f3 == (1000 * 7) // 12 == 583


def test_decode_payload_rejects_corruption():
    with pytest.raises(ValueError, match="magic"):
        mm.decode_payload(b"P5\n1 1\n255\n" + bytes(3))
    with pytest.raises(ValueError, match="maxval"):
        mm.decode_payload(_ppm(1, 1, bytes(3), maxval=65535))
    with pytest.raises(ValueError, match="raster"):
        mm.decode_payload(_ppm(4, 4, bytes(3)))  # truncated raster
    with pytest.raises(NotImplementedError):
        mm.decode_payload(None)


def test_multimodal_features_oracle_parity(spark, oracle):
    assert_parity(
        spark,
        oracle,
        mm.multimodal_features,
        mm.ORACLES["multimodal_features"],
    )


def test_decode_ppm_files_from_binary_source(spark, tmp_path):
    """binaryFile-source ingest of real .ppm files on disk decodes to the
    same stats as a local parse — the multimodal ingest edge end-to-end."""
    import os

    media = tmp_path / "media"
    media.mkdir()
    rasters = {
        "a.ppm": (2, 1, bytes([1, 2, 3, 10, 20, 30])),
        "b.ppm": (1, 2, bytes([5, 5, 5, 250, 0, 125])),
        "c.ppm": (1, 1, bytes([0, 0x0A, 255])),  # newline byte in raster
    }
    for name, (w, h, raster) in rasters.items():
        (media / name).write_bytes(
            f"P6\n{w} {h}\n255\n".encode() + raster
        )
    (media / "ignored.txt").write_bytes(b"not an image")  # glob-filtered

    out = mm.decode_ppm_files(spark, str(media)).toPandas()
    assert len(out) == 3
    for r in out.itertuples():
        name = os.path.basename(r.path)
        w, h, raster = rasters[name]
        assert (r.width, r.height, r.n_px) == (w, h, w * h)
        assert r.sum_r == sum(raster[i * 3] for i in range(w * h))
        assert r.sum_g == sum(raster[i * 3 + 1] for i in range(w * h))
        assert r.sum_b == sum(raster[i * 3 + 2] for i in range(w * h))


def test_decode_wav_parses_and_sums():
    import io
    import struct
    import wave as wave_mod

    from bigdataanalytics_textsummarization_spark.extensions.multimodal import (
        decode_wav,
    )

    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(8000)
        w.writeframes(bytes([10, 200, 30, 255]))
    rate, nch, bits, n, s, mx = decode_wav(buf.getvalue())
    assert (rate, nch, bits, n) == (8000, 1, 8, 4)
    assert s == 10 + 200 + 30 + 255
    assert mx == 255


def test_decode_wav_rejects_corruption():
    import pytest
    import wave as wave_mod

    from bigdataanalytics_textsummarization_spark.extensions.multimodal import (
        decode_wav,
    )

    with pytest.raises(NotImplementedError):
        decode_wav(None)
    with pytest.raises((wave_mod.Error, EOFError, ValueError)):
        decode_wav(b"RIFF\x00\x00\x00\x00NOTW")  # bad format magic
    # truncated data chunk: header promises 8 samples, file holds 2
    good_header = (
        b"RIFF" + bytes([8 + 36, 0, 0, 0]) + b"WAVEfmt "
        + bytes.fromhex("10000000010001" + "00401F0000401F000001000800")
        + b"data" + bytes([8, 0, 0, 0])
    )
    with pytest.raises((wave_mod.Error, EOFError, ValueError)):
        decode_wav(good_header + b"\x01\x02")


def test_synth_wav_payloads_are_valid_wav(spark):
    """Every synthesized payload opens in the stdlib wave reader with the
    advertised format — the payloads are REAL files, not lookalikes."""
    import io
    import wave as wave_mod

    from bigdataanalytics_textsummarization_spark.extensions.multimodal import (
        synth_wav,
    )
    from tests.conftest import SF_DIR

    rows = synth_wav(spark, SF_DIR).limit(20).collect()
    assert rows
    for r in rows:
        with wave_mod.open(io.BytesIO(bytes(r["payload"]))) as w:
            assert w.getframerate() == 8000
            assert w.getnchannels() == 1
            assert w.getsampwidth() == 1
            assert w.getnframes() in (2, 4, 6, 8)
            assert len(w.readframes(w.getnframes())) == w.getnframes()


def test_wav_decode_oracle_parity(spark, oracle):
    from bigdataanalytics_textsummarization_spark.extensions.multimodal import (
        ORACLES,
        wav_decode,
    )
    from tests.conftest import assert_parity

    assert_parity(spark, oracle, wav_decode, ORACLES["wav_decode"])


def test_decode_wav_files_from_binary_source(spark, tmp_path):
    """Directory of real .wav files through binaryFile + the stdlib wave
    parser; glob-filtered junk is never read."""
    import io
    import wave as wave_mod

    from bigdataanalytics_textsummarization_spark.extensions.multimodal import (
        decode_wav_files,
    )

    samples = {"a.wav": [1, 2, 3, 4], "b.wav": [250, 251], "c.wav": [0, 128, 255, 64, 32, 16]}
    for name, vals in samples.items():
        buf = io.BytesIO()
        with wave_mod.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(1)
            w.setframerate(8000)
            w.writeframes(bytes(vals))
        (tmp_path / name).write_bytes(buf.getvalue())
    (tmp_path / "junk.txt").write_bytes(b"not audio")

    out = decode_wav_files(spark, str(tmp_path)).toPandas()
    assert len(out) == 3
    by_name = {r.path.rsplit("/", 1)[-1]: r for r in out.itertuples()}
    for name, vals in samples.items():
        r = by_name[name]
        assert (r.sample_rate, r.n_channels, r.bits) == (8000, 1, 8)
        assert r.n_samples == len(vals)
        assert r.sum_amp == sum(vals)
        assert r.max_amp == max(vals)


# ---------------------------------------------------------------------------
# Graduated media ops (r9, VERDICT r8 task 2): real payload structure
# through real parsers, corrupt payloads fail loudly
# ---------------------------------------------------------------------------


def test_parse_ppm_returns_raster_and_rejects_corruption():
    raster = bytes(range(48))
    w, h, got = mm._parse_ppm(_ppm(4, 4, raster))
    assert (w, h) == (4, 4)
    assert got == raster
    with pytest.raises(ValueError, match="magic"):
        mm._parse_ppm(b"P5\n4 4\n255\n" + bytes(48))
    with pytest.raises(ValueError, match="maxval"):
        mm._parse_ppm(_ppm(4, 4, bytes(48), maxval=1023))
    with pytest.raises(ValueError, match="raster"):
        mm._parse_ppm(_ppm(4, 4, bytes(47)))  # truncated
    with pytest.raises(NotImplementedError):
        mm._parse_ppm(None)


def test_synth_ppm4_payloads_are_valid_4x4_images(spark):
    rows = mm.synth_ppm4(spark, SF_DIR).limit(10).collect()
    assert rows
    for r in rows:
        w, h, raster = mm._parse_ppm(bytes(r["payload"]))
        assert (w, h) == (4, 4) and len(raster) == 48


def test_image_resize_is_box_filter_of_parsed_raster(spark):
    """First doc cross-checked by hand: quadrant milli-means must equal
    the box filter of the raster _parse_ppm extracts from the payload."""
    payload = bytes(
        mm.synth_ppm4(spark, SF_DIR).orderBy("doc_id").first()["payload"]
    )
    w, h, raster = mm._parse_ppm(payload)
    out = (
        mm.image_resize(spark, SF_DIR)
        .filter("doc_id = (SELECT min(doc_id) FROM parquet.`" + SF_DIR + "/documents.parquet`)")
        .orderBy("qy", "qx")
        .collect()
    )
    assert len(out) == 4
    for row in out:
        sums = [0, 0, 0]
        for r in (0, 1):
            for c in (0, 1):
                p = (2 * row["qy"] + r) * w + (2 * row["qx"] + c)
                for ch in range(3):
                    sums[ch] += raster[p * 3 + ch]
        assert (row["r_milli"], row["g_milli"], row["b_milli"]) == tuple(
            (1000 * s) // 4 for s in sums
        )


def test_decode_ppm_frames_walks_headers_and_rejects_corruption():
    f0 = _ppm(2, 2, bytes([1] * 12))
    f1 = _ppm(1, 1, bytes([7, 8, 9]))  # variable dims: offsets need parsing
    frames = mm.decode_ppm_frames(f0 + f1)
    assert frames == [(2, 2, 4, 4, 4), (1, 1, 7, 8, 9)]
    with pytest.raises(ValueError, match="truncated raster"):
        mm.decode_ppm_frames(f0 + f1[:-1])
    with pytest.raises(ValueError, match="not a P6 frame"):
        mm.decode_ppm_frames(f0 + b"JUNK\n1 1\n255\n" + bytes(3))
    with pytest.raises(ValueError, match="truncated frame header"):
        mm.decode_ppm_frames(f0 + b"P6\n2 2")
    with pytest.raises(NotImplementedError):
        mm.decode_ppm_frames(None)


def test_synth_ppm_frames_are_valid_containers(spark):
    rows = mm.synth_ppm_frames(spark, SF_DIR).limit(10).collect()
    assert rows
    for r in rows:
        frames = mm.decode_ppm_frames(bytes(r["payload"]))
        assert len(frames) in (4, 6, 8)
        assert all(f[:2] == (2, 2) for f in frames)


def test_graduated_media_oracle_parity(spark, oracle):
    for name in ("image_resize", "frame_sample", "audio_resample"):
        assert_parity(spark, oracle, mm.QUERIES[name], mm.ORACLES[name])


def test_decode_ppm_frames_roundtrip_fuzz():
    """Property: any frame sequence synthesized by the same rule the
    Catalyst builder uses parses back to its exact per-frame stats."""
    import hashlib
    import random

    rng = random.Random(20260815)
    for _ in range(50):
        n_frames = rng.choice([1, 2, 4, 6, 8])
        payload = b""
        expect = []
        for f in range(n_frames):
            w, h = rng.choice([(1, 1), (2, 2), (2, 1), (3, 2)])
            raster = hashlib.md5(f"frame-{f}".encode()).digest()[: w * h * 3]
            while len(raster) < w * h * 3:
                raster += raster
                raster = raster[: w * h * 3]
            payload += f"P6\n{w} {h}\n255\n".encode() + raster
            sums = [0, 0, 0]
            for i in range(w * h):
                for c in range(3):
                    sums[c] += raster[i * 3 + c]
            expect.append((w, h, *sums))
        assert mm.decode_ppm_frames(payload) == expect


# --- image perceptual-hash near-dup (r12) ---


def test_phash_ppm_planted_near_dup_and_unrelated():
    """Constructed fixture: a base raster, a near-dup with one tiny pixel
    nudge (hamming small, found by the <= 3 cut), and an unrelated raster
    (hamming large).  Pure-Python check of the real decode+hash path."""
    base = bytes(range(56, 56 + 48))
    # nudge ONE channel of ONE pixel by 1: at most a couple of comparison
    # bits can flip
    near = bytearray(base)
    near[21] += 1
    far = bytes(199 - ((i * 37) % 144) for i in range(48))
    _, _, *_, ph_base = mm.phash_ppm(_ppm(4, 4, base))
    _, _, *_, ph_near = mm.phash_ppm(_ppm(4, 4, bytes(near)))
    _, _, *_, ph_far = mm.phash_ppm(_ppm(4, 4, far))
    assert bin(ph_base ^ ph_near).count("1") <= mm.PHASH_MAX_HAMMING
    assert bin(ph_base ^ ph_far).count("1") > mm.PHASH_MAX_HAMMING


def test_phash_ppm_rejects_wrong_dims_and_corruption():
    with pytest.raises(ValueError, match="4x4"):
        mm.phash_ppm(_ppm(2, 2, bytes(12)))
    with pytest.raises(ValueError, match="magic"):
        mm.phash_ppm(b"P5\n4 4\n255\n" + bytes(48))
    with pytest.raises(NotImplementedError):
        mm.phash_ppm(None)


def test_synth_ppm_noisy_plants_same_pattern_near_dups(spark):
    """Documents sharing doc_id % N_IMG_PATTERNS decode to rasters that
    differ only by the bounded noise — every same-pattern channel byte
    is within 2 * noise_half of its sibling."""
    rows = {
        r["doc_id"]: bytes(r["payload"])
        for r in mm.synth_ppm_noisy(spark, SF_DIR)
        .filter(f"doc_id IN (0, {mm.N_IMG_PATTERNS}, 1)")
        .collect()
    }
    _, _, r0 = mm._parse_ppm(rows[0])
    _, _, r_same = mm._parse_ppm(rows[mm.N_IMG_PATTERNS])
    _, _, r_other = mm._parse_ppm(rows[1])
    half = (mm.IMG_NOISE_MOD - 1) // 2
    assert all(abs(a - b) <= 2 * half for a, b in zip(r0, r_same))
    # unrelated patterns diverge far beyond the noise band somewhere
    assert max(abs(a - b) for a, b in zip(r0, r_other)) > 2 * half


def test_image_phash_oracle_parity(spark, oracle):
    assert_parity(spark, oracle, mm.image_phash, mm.ORACLES["image_phash"])


def test_image_near_dups_oracle_parity_and_banding_complete(spark, oracle):
    assert_parity(
        spark, oracle, mm.image_near_dups, mm.ORACLES["image_near_dups"]
    )
    # pigeonhole completeness: the banded join finds EXACTLY the brute
    # all-pairs hamming <= 3 set (zero recall loss by construction)
    brute = oracle.sql(
        f"""
        WITH {mm._PHASH_CTE}
        SELECT count(*) FROM ph a JOIN ph b ON b.doc_id > a.doc_id
        WHERE bit_count(xor(a.phash, b.phash)) <= {mm.PHASH_MAX_HAMMING}
        """
    ).fetchone()[0]
    assert mm.image_near_dups(spark, SF_DIR).count() == brute


def test_phash_ingest_oracle_parity(spark, oracle):
    assert_parity(spark, oracle, mm.phash_ingest, mm.ORACLES["phash_ingest"])


def test_image_dedup_clusters_oracle_parity_and_invariants(spark, oracle):
    assert_parity(
        spark,
        oracle,
        mm.image_dedup_clusters,
        mm.ORACLES["image_dedup_clusters"],
    )
    rows = mm.image_dedup_clusters(spark, SF_DIR).collect()
    by_doc = {r["doc_id"]: r["cluster_id"] for r in rows}
    # canonical member of every cluster is a member and not a duplicate
    for r in rows:
        assert r["cluster_id"] in by_doc
        assert r["is_duplicate"] == (r["doc_id"] != r["cluster_id"])
        assert r["cluster_id"] <= r["doc_id"] or not r["is_duplicate"]


# --- audio fingerprint near-dup (r12) ---


def _wav32(samples: bytes) -> bytes:
    assert len(samples) == mm.AUDIO_FP_SAMPLES
    return mm._wav_header32() + samples


def test_audio_fp_planted_near_dup_and_unrelated():
    base = bytes(range(80, 80 + 32))
    near = bytearray(base)
    near[10] += 1  # nudge one sample: at most 2 derivative bits flip
    far = bytes(190 - ((i * 29) % 120) for i in range(32))
    _, _, fp_base = mm.audio_fp_wav(_wav32(base))
    _, _, fp_near = mm.audio_fp_wav(_wav32(bytes(near)))
    _, _, fp_far = mm.audio_fp_wav(_wav32(far))
    assert bin(fp_base ^ fp_near).count("1") <= mm.AUDIO_FP_MAX_HAMMING
    assert bin(fp_base ^ fp_far).count("1") > mm.AUDIO_FP_MAX_HAMMING


def test_audio_fp_rejects_corruption():
    import wave as wave_mod

    with pytest.raises(NotImplementedError):
        mm.audio_fp_wav(None)
    with pytest.raises(ValueError, match="samples"):
        # valid WAV, wrong length: real synth_wav payloads are 2-8 frames
        import io
        buf = io.BytesIO()
        with wave_mod.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(1)
            w.setframerate(8000)
            w.writeframes(bytes(4))
        mm.audio_fp_wav(buf.getvalue())
    with pytest.raises((wave_mod.Error, EOFError, ValueError)):
        mm.audio_fp_wav(b"RIFF\x00\x00\x00\x00NOTW")


def test_synth_wav_noisy_payloads_are_valid_and_planted(spark):
    import io
    import wave as wave_mod

    rows = {
        r["doc_id"]: bytes(r["payload"])
        for r in mm.synth_wav_noisy(spark, SF_DIR)
        .filter(f"doc_id IN (0, {mm.AUDIO_PATTERNS}, 1)")
        .collect()
    }
    half = (mm.IMG_NOISE_MOD - 1) // 2
    frames = {}
    for did, payload in rows.items():
        with wave_mod.open(io.BytesIO(payload)) as w:
            assert w.getframerate() == 8000
            assert (w.getnchannels(), w.getsampwidth()) == (1, 1)
            assert w.getnframes() == mm.AUDIO_FP_SAMPLES
            frames[did] = w.readframes(mm.AUDIO_FP_SAMPLES)
    same = zip(frames[0], frames[mm.AUDIO_PATTERNS])
    other = zip(frames[0], frames[1])
    assert all(abs(a - b) <= 2 * half for a, b in same)
    assert max(abs(a - b) for a, b in other) > 2 * half


def test_audio_fingerprint_oracle_parity(spark, oracle):
    assert_parity(
        spark, oracle, mm.audio_fingerprint, mm.ORACLES["audio_fingerprint"]
    )


def test_audio_near_dups_oracle_parity_and_banding_complete(spark, oracle):
    assert_parity(
        spark, oracle, mm.audio_near_dups, mm.ORACLES["audio_near_dups"]
    )
    brute = oracle.sql(
        f"""
        WITH {mm._AUDIO_FP_CTE}
        SELECT count(*) FROM afp a JOIN afp b ON b.doc_id > a.doc_id
        WHERE bit_count(xor(a.fp, b.fp)) <= {mm.AUDIO_FP_MAX_HAMMING}
        """
    ).fetchone()[0]
    assert mm.audio_near_dups(spark, SF_DIR).count() == brute


def test_audio_fp_ingest_oracle_parity(spark, oracle):
    assert_parity(
        spark, oracle, mm.audio_fp_ingest, mm.ORACLES["audio_fp_ingest"]
    )


def test_video_phashes_planted_near_dup_and_unrelated():
    """Constructed fixture: a 2-frame clip, a near-dup with one tiny pixel
    nudge in each frame (small per-frame hamming), and an unrelated clip
    (large total).  Pure-Python check of the real walk+hash path."""
    f0 = bytes(range(56, 56 + 48))
    f1 = bytes(range(60, 60 + 48))
    near0, near1 = bytearray(f0), bytearray(f1)
    near0[21] += 1
    near1[33] += 1
    far = bytes(199 - ((i * 37) % 144) for i in range(48))
    clip = _ppm(4, 4, f0) + _ppm(4, 4, f1)
    clip_near = _ppm(4, 4, bytes(near0)) + _ppm(4, 4, bytes(near1))
    clip_far = _ppm(4, 4, far) + _ppm(4, 4, far)
    ph = mm.video_phashes(clip)
    ph_near = mm.video_phashes(clip_near)
    ph_far = mm.video_phashes(clip_far)
    assert len(ph) == len(ph_near) == 2
    total_near = sum(bin(a ^ b).count("1") for a, b in zip(ph, ph_near))
    total_far = sum(bin(a ^ b).count("1") for a, b in zip(ph, ph_far))
    assert total_near <= mm.VIDEO_MAX_HAMMING_PER_FRAME * 2
    assert total_far > mm.VIDEO_MAX_HAMMING_PER_FRAME * 2


def test_synth_video_noisy_payloads_are_valid_mixed_length_clips(spark):
    rows = mm.synth_video_noisy(spark, SF_DIR).limit(20).collect()
    assert rows
    lengths = set()
    for r in rows:
        frames = mm._walk_ppm_frames(bytes(r["payload"]))
        want = mm.VIDEO_MIN_FRAMES + (
            r["doc_id"] % mm.N_VIDEO_PATTERNS
        ) % mm.VIDEO_FRAME_SPAN
        assert len(frames) == want
        lengths.add(len(frames))
        assert all((w, h) == (mm.PHASH_SIDE, mm.PHASH_SIDE) for w, h, _ in frames)
    # the fixture is genuinely mixed-length (VERDICT r13 task 4)
    assert len(lengths) >= 2


def test_video_fingerprint_oracle_parity(spark, oracle):
    assert_parity(
        spark, oracle, mm.video_fingerprint, mm.ORACLES["video_fingerprint"]
    )


def test_video_near_dups_oracle_parity_and_banding_complete(spark, oracle):
    assert_parity(
        spark, oracle, mm.video_near_dups, mm.ORACLES["video_near_dups"]
    )
    # pigeonhole completeness: total <= 3 * n_frames forces one frame
    # to hamming <= 3, which forces one exact 10-bit band match — the
    # banded join finds EXACTLY the brute all-pairs (equal-length,
    # length-scaled total-hamming) set
    brute = oracle.sql(
        f"""
        WITH {mm._VIDEO_PH_CTE}
        SELECT count(*) FROM (
          SELECT a.doc_id, b.doc_id
          FROM vph a JOIN vph b ON b.doc_id > a.doc_id
                                AND b.n_frames = a.n_frames
                                AND b.frame_idx = a.frame_idx
          GROUP BY a.doc_id, b.doc_id
          HAVING sum(bit_count(xor(a.phash, b.phash)))
                   <= {mm.VIDEO_MAX_HAMMING_PER_FRAME} * min(a.n_frames)
        )
        """
    ).fetchone()[0]
    assert mm.video_near_dups(spark, SF_DIR).count() == brute


def test_video_near_dups_pairs_share_pattern_and_mix_lengths(spark):
    # at test scale every surviving pair comes from a planted pattern
    # group: unrelated per-frame fingerprints sit near hamming ~20/frame,
    # far above the 3-per-frame budget
    rows = mm.video_near_dups(spark, SF_DIR).collect()
    assert rows
    assert all(
        r["doc_a"] % mm.N_VIDEO_PATTERNS == r["doc_b"] % mm.N_VIDEO_PATTERNS
        for r in rows
    )
    # n_frames is the pair's (shared) clip length, never mixed-length
    assert all(
        r["n_frames"]
        == mm.VIDEO_MIN_FRAMES
        + (r["doc_a"] % mm.N_VIDEO_PATTERNS) % mm.VIDEO_FRAME_SPAN
        for r in rows
    )
    # pairs exist at more than one clip length — the variable-length
    # fixture actually exercises the n_frames band key
    assert len({r["n_frames"] for r in rows}) >= 2


def test_multimodal_dedup_audit_oracle_parity_and_states(spark, oracle):
    assert_parity(
        spark,
        oracle,
        mm.multimodal_dedup_audit,
        mm.ORACLES["multimodal_dedup_audit"],
    )
    rows = mm.multimodal_dedup_audit(spark, SF_DIR).collect()
    assert rows
    states = {"flagged", "below_threshold", "not_a_candidate"}
    for r in rows:
        assert r["text_verdict"] in states and r["image_verdict"] in states
        # every emitted row is flagged by at least one detector
        assert "flagged" in (r["text_verdict"], r["image_verdict"])
        # sentinel discipline: a non-candidate carries its sentinel, a
        # candidate carries a real score
        assert (r["text_verdict"] == "not_a_candidate") == (r["jaccard"] == -1.0)
        assert (r["image_verdict"] == "not_a_candidate") == (r["hamming"] == -1)


def test_video_fp_ingest_oracle_parity(spark, oracle):
    assert_parity(
        spark, oracle, mm.video_fp_ingest, mm.ORACLES["video_fp_ingest"]
    )


def test_video_dedup_clusters_oracle_parity_and_invariants(spark, oracle):
    assert_parity(
        spark,
        oracle,
        mm.video_dedup_clusters,
        mm.ORACLES["video_dedup_clusters"],
    )
    rows = mm.video_dedup_clusters(spark, SF_DIR).collect()
    assert rows
    # canonical = min member: every cluster_id labels itself non-duplicate
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, members in by_cluster.items():
        assert min(m["doc_id"] for m in members) == cid
        assert all(m["is_duplicate"] == (m["doc_id"] != cid) for m in members)


def test_audio_dedup_clusters_oracle_parity(spark, oracle):
    assert_parity(
        spark,
        oracle,
        mm.audio_dedup_clusters,
        mm.ORACLES["audio_dedup_clusters"],
    )


def test_trimodal_dedup_audit_oracle_parity_and_states(spark, oracle):
    assert_parity(
        spark,
        oracle,
        mm.trimodal_dedup_audit,
        mm.ORACLES["trimodal_dedup_audit"],
    )
    rows = mm.trimodal_dedup_audit(spark, SF_DIR).collect()
    assert rows
    states = {"flagged", "below_threshold", "not_a_candidate"}
    for r in rows:
        vs = (r["text_verdict"], r["image_verdict"], r["audio_verdict"])
        assert all(v in states for v in vs)
        assert "flagged" in vs
        assert (r["text_verdict"] == "not_a_candidate") == (r["jaccard"] == -1.0)
        assert (r["image_verdict"] == "not_a_candidate") == (
            r["img_hamming"] == -1
        )
        assert (r["audio_verdict"] == "not_a_candidate") == (
            r["audio_hamming"] == -1
        )


def test_video_phashes_rejects_corruption():
    # a non-square frame inside an otherwise valid clip fails in the
    # shared hash planes; truncated rasters and headers fail in the
    # walker; a null payload fails loudly like every real decoder here
    good = _ppm(4, 4, bytes(range(56, 56 + 48)))
    with pytest.raises(ValueError, match="4x4"):
        mm.video_phashes(good + _ppm(2, 2, bytes(12)))
    with pytest.raises(ValueError, match="raster"):
        mm.video_phashes(good + _ppm(4, 4, bytes(10)))
    with pytest.raises(ValueError, match="header"):
        mm.video_phashes(good + b"P6\n4 4")
    with pytest.raises(ValueError, match="not a P6 frame"):
        mm.video_phashes(b"P5\n4 4\n255\n" + bytes(48))
    with pytest.raises(NotImplementedError):
        mm.video_phashes(None)


# -- production-width (wide) fingerprints (r14, VERDICT r13 task 3) ----------


def test_wide_band_extraction_matches_python_reference(spark):
    # arithmetic >> plus the 0xFFFF mask must extract bits [16b, 16b+16)
    # exactly even with bit 63 set (negative long) — pin Spark's expr
    # against the pure-Python unsigned reference
    vals = [-(1 << 63), -1, 0, 1, (1 << 63) - 1, -(1 << 63) + 12345]
    df = spark.createDataFrame([(v,) for v in vals], "phash: long")
    rows = mm._wide_bands(df, "phash").collect()
    for r in rows:
        unsigned = r["phash"] % (1 << 64)
        assert r["band_bits"] == (unsigned >> (r["band"] * 16)) & 0xFFFF


def test_ahash_wide_rejects_narrow_raster_and_signs():
    with pytest.raises(ValueError, match="8x8"):
        mm.ahash_wide(4, 4, bytes(48))
    # a dark-then-bright raster puts pixels 32..63 above the mean, so the
    # hash carries bit 63 -> the signed fold must produce a negative
    # long, not overflow
    raster = bytes([0] * 96) + bytes([255] * 96)
    ph = mm.ahash_wide(8, 8, raster)
    assert ph < 0
    assert ph == mm._signed64(sum(1 << p for p in range(32, 64)))


def test_video_fingerprint_wide_oracle_parity_and_sign_bit(spark, oracle):
    assert_parity(
        spark,
        oracle,
        mm.video_fingerprint_wide,
        mm.ORACLES["video_fingerprint_wide"],
    )
    rows = mm.video_fingerprint_wide(spark, SF_DIR).collect()
    assert rows
    # the 64-bit width is genuinely exercised: some frame hashes carry
    # bit 63 (negative as signed longs)
    assert any(r["phash"] < 0 for r in rows)
    assert any(r["phash"] > 0 for r in rows)


def test_audio_fingerprint_wide_oracle_parity_and_sign_bit(spark, oracle):
    assert_parity(
        spark,
        oracle,
        mm.audio_fingerprint_wide,
        mm.ORACLES["audio_fingerprint_wide"],
    )
    rows = mm.audio_fingerprint_wide(spark, SF_DIR).collect()
    assert rows
    assert all(r["n_samples"] == mm.AUDIO_FP_WIDE_SAMPLES for r in rows)
    assert any(r["fp"] < 0 for r in rows)
    assert any(r["fp"] > 0 for r in rows)


def test_audio_near_dups_wide_oracle_parity_and_banding_complete(
    spark, oracle
):
    assert_parity(
        spark,
        oracle,
        mm.audio_near_dups_wide,
        mm.ORACLES["audio_near_dups_wide"],
    )
    # pigeonhole completeness at production width: hamming <= 3 forces an
    # exact 16-bit band match — the banded join finds EXACTLY the brute
    # all-pairs set
    brute = oracle.sql(
        f"""
        WITH {mm._WAUD_CTE}
        SELECT count(*) FROM wafp a JOIN wafp b
          ON b.doc_id > a.doc_id
         AND bit_count(xor(a.fp, b.fp)) <= {mm.AUDIO_FP_WIDE_MAX_HAMMING}
        """
    ).fetchone()[0]
    assert mm.audio_near_dups_wide(spark, SF_DIR).count() == brute


def test_video_near_dups_wide_oracle_parity_and_banding_complete(
    spark, oracle
):
    assert_parity(
        spark,
        oracle,
        mm.video_near_dups_wide,
        mm.ORACLES["video_near_dups_wide"],
    )
    brute = oracle.sql(
        f"""
        WITH {mm._WVID_CTE}
        SELECT count(*) FROM (
          SELECT a.doc_id, b.doc_id
          FROM wvph a JOIN wvph b ON b.doc_id > a.doc_id
                                 AND b.n_frames = a.n_frames
                                 AND b.frame_idx = a.frame_idx
          GROUP BY a.doc_id, b.doc_id
          HAVING sum(bit_count(xor(a.phash, b.phash)))
                   <= {mm.VIDEO_MAX_HAMMING_PER_FRAME} * min(a.n_frames)
        )
        """
    ).fetchone()[0]
    assert mm.video_near_dups_wide(spark, SF_DIR).count() == brute


def test_wide_near_dup_pairs_share_pattern(spark):
    # planted structure survives the production width: every surviving
    # pair comes from a planted pattern group on both axes
    arows = mm.audio_near_dups_wide(spark, SF_DIR).collect()
    vrows = mm.video_near_dups_wide(spark, SF_DIR).collect()
    assert arows and vrows
    assert all(
        r["doc_a"] % mm.AUDIO_PATTERNS == r["doc_b"] % mm.AUDIO_PATTERNS
        for r in arows
    )
    assert all(
        r["doc_a"] % mm.N_VIDEO_PATTERNS == r["doc_b"] % mm.N_VIDEO_PATTERNS
        for r in vrows
    )
    assert len({r["n_frames"] for r in vrows}) >= 2


def test_wide_payloads_are_valid_files(spark):
    import io
    import wave as wave_mod

    for r in mm.synth_wav_wide(spark, SF_DIR).limit(5).collect():
        with wave_mod.open(io.BytesIO(bytes(r["payload"]))) as w:
            assert w.getnframes() == mm.AUDIO_FP_WIDE_SAMPLES
    for r in mm.synth_video_wide(spark, SF_DIR).limit(5).collect():
        frames = mm._walk_ppm_frames(bytes(r["payload"]))
        want = mm.VIDEO_MIN_FRAMES + (
            r["doc_id"] % mm.N_VIDEO_PATTERNS
        ) % mm.VIDEO_FRAME_SPAN
        assert len(frames) == want
        assert all(
            (w, h) == (mm.PHASH_WIDE_SIDE, mm.PHASH_WIDE_SIDE)
            for w, h, _ in frames
        )


# -- wide image + production-width audits (r15, VERDICT r14 task 4) ----------


def test_image_phash_wide_oracle_parity_and_sign_bit(spark, oracle):
    assert_parity(
        spark,
        oracle,
        mm.image_phash_wide,
        mm.ORACLES["image_phash_wide"],
    )
    rows = mm.image_phash_wide(spark, SF_DIR).collect()
    assert rows
    assert all(
        (r["width"], r["height"]) == (mm.PHASH_WIDE_SIDE, mm.PHASH_WIDE_SIDE)
        for r in rows
    )
    # the 64-bit width is genuinely exercised (bit 63 set on some hashes)
    assert any(r["phash"] < 0 for r in rows)
    assert any(r["phash"] > 0 for r in rows)


def test_image_near_dups_wide_oracle_parity_and_banding_complete(
    spark, oracle
):
    assert_parity(
        spark,
        oracle,
        mm.image_near_dups_wide,
        mm.ORACLES["image_near_dups_wide"],
    )
    brute = oracle.sql(
        f"""
        WITH {mm._WIMG_CTE}
        SELECT count(*) FROM wiph a JOIN wiph b
          ON b.doc_id > a.doc_id
         AND bit_count(xor(a.phash, b.phash)) <= {mm.PHASH_MAX_HAMMING}
        """
    ).fetchone()[0]
    assert mm.image_near_dups_wide(spark, SF_DIR).count() == brute
    rows = mm.image_near_dups_wide(spark, SF_DIR).collect()
    assert rows
    assert all(
        r["doc_a"] % mm.N_IMG_PATTERNS == r["doc_b"] % mm.N_IMG_PATTERNS
        for r in rows
    )


def test_wide_image_payloads_are_valid_ppms(spark):
    for r in mm.synth_ppm_wide(spark, SF_DIR).limit(5).collect():
        w, h, raster = mm._parse_ppm(bytes(r["payload"]))
        assert (w, h) == (mm.PHASH_WIDE_SIDE, mm.PHASH_WIDE_SIDE)
        assert len(raster) == 3 * w * h


def test_wide_audits_oracle_parity(spark, oracle):
    assert_parity(
        spark,
        oracle,
        mm.multimodal_dedup_audit_wide,
        mm.ORACLES["multimodal_dedup_audit_wide"],
    )
    assert_parity(
        spark,
        oracle,
        mm.trimodal_dedup_audit_wide,
        mm.ORACLES["trimodal_dedup_audit_wide"],
    )


def test_wide_audit_composes_over_wide_detectors(spark):
    # every image-flagged row of the wide audit IS a wide-detector pair
    # (same blocking, same threshold) — the audit inherits its
    # detectors' production width rather than re-deriving its own
    audit = mm.multimodal_dedup_audit_wide(spark, SF_DIR)
    flagged = {
        (r["doc_a"], r["doc_b"])
        for r in audit.filter("image_verdict = 'flagged'").collect()
    }
    detector = {
        (r["doc_a"], r["doc_b"])
        for r in mm.image_near_dups_wide(spark, SF_DIR).collect()
    }
    assert flagged == detector
    # and the trimodal audio axis agrees with the wide audio detector
    tri = mm.trimodal_dedup_audit_wide(spark, SF_DIR)
    aud_flagged = {
        (r["doc_a"], r["doc_b"])
        for r in tri.filter("audio_verdict = 'flagged'").collect()
    }
    aud_detector = {
        (r["doc_a"], r["doc_b"])
        for r in mm.audio_near_dups_wide(spark, SF_DIR).collect()
    }
    assert aud_flagged == aud_detector
