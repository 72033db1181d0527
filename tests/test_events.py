"""Windowed-aggregate semantics (incl. the non-divisible hop regression)."""

import numpy as np
import pytest


def test_hopping_nondivisible_hop_covers_all_windows(ray_session):
    """w=90min, hop=60min: an event at minute 80 belongs to the windows
    starting at minute 0 AND minute 60 (floor-k dropped the first)."""
    from lucene_kmp_ray.pipelines.events import hopping_counts
    df = hopping_counts("/root/testdata/sf0.001", window_minutes=90,
                        hop_minutes=60).to_pandas()
    # brute force over the raw events
    import pyarrow.parquet as pq
    t = pq.read_table("/root/testdata/sf0.001/events.parquet",
                      columns=["ts", "event_type", "value"]).to_pandas()
    ts = t["ts"].astype("int64").to_numpy()
    w = 90 * 60 * 1_000_000
    h = 60 * 60 * 1_000_000
    exp = {}
    for tus, et, v in zip(ts, t["event_type"], t["value"]):
        base = (tus // h) * h
        k = 0
        while True:
            start = base - k * h
            if tus >= start + w:
                break
            n, s = exp.get((et, start), (0, 0.0))
            exp[(et, start)] = (n + 1, s + v)
            k += 1
    got = {(r.event_type, r.window_us): (r.n_events, r.sum_value_r)
           for r in df.itertuples()}
    assert set(got) == set(exp)
    for key in exp:
        assert got[key][0] == exp[key][0], key
        assert got[key][1] == pytest.approx(round(exp[key][1], 6), abs=1e-6)


def test_tumbling_counts_match_brute(ray_session):
    from lucene_kmp_ray.pipelines.events import tumbling_counts
    df = tumbling_counts("/root/testdata/sf0.001").to_pandas()
    import pyarrow.parquet as pq
    t = pq.read_table("/root/testdata/sf0.001/events.parquet",
                      columns=["ts", "event_type", "value"]).to_pandas()
    w = 60 * 60 * 1_000_000
    t["window_us"] = (t["ts"].astype("int64") // w) * w
    exp = t.groupby(["event_type", "window_us"]).agg(
        n=("value", "size"), s=("value", "sum")).reset_index()
    got = {(r.event_type, r.window_us): r.n_events for r in df.itertuples()}
    for r in exp.itertuples():
        assert got[(r.event_type, r.window_us)] == r.n


def test_multimodal_resize_and_frame_sample(ray_session):
    """Multimodal plumbing: resize keeps row count + updates dims; frame
    sampling explodes videos by duration; both deterministic (stub
    decoders declared — no codec libs in this container)."""
    import pyarrow as pa
    import ray.data as rd

    from lucene_kmp_ray.pipelines.multimodal import (resize_media,
                                                     sample_frames,
                                                     synthesize_media_table)
    t = synthesize_media_table(24)
    # give videos a duration so sampling has frames
    dur = [3000 if mt == "video" else 0
           for mt in t["media_type"].to_pylist()]
    t = t.set_column(t.schema.get_field_index("duration_ms"), "duration_ms",
                     pa.array(dur, pa.int32()))
    ds = rd.from_arrow(t)
    resized = resize_media(ds, 16, 16).to_pandas()
    assert len(resized) == 24
    assert set(resized["width"]) == {16} and set(resized["height"]) == {16}
    # determinism
    resized2 = resize_media(rd.from_arrow(t), 16, 16).to_pandas()
    assert list(resized["payload"]) == list(resized2["payload"])

    frames = sample_frames(rd.from_arrow(t), 1000).to_pandas()
    n_videos = sum(1 for mt in t["media_type"].to_pylist() if mt == "video")
    assert len(frames) == n_videos * 3
    assert set(frames["frame_index"]) == {0, 1, 2}


def test_audio_features_real_wav_decode(ray_session):
    """REAL audio decoding (stdlib wave): the extracted dominant frequency
    must recover each synthesized sine's frequency; RMS tracks amplitude."""
    import ray.data as rd

    from lucene_kmp_ray.pipelines.multimodal import (audio_features,
                                                     synthesize_wav_table)
    t = synthesize_wav_table(16)
    out = audio_features(rd.from_arrow(t)).to_pandas() \
        .sort_values("media_id").reset_index(drop=True)
    assert len(out) == 16
    for i in range(16):
        exp_f = 200.0 + 37.0 * (i % 20)
        assert abs(out["dominant_hz"][i] - exp_f) < 4.5, i  # FFT bin width
        assert 0.1 < out["rms"][i] < 0.75
        assert abs(out["duration_s"][i] - 0.25) < 1e-9


def test_image_features_real_bmp_decode(ray_session):
    """REAL image decoding (24-bit BMP, pure numpy): decode must
    round-trip the synthesized pixels and the mean red channel must
    recover each image's id-dependent red level."""
    import numpy as np
    import ray.data as rd

    from lucene_kmp_ray.pipelines.multimodal import (_bmp_decode,
                                                     _bmp_encode,
                                                     image_features,
                                                     synthesize_bmp_table)
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, (17, 33, 3), dtype=np.uint8)  # odd width pad
    assert np.array_equal(_bmp_decode(_bmp_encode(px)), px)

    t = synthesize_bmp_table(12)
    out = image_features(rd.from_arrow(t)).to_pandas() \
        .sort_values("media_id").reset_index(drop=True)
    for i in range(12):
        assert abs(out["mean_rgb"][i][0] - (10 * i) % 256) < 1e-6, i
        assert sum(out["luminance_hist"][i]) == 32 * 24


def test_hll_sketch_accuracy_and_merge(ray_session):
    """HLL distinct-user sketch: estimates within the m=512 error bound
    (~3/sqrt(512) ≈ 13% at 3σ) of exact per-window cardinalities, and the
    partial-register merge is order-independent (associative max)."""
    import duckdb

    from lucene_kmp_ray.pipelines.sketches import hll_user_counts

    sf = "/root/testdata/sf0.001"
    got = hll_user_counts(sf).to_pandas().set_index("window_us")
    con = duckdb.connect()
    exact = con.sql(
        "SELECT (epoch_us(ts) // 900000000) * 900000000 AS w, "
        "count(DISTINCT user_id) AS n FROM "
        f"'{sf}/events.parquet' GROUP BY w").df().set_index("w")
    assert set(got.index) == set(exact.index)
    for w in got.index:
        est, true = got.loc[w, "est_users_r"], int(exact.loc[w, "n"])
        assert abs(est - true) <= max(3, 0.15 * true), (w, est, true)


def test_cms_overestimate_property(ray_session):
    """Count-Min estimates are >= the exact counts (one-sided error) and
    tight at this scale (31-term vocab, 4x1024 counters → collisions
    essentially never)."""
    import duckdb

    from lucene_kmp_ray.pipelines.sketches import cms_term_counts

    sf = "/root/testdata/sf0.001"
    got = cms_term_counts(sf).set_index("term")
    con = duckdb.connect()
    from lucene_kmp_ray.analysis.standard import sql_tokens_expr
    exact = con.sql(
        f"WITH t AS (SELECT unnest({sql_tokens_expr('text')}) AS term "
        f"FROM '{sf}/documents.parquet') "
        "SELECT term, count(*) AS n FROM t GROUP BY term").df() \
        .set_index("term")
    for t in got.index:
        est, true = int(got.loc[t, "est_count"]), int(exact.loc[t, "n"])
        assert est >= true, t          # CMS never under-estimates
        assert est <= true * 1.5 + 10, t
