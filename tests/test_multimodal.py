"""Multimodal plumbing: typed binary columns + Arrow-batched feature
extraction + frame sampling.  The decode kernel is stubbed by design (no
codec libs in this environment); what's asserted here is the REAL part
-- schema, determinism, batch shape, and the gate on the stub."""

from __future__ import annotations

import pytest

from uofi_payroll_etl_main_spark.llm.multimodal import (
    FEATURE_DIM,
    decode_media,
    extract_features,
    sample_frames,
    synth_media,
)


def test_synth_media_schema_and_determinism(spark):
    df = synth_media(spark, 30)
    schema = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert schema == {
        "media_id": "bigint",
        "kind": "string",
        "payload": "binary",
        "meta": "map<string,string>",
    }
    a = sorted((r.media_id, bytes(r.payload)) for r in df.collect())
    b = sorted((r.media_id, bytes(r.payload)) for r in synth_media(spark, 30).collect())
    assert a == b  # sha2-derived payloads: identical across invocations
    kinds = {r.kind for r in df.collect()}
    assert kinds == {"image", "audio", "video"}


def test_extract_features_shape_and_determinism(spark):
    df = synth_media(spark, 24)
    out = extract_features(df)
    rows = out.collect()
    assert len(rows) == 24
    for r in rows:
        assert len(r.feature) == FEATURE_DIM
        assert all(0.0 <= x < 1.0 for x in r.feature)
        assert r.n_bytes == 32  # sha2-256 payload
    again = {r.media_id: r.feature for r in extract_features(df).collect()}
    assert all(again[r.media_id] == r.feature for r in rows)


def test_extract_features_partitioned_batches(spark):
    # batch shape must not affect results: 1 partition vs 8 partitions
    df = synth_media(spark, 40)
    one = {r.media_id: r.feature for r in extract_features(df.coalesce(1)).collect()}
    many = {r.media_id: r.feature for r in extract_features(df.repartition(8)).collect()}
    assert one == many


def test_decode_media_is_gated(spark):
    with pytest.raises(NotImplementedError, match="no decoder available"):
        decode_media(b"\x00", "image")
    # and the non-stub path surfaces the gate through the Spark plan
    df = synth_media(spark, 3)
    with pytest.raises(Exception, match="no decoder available"):
        extract_features(df, use_stub=False).collect()


def test_sample_frames_every_n(spark):
    df = synth_media(spark, 30)
    out = sample_frames(df, every_n=2).collect()
    assert all(r.frame_idx % 2 == 0 for r in out)
    by_media = {}
    for r in out:
        by_media.setdefault(r.media_id, []).append(r.frame_idx)
    meta = {r.media_id: int(r.meta["frames"]) for r in df.filter("kind = 'video'").collect()}
    assert set(by_media) == set(meta)  # only video rows sampled
    for mid, idxs in by_media.items():
        assert sorted(idxs) == list(range(0, meta[mid], 2))


def test_resize_media_schema_and_determinism(spark):
    from uofi_payroll_etl_main_spark.llm.multimodal import resize_media

    df = synth_media(spark, 30)
    out = resize_media(df, width=32, height=16)
    assert out.columns == ["media_id", "kind", "width", "height", "payload"]
    rows = out.collect()
    # only image rows pass through; dims stamped; stub digest is 32 bytes
    assert rows and all(r.kind == "image" for r in rows)
    assert all(r.width == 32 and r.height == 16 for r in rows)
    assert all(len(bytes(r.payload)) == 32 for r in rows)
    # deterministic and dimension-sensitive
    again = {r.media_id: bytes(r.payload) for r in resize_media(df, 32, 16).collect()}
    other = {r.media_id: bytes(r.payload) for r in resize_media(df, 64, 64).collect()}
    first = {r.media_id: bytes(r.payload) for r in rows}
    assert first == again
    assert all(first[k] != other[k] for k in first)


def test_resize_media_non_stub_is_gated(spark):
    from uofi_payroll_etl_main_spark.llm.multimodal import resize_media

    with pytest.raises(Exception, match="no decoder available"):
        resize_media(synth_media(spark, 3), use_stub=False).collect()
