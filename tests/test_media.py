"""Multimodal media plumbing: span extraction, decode stage, plans."""

import hashlib

import pytest
from pyspark.sql import functions as F

from geomesa_spark.operators import media as M
from geomesa_spark.sources.docs import synth_docs


@pytest.fixture(scope="module")
def docs(spark):
    return synth_docs(spark, 200).cache()


def test_extract_media_refs(spark, docs):
    refs = M.extract_media_refs(docs)
    rows = refs.collect()
    assert len(rows) > 0
    for r in rows:
        assert r.media_ref.startswith("media://")
    # parent docs untouched (span invariant): same spans as before
    assert docs.select(F.sum(F.size("spans"))).first()[0] is not None
    # every media span of a sample doc is present with its offset
    d = docs.first()
    want = [(s.media_ref, s.offset) for s in d.spans if s.kind == "media"]
    got = [
        (r.media_ref, r.span_offset)
        for r in refs.filter(F.col("doc_id") == d.doc_id).collect()
    ]
    assert sorted(got) == sorted(want)


def test_decode_media_deterministic(spark, docs):
    meta = M.decode_media(M.extract_media_refs(docs).limit(50))
    rows = meta.collect()
    assert len(rows) == 50
    for r in rows:
        h = hashlib.md5(r.media_ref.encode()).digest()
        assert r.media_kind == M.MEDIA_KINDS[h[0] % 3]
        assert len(r.feature) == M.FEATURE_DIM
        if r.media_kind == "audio":
            assert r.sample_rate > 0 and r.width == 0
        else:
            assert r.width > 0 and r.height > 0


def test_custom_decoder_swaps_in(spark, docs):
    def dec(ref, payload):
        return {
            "media_kind": "image",
            "width": 2,
            "height": 3,
            "n_frames": 1,
            "sample_rate": 0,
            "feature": [0.0] * M.FEATURE_DIM,
        }

    meta = M.decode_media(M.extract_media_refs(docs).limit(5), decoder=dec)
    for r in meta.collect():
        assert (r.width, r.height) == (2, 3)


def test_resize_plan(spark, docs):
    meta = M.decode_media(M.extract_media_refs(docs))
    resized = M.resize_plan(meta, max_side=128).collect()
    assert len(resized) > 0
    for r in resized:
        assert max(r.width, r.height) <= 128
        assert min(r.width, r.height) >= 1


def test_frame_sample_plan(spark, docs):
    meta = M.decode_media(M.extract_media_refs(docs)).cache()
    vids = {r.media_ref: r.n_frames for r in
            meta.filter(F.col("media_kind") == "video").collect()}
    frames = M.frame_sample_plan(meta, every_n=10).collect()
    by_ref = {}
    for r in frames:
        by_ref.setdefault(r.media_ref, []).append(r.frame_idx)
    assert set(by_ref) == set(vids)
    for ref, idxs in by_ref.items():
        assert idxs == list(range(0, vids[ref], 10))


def test_frame_sample_plan_zero_frame_video(spark):
    """A corrupt asset decoded to n_frames=0 must emit no rows — not
    abort the job with sequence(0, -1)."""
    meta = spark.createDataFrame(
        [("d1", "ref1", "video", 0), ("d2", "ref2", "video", 3)],
        "doc_id string, media_ref string, media_kind string, n_frames int",
    )
    rows = M.frame_sample_plan(meta, every_n=2).collect()
    assert {(r.media_ref, r.frame_idx) for r in rows} == {("ref2", 0), ("ref2", 2)}
