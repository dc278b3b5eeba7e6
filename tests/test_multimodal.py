"""Multimodal plumbing tests: schemas, Arrow batch shapes, row fan-out,
determinism (the codec is a deterministic fake; the Spark mechanics are
real — see codedup/multimodal.py docstring)."""

import numpy as np
import pytest

from codedup import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    return spark.createDataFrame(
        M.synth_media(spark, 30).collect(), M.MEDIA_SCHEMA
    ).cache()


def test_synth_schema_and_kinds(media):
    assert media.schema == M.MEDIA_SCHEMA
    kinds = {r["kind"] for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_decode_images(media):
    out = M.decode_images(media).toPandas().set_index("media_id")
    meta = {r["media_id"]: r["meta"] for r in media.filter("kind='image'").collect()}
    assert set(out.index) == set(meta)
    for mid, row in out.iterrows():
        assert row["width"] == meta[mid]["width"]
        assert row["height"] == meta[mid]["height"]
        assert len(row["pixels"]) == row["width"] * row["height"]
        assert 0 <= row["mean_px"] <= 255


def test_resize_images(media):
    out = M.resize_images(media, 8, 8).toPandas()
    assert (out.width == 8).all() and (out.height == 8).all()
    assert out.pixels.map(len).eq(64).all()


def test_frame_sampling_fanout(media):
    frames = M.sample_frames(media, every_n=2).toPandas()
    vids = {r["media_id"]: r["meta"] for r in media.filter("kind='video'").collect()}
    for mid, meta in vids.items():
        n_frames = meta["duration_ms"] // 40
        expected = len(range(0, n_frames, 2))
        got = frames[frames.media_id == mid]
        assert len(got) == expected
        assert sorted(got.frame_idx) == list(range(0, n_frames, 2))
        assert got.frame.map(len).eq(16 * 16).all()


def test_feature_extraction_feeds_ann(media):
    feats = M.extract_features(media, dim=16).toPandas()
    assert len(feats) == 30
    for v in feats.feature:
        arr = np.array(v, dtype="float32")
        assert arr.shape == (16,)
        assert abs(np.linalg.norm(arr) - 1.0) < 1e-5


def test_determinism_across_partitionings(spark, media):
    a = M.extract_features(media).toPandas().sort_values("media_id", ignore_index=True)
    b = (
        M.extract_features(media.repartition(7))
        .toPandas()
        .sort_values("media_id", ignore_index=True)
    )
    assert a.media_id.equals(b.media_id)
    assert all(list(x) == list(y) for x, y in zip(a.feature, b.feature))


def test_real_decoder_is_gated():
    with pytest.raises(NotImplementedError, match="Pillow"):
        M.decode_real_image(None)


def test_decode_real_image_with_pil_if_present(spark):
    """Runs only where Pillow exists (not this sandbox): a real PNG
    decodes through the same schema as the SMF path, and junk bytes
    become a FAULT row instead of a task failure."""
    PIL = pytest.importorskip("PIL.Image")
    import io

    import numpy as np

    buf = io.BytesIO()
    arr = np.arange(64, dtype=np.uint8).reshape(8, 8)
    PIL.fromarray(arr, mode="L").save(buf, format="PNG")
    media = spark.createDataFrame(
        [(1, "image", bytearray(buf.getvalue()), (8, 8, None, None, "png")),
         (2, "image", bytearray(b"not an image"), (0, 0, None, None, "png"))],
        M.MEDIA_SCHEMA,
    )
    rows = {r["media_id"]: r for r in M.decode_real_image(media).collect()}
    assert (rows[1]["width"], rows[1]["height"]) == (8, 8)
    assert bytes(rows[1]["pixels"]) == arr.tobytes()
    assert rows[2]["width"] == -1  # fault row, not a crash
