"""Multimodal plumbing: binary payload → Arrow-batched feature extraction."""

from relational_data_loader_spark.operators.multimodal import (
    FEATURE_DIM,
    MEDIA_SCHEMA,
    extract_features,
    synthesize_media,
)


def test_feature_extraction_shape_and_determinism(spark):
    media = synthesize_media(spark, n=60)
    feats = extract_features(media).orderBy("item_id").collect()
    assert len(feats) == 60
    for r in feats:
        assert r["feature"] is not None and len(r["feature"]) == FEATURE_DIM
        assert r["n_bytes"] > 0
    # deterministic: same payload → same features across runs
    again = extract_features(synthesize_media(spark, n=60)).orderBy("item_id").collect()
    assert [list(r["feature"]) for r in feats] == [list(r["feature"]) for r in again]


def test_null_payload_passthrough(spark):
    import pyspark.sql.functions as F

    media = synthesize_media(spark, n=9).withColumn(
        "payload", F.when(F.col("item_id") % 3 == 0, None).otherwise(F.col("payload"))
    )
    out = extract_features(media).orderBy("item_id").collect()
    assert all(
        (r["feature"] is None) == (r["item_id"] % 3 == 0) for r in out
    )


def test_register_decoder_seam(spark):
    """A deployment-injected kernel must be used by plans built AFTER
    registration (the registry snapshots into the closure — cluster-safe)."""
    from relational_data_loader_spark.operators.multimodal import (
        DECODERS,
        FEATURE_DIM,
        extract_features,
        register_decoder,
        synthesize_media,
    )

    before = dict(DECODERS)
    try:
        register_decoder("image", lambda payload: [42.0] * FEATURE_DIM)
        df = synthesize_media(spark, n=30)
        out = extract_features(df).filter("media_type = 'image'").collect()
        assert out and all(r["feature"] == [42.0] * FEATURE_DIM for r in out)
        # non-registered types keep the deterministic fake
        other = extract_features(df).filter("media_type = 'audio'").limit(1).collect()
        assert other[0]["feature"] != [42.0] * FEATURE_DIM
    finally:
        DECODERS.clear()
        DECODERS.update(before)


def test_load_decoders_from_env(monkeypatch):
    import sys
    import types

    from relational_data_loader_spark.operators import multimodal as mm

    mod = types.ModuleType("_fake_decoder_pkg")
    mod.decoders = lambda: {"image": lambda b: [1.0] * mm.FEATURE_DIM}
    monkeypatch.setitem(sys.modules, "_fake_decoder_pkg", mod)
    monkeypatch.setenv("RDL_MEDIA_DECODERS", "_fake_decoder_pkg:decoders")
    before = dict(mm.DECODERS)
    try:
        assert mm.load_decoders_from_env() == ["image"]
        assert mm.DECODERS["image"](b"x") == [1.0] * mm.FEATURE_DIM
    finally:
        mm.DECODERS.clear()
        mm.DECODERS.update(before)


def test_resize_stamps_target_geometry(spark):
    from relational_data_loader_spark.operators.multimodal import resize_media

    rows = [(1, "image", bytearray(b"abcdefgh"), 4, 2, None),
            (2, "image", None, None, None, None)]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r["item_id"]: r for r in resize_media(df, 3, 2).collect()}
    assert len(out[1]["payload"]) == 6          # width*height bytes
    assert (out[1]["width"], out[1]["height"]) == (3, 2)
    assert out[2]["payload"] is None and out[2]["width"] is None


def test_frame_sample_explodes_rows_and_bounds_batches(spark):
    from relational_data_loader_spark.operators.multimodal import sample_frames

    rows = [(1, "video", bytearray(b"0123456789ab"), None, None, 12_000),
            (2, "video", None, None, None, None)]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = sample_frames(df, 4).orderBy("item_id", "frame_idx").collect()
    # item 1 → 4 frames of 3 bytes each; null payload yields no rows
    assert [(r["item_id"], r["frame_idx"]) for r in out] == [
        (1, 0), (1, 1), (1, 2), (1, 3)]
    assert [bytes(r["frame"]) for r in out] == [b"012", b"345", b"678", b"9ab"]


def test_transform_registry_seam(spark):
    """register_transform swaps the kernel before plan build, like
    register_decoder (closure-snapshot contract)."""
    from relational_data_loader_spark.operators import multimodal as mm

    orig = mm.TRANSFORMS["resize"]
    try:
        mm.register_transform("resize", lambda p, w, h: b"X" * (w * h))
        df = spark.createDataFrame(
            [(1, "image", bytearray(b"zz"), None, None, None)], MEDIA_SCHEMA)
        out = mm.resize_media(df, 2, 2).collect()[0]
        assert bytes(out["payload"]) == b"XXXX"
    finally:
        mm.register_transform("resize", orig)
