"""Multimodal plumbing: binary payload → Arrow-batched feature extraction."""

from relational_data_loader_spark.operators.multimodal import (
    FEATURE_DIM,
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
