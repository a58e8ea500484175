"""Text-analysis kit on real documents; multimodal plumbing shapes."""

from __future__ import annotations

from pyspark.sql import functions as F

from zacks_estimates_financial_statements_spark.functions import text as T
from zacks_estimates_financial_statements_spark.operators import multimodal as M


def test_token_counts_and_quality(spark):
    df = spark.createDataFrame(
        [("the cat sat on the mat.",), ("",), ("a-b c_d 1,234!",)],
        "text string")
    out = df.select(
        T.whitespace_token_count(F.col("text")).alias("ws"),
        T.regex_token_count(F.col("text")).alias("rx"),
        T.quality_score(F.col("text")).alias("q")).collect()
    assert [r["ws"] for r in out] == [6, 0, 3]
    # "a-b c_d 1,234!": a,-,b,c,_,d,1,",",234,! -> 10 regex tokens
    assert [r["rx"] for r in out] == [7, 0, 10]
    assert out[0]["q"] > out[2]["q"]
    assert out[1]["q"] == 0.0


def test_detect_language_markers(spark):
    df = spark.createDataFrame(
        [("the cat and the dog of the house",),
         ("der Hund und die Katze ist nicht da",),
         ("le chat est dans la maison les jours",),
         ("zzz qqq xxx",)], "text string")
    out = [r[0] for r in df.select(T.detect_language(F.col("text"))).collect()]
    assert out == ["en", "de", "fr", "und"]


def test_fingerprint_invariance(spark):
    df = spark.createDataFrame(
        [("Hello,  World!",), ("hello world",), ("different",)], "t string")
    fps = [r[0] for r in df.select(T.fingerprint(F.col("t"))).collect()]
    assert fps[0] == fps[1] != fps[2]


def test_shingles(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",)], "t string")
    out = [r[0] for r in df.select(T.shingles(F.col("t"), 3).alias("s")).collect()]
    assert out[0] == ["a b c", "b c d"]
    assert out[1] == ["a b"]


def _media_df(spark):
    return spark.createDataFrame(
        [(1, "image", bytearray(b"\x01\x02\x03\x04"), "image/png", 2, 2, None),
         (2, "image", bytearray(b""), "image/png", 1, 1, None),
         (3, "video", bytearray(b"\xff" * 32), "video/mp4", 640, 480, 3500),
         (4, "audio", bytearray(b"\x00" * 8), "audio/wav", None, None, 2000)],
        M.MEDIA_SCHEMA)


def test_image_feature_plumbing(spark):
    feats = M.decode_image_features(_media_df(spark), dims=4).collect()
    by_id = {r["media_id"]: r for r in feats}
    assert set(by_id) == {1, 2}
    assert len(by_id[1]["features"]) == 4
    assert abs(sum(by_id[1]["features"]) - 1.0) < 1e-6
    assert by_id[2]["n_bytes"] == 0
    # determinism
    again = {r["media_id"]: r["features"]
             for r in M.decode_image_features(_media_df(spark), dims=4).collect()}
    assert again[1] == by_id[1]["features"]


def test_video_frame_sampling(spark):
    frames = M.sample_video_frames(_media_df(spark), every_ms=1000).collect()
    assert [(r["media_id"], r["frame_idx"], r["ts_ms"]) for r in frames] == \
        [(3, 0, 0), (3, 1, 1000), (3, 2, 2000), (3, 3, 3000)]


def test_metadata_projection_prunes_payload(spark, tmp_path):
    path = str(tmp_path / "media")
    _media_df(spark).write.parquet(path)
    meta = M.media_metadata_only(spark.read.parquet(path))
    plan = meta._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan  # column pruned at the scan
    assert meta.count() == 4
