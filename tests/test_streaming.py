"""Incremental ingest: streaming mention extraction must equal the batch
result, and resume its checkpoint across restarts (no reprocessing)."""

from kgce import schemas, streaming, synth, tagging


def _write_pages(spark, path, pages):
    spark.createDataFrame(pages, schema=schemas.PAGES).write.mode("append").parquet(path)


def test_stream_equals_batch_and_resumes(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    batch1 = synth.gen_pages(20, seed=51)
    _write_pages(spark, in_dir, batch1)

    q = streaming.stream_mentions_to_parquet(
        streaming.stream_pages(spark, in_dir), out_dir, ckpt
    )
    q.awaitTermination(120)
    got1 = spark.read.parquet(out_dir).count()
    want1 = tagging.extract_mentions(
        spark.createDataFrame(batch1, schema=schemas.PAGES)
    ).count()
    assert got1 == want1 > 0

    # second wave of files: restart picks up ONLY the new ones
    batch2 = synth.gen_pages(10, seed=52)
    _write_pages(spark, in_dir, batch2)
    q2 = streaming.stream_mentions_to_parquet(
        streaming.stream_pages(spark, in_dir), out_dir, ckpt
    )
    q2.awaitTermination(120)
    got2 = spark.read.parquet(out_dir).count()
    want2 = tagging.extract_mentions(
        spark.createDataFrame(batch2, schema=schemas.PAGES)
    ).count()
    assert got2 == want1 + want2  # incremental, no reprocessing
