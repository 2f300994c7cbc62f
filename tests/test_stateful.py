"""applyInPandasWithState: state persists across micro-batches; final
emissions equal the batch ground truth."""

from pyspark.sql import functions as F

from datax_spark import fixtures
from datax_spark.streaming.runner import write_feed_ordered
from datax_spark.streaming.stateful import running_key_totals

N = 1200


def test_running_totals_across_batches(spark, tmp_path):
    feed = fixtures.change_events(spark, N, n_keys=240, n_repos=40, seed=42)
    fp = str(tmp_path / "feed")
    write_feed_ordered(feed, fp, n_files=4)

    stream = spark.readStream.schema(
        spark.read.parquet(fp).schema
    ).option("maxFilesPerTrigger", 1).parquet(fp)

    out = running_key_totals(stream, key_col="repo")
    q = (
        out.writeStream.format("memory")
        .queryName("totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination(300)
    assert not q.isActive

    # last emission per key (multiple batches → superseding updates)
    emitted = spark.sql(
        """
        SELECT key, n_events, last_lsn, bytes FROM (
          SELECT *, row_number() OVER (PARTITION BY key ORDER BY last_lsn DESC,
                                       n_events DESC) rn FROM totals)
        WHERE rn = 1
        """
    ).collect()
    got = {r.key: (r.n_events, r.last_lsn, r.bytes) for r in emitted}

    truth = {
        r.repo: (r.n, r.mx, r.b)
        for r in spark.read.parquet(fp)
        .groupBy("repo")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max("lsn").alias("mx"),
            F.sum(F.coalesce(F.octet_length("content"), F.lit(0))).alias("b"),
        )
        .collect()
    }
    assert got == truth
    # state genuinely crossed batches: some repo spans multiple files, so
    # its final total exceeds any single batch's contribution
    multi = spark.sql(
        "SELECT key, count(*) c FROM totals GROUP BY key HAVING count(*) > 1"
    ).count()
    assert multi > 0