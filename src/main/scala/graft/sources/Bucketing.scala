package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout — the co-located-join half of the engine's
  * partitioning story (the other half is the chunk table's
  * `partitionBy(court_level)` pruning in [[graft.api.Ingest]]).
  *
  * Writing both sides of a recurring equi-join bucketed (and
  * bucket-sorted) by the join key fixes the partitioning AT WRITE
  * TIME: every subsequent join on that key is planned as a sort-merge
  * join with NO Exchange and NO per-query Sort — the shuffle that
  * dominates a fact-fact join at 100 TB is paid once, at ingest, and
  * amortized over every query after. This is Spark's equivalent of the
  * reference loading its Milvus collection pre-indexed
  * (`/root/reference/extract_and_embed.py:57-58`): organize once,
  * query many times.
  *
  * Bucket count guidance at scale: `table_size / bucket_count` should
  * land in the 100 MB–1 GB range per bucket file, and both join sides
  * must use the SAME count (or an integer multiple) for the exchange
  * to be elided.
  */
object Bucketing {

  /** Write `df` as an external parquet table bucketed and sorted by
    * `key`. The table name lands in the session catalog; data lives
    * under `path`.
    *
    * The pre-write `repartition(numBuckets, key)` uses the SAME
    * Murmur3-mod-buckets assignment as the bucketed writer, so each
    * task holds exactly one bucket and each bucket lands as ONE file.
    * Without it every upstream task writes a sliver of every bucket —
    * tasks × buckets small files, metadata-bound at any scale (the
    * small-file problem). Size `numBuckets` so one bucket ≈ 100 MB–1 GB
    * and this repartition is also the right write parallelism.
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    key: String, numBuckets: Int): Unit =
    df.repartition(numBuckets, org.apache.spark.sql.functions.col(key))
      .write.mode(SaveMode.Overwrite)
      .format("parquet")
      .option("path", path)
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Number of shuffle exchanges in the executed plan — bucketing
    * exists to drive the pre-join count to zero.
    */
  def countExchanges(df: DataFrame): Int =
    "Exchange hashpartitioning".r
      .findAllIn(df.queryExecution.executedPlan.toString).length

  def dropTable(spark: SparkSession, table: String): Unit =
    spark.sql(s"DROP TABLE IF EXISTS $table")
}
