package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Global cumulative aggregates WITHOUT the single-partition window.
  *
  * `sum(x) OVER (ORDER BY k)` in Spark plans a window with no
  * PARTITION BY — every row is shuffled into ONE partition and one
  * task folds the whole table. Fine at sf0.01; a non-starter at 100 TB
  * (the reference has no running-total op at all — this is part of the
  * training-data extension surface, e.g. token-budget sequence
  * packing, cumulative corpus size by shard, sampling quotas).
  *
  * The scalable shape is the classic two-phase scan (RDD
  * `zipWithIndex`'s generalization):
  *
  *   1. range-partition by the order key and sort within partitions —
  *      the ONE full shuffle,
  *   2. per-partition partial sums — a tiny jobs whose result is
  *      `numPartitions` longs on the driver,
  *   3. exclusive prefix over those (driver-side, proportional to the
  *      cluster size, never the data),
  *   4. a second pass over THE SAME partitions adding each row's
  *      running total to its partition's offset.
  *
  * Both passes run over one RDD, so they see the identical partition
  * structure; the second pass reads the already-written shuffle files
  * (stage reuse), not the source. A previous implementation kept
  * everything in one DataFrame plan, tagging rows with
  * `spark_partition_id()` and joining per-partition offsets back —
  * WRONG under adaptive execution: AQE may coalesce the two reads of
  * the range exchange differently, so the offsets branch and the data
  * branch can disagree about partition ids (observed as
  * nondeterministic row numbers at sf0.01). Partition identity must
  * come from one materialized RDD, not from re-evaluated plan
  * branches.
  *
  * Cross-engine determinism requires the order key to be globally
  * unique (running totals are ROWS-frame: ties would fold in
  * partition-fetch order); pass a tie-breaking column when the leading
  * key can repeat. Null `value`s count as 0.
  */
object Prefix {

  private val ValCol = "__prefix_val"

  /** Core two-phase running total. `out` = running sum of `value`
    * (cast to long; integer partials keep the re-association exact at
    * any partitioning) over rows ordered globally by `order`,
    * inclusive of the current row.
    */
  def withCumSum(df: DataFrame, value: Column, out: String,
                 order: Column*): DataFrame = {
    val taken = df.columns.toSet
    require(!taken.contains(out), s"output column '$out' already exists")
    require(!taken.contains(ValCol), s"column name '$ValCol' is reserved by Prefix")
    require(order.nonEmpty, "at least one order column is required")

    val spark = df.sparkSession
    val n = spark.sessionState.conf.numShufflePartitions
    val sorted = df
      .withColumn(ValCol, coalesce(value.cast("long"), lit(0L)))
      .repartitionByRange(n, order: _*)
      .sortWithinPartitions(order: _*)
    val schema = sorted.schema
    val valIdx = schema.fieldIndex(ValCol)

    // one RDD → both jobs share the exact same partition structure
    val rdd = sorted.rdd
    val partials = rdd.mapPartitionsWithIndex { (pid, it) =>
      var s = 0L
      it.foreach(r => s += r.getLong(valIdx))
      Iterator((pid, s))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = partials.scanLeft(0L)(_ + _) // exclusive prefix, length n+1
    val bc = spark.sparkContext.broadcast(offsets)

    val outRdd = rdd.mapPartitionsWithIndex { (pid, it) =>
      var run = bc.value(pid)
      it.map { r =>
        run += r.getLong(valIdx)
        Row.fromSeq(r.toSeq :+ run)
      }
    }
    spark.createDataFrame(outRdd,
        StructType(schema.fields :+ StructField(out, LongType, nullable = false)))
      .drop(ValCol)
  }

  /** `out` = global 1-based row number by `order` — a running count. */
  def withRowNumber(df: DataFrame, out: String, order: Column*): DataFrame =
    withCumSum(df, lit(1L), out, order: _*)

  /** Token-budget sequence packing ("concat-and-split"): documents are
    * laid out in a deterministic global order (the caller's `order` —
    * typically a sha256 mix key) and cut into consecutive sequences of
    * at most `budget` tokens by START OFFSET: a document beginning at
    * running offset `o` joins sequence `floor(o / budget)`. This is
    * the contiguous-packing strategy an LLM pre-training loader uses
    * when documents are concatenated and split at the token budget —
    * expressed as pure cumulative arithmetic, so it scales exactly
    * like [[withCumSum]] (one range shuffle, no global window) and has
    * an exact SQL twin for the oracle.
    *
    * Returns the input plus `seq_id` and `start_off`. Oversized single
    * documents (ntokens > budget) still get the sequence their start
    * offset lands in — downstream splitting is the loader's job, as in
    * the reference's greedy packer (F2) where a >400-word paragraph
    * seeds the next chunk whole (SURVEY §2 F2).
    */
  def packSequences(df: DataFrame, nTokens: Column, budget: Long,
                    order: Column*): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    withCumSum(df, nTokens.cast("long"), "__cum_tok", order: _*)
      .withColumn("start_off", col("__cum_tok") - nTokens.cast("long"))
      .withColumn("seq_id", floor(col("start_off") / budget))
      .drop("__cum_tok")
  }
}
