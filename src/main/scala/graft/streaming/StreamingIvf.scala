package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.vector.VectorKernels

/** Incremental IVF index maintenance — the streaming half of the
  * "Spark batch-builds the vector index" story (BASELINE.json): the
  * coarse quantizer is trained in batch ([[graft.vector.Ann.buildIvf]],
  * seeded and deterministic), and arriving embeddings keep the index
  * fresh by being assigned to their nearest centroid and appended to
  * the cluster-partitioned layout the batch probe path prunes on.
  *
  * Scale design: assignment is the codegen
  * [[VectorKernels.nearestCentroid]] projection — STATELESS, so the
  * stream needs no state store, no watermark, and no shuffle; each
  * micro-batch is a narrow map followed by a partitioned file append.
  * Centroids ride along as a broadcast-sized literal table (nlist·d
  * doubles). Re-training (centroid drift) is a batch concern: rebuild
  * with `buildIvf` and swap directories — the classic offline-index /
  * online-append split the reference's Milvus deployment also makes
  * (`extract_and_embed.py:54` trains IVF_FLAT once at DDL time).
  */
object StreamingIvf {

  /** Annotate a (streaming or batch) frame with `cluster_id`. */
  def assign(df: DataFrame, centroids: Array[Array[Double]],
             emb: String = "embedding"): DataFrame =
    df.withColumn("cluster_id", VectorKernels.nearestCentroid(col(emb), centroids))

  /** Start the append sink: parquet partitioned by `cluster_id`, so a
    * probe reading `nprobe` clusters scans only those directories
    * (partition pruning proven in AnnSpec's layout test).
    */
  def assignAndWrite(stream: DataFrame, centroids: Array[Array[Double]],
                     outDir: String, checkpointDir: String,
                     emb: String = "embedding"): StreamingQuery =
    assign(stream, centroids, emb)
      .writeStream
      .partitionBy("cluster_id")
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .start()
}
