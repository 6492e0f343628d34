package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.sources.Tables
import graft.vector.Ann

class StreamingIvfSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("streamed embeddings land in the batch-trained cluster layout") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val corpus = Tables.embeddings(spark, dir)
    val idx = Ann.buildIvf(corpus, nlist = 4)

    // batch truth for the first 20 vectors
    val expected = StreamingIvf.assign(corpus.where(col("vec_id") < 20), idx.centroids)
      .select("vec_id", "cluster_id")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

    val rows = corpus.where(col("vec_id") < 20)
      .select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect().toSeq

    val out = Files.createTempDirectory("ivf-stream-out").toString
    val ckpt = Files.createTempDirectory("ivf-stream-ckpt").toString
    val ms = MemoryStream[(Long, Array[Float])]
    val q = StreamingIvf.assignAndWrite(
      ms.toDS().toDF("vec_id", "embedding"), idx.centroids, out, ckpt)
    try {
      ms.addData(rows.take(10))
      q.processAllAvailable()
      ms.addData(rows.drop(10))
      q.processAllAvailable()
    } finally q.stop()

    val written = spark.read.parquet(out)
      .select("vec_id", "cluster_id")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(written == expected)

    // the append produced the partition-pruned directory layout
    val dirs = new java.io.File(out).listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("cluster_id=")).toSet
    assert(dirs.nonEmpty && dirs == expected.values.toSet.map((c: Int) => s"cluster_id=$c"))
  }
}
