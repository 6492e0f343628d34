package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.embed.DeterministicEmbedder

/** File-drop streaming ingest: parquet files landing in a directory
  * flow through classification + embedding into the chunk-table sink.
  */
class StreamingIngestSpec extends AnyFunSuite with SparkSpec {

  test("drained file-drop ingest writes classified, embedded rows") {
    import spark.implicits._
    val in  = Files.createTempDirectory("graft-stream-in").toString
    val out = Files.createTempDirectory("graft-stream-out").toString
    val ckp = Files.createTempDirectory("graft-stream-ckp").toString

    val batch = Seq(
      (1L, "the appeal is allowed"),
      (2L, "appeal dismissed"),
      (3L, "no outcome at all")).toDF("doc_id", "text")
    batch.write.mode("overwrite").parquet(in)

    val q = StreamingIngest.start(spark, in, batch.schema, "doc_id", "text",
      lit(2), DeterministicEmbedder(dim = 8), out, ckp)
    q.awaitTermination(60000)

    val result = spark.read.parquet(out)
    assert(result.count() == 3)
    assert(result.select("case_decision").collect().map(_.getString(0)).sorted.toSeq
      == Seq("appellant_lost", "appellant_won", "invalid"))
    assert(result.select("court_level").collect().forall(_.getInt(0) == 2))
    assert(result.select("embedding").collect().forall(_.getSeq[Float](0).length == 8))
  }
}
