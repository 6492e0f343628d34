package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class StreamingDecontamSpec extends AnyFunSuite with SparkSpec {

  test("stream screening flags benchmark n-gram overlap, stateless") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val benchmark = Seq(
      "the quick brown fox jumps over the lazy dog",
      "to be or not to be that is the question"
    ).toDF("text")
    val filter = StreamingDecontam.benchmarkFilter(benchmark, col("text"))

    val ms = MemoryStream[(Long, String)]
    val q = StreamingDecontam.screen(
        ms.toDS().toDF("doc_id", "text"), col("doc_id"), col("text"), filter)
      .writeStream.format("memory").queryName("screened")
      .outputMode("append").start()
    try {
      ms.addData(
        (1L, "completely unrelated words about distributed query engines"),
        (2L, "he said the quick brown fox jumps over whatever"),  // overlap
        (3L, "tiny"))                                             // < n tokens
      q.processAllAvailable()
      ms.addData((4L, "to be or not to be again"))                // overlap, batch 2
      q.processAllAvailable()

      val rows = spark.table("screened")
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
      assert(!rows(1L)._2, s"clean doc flagged: ${rows(1L)}")
      assert(rows(2L)._2 && rows(2L)._1 >= 1, s"overlap missed: ${rows(2L)}")
      assert(rows(3L) == (0L, false), "sub-n doc must screen clean")
      assert(rows(4L)._2, "cross-batch screening must not need state")
      assert(rows.size == 4)
    } finally q.stop()
  }

  test("streamed clip equals batch clipAgainst exactly, even at an adversarial fpp") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val n = 3
    val bench = Seq("eval q1 q2 q3 answer key").toDF("text")
    val train = Seq(
      (1L, "intro q1 q2 q3 outro words"),   // quotes the benchmark
      (2L, "wholly unrelated training text here"),
      (3L, "q1 q2 q3"),                     // pure benchmark content
      (4L, "padding sentence with many clean tokens inside"),
      (5L, "tail mention of q2 q3 answer key here"))
      .toDF("doc_id", "text")
    val want = graft.dedup.Spans.clipAgainst(train, col("doc_id"),
        col("text"), bench, col("text"), n)
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    // fpp 0.5 forces false positives through the exact clip: output
    // must STILL equal the batch operator byte for byte
    val filter = StreamingDecontam.benchmarkFilter(bench, col("text"),
      n = n, fpp = 0.5)
    val ms = MemoryStream[(Long, String)]
    val out = scala.collection.mutable.ArrayBuffer[Seq[Any]]()
    val q = StreamingDecontam.clipStream(
      ms.toDS().toDF("doc_id", "text"), col("doc_id"), col("text"),
      bench, col("text"), filter, n) { b =>
      out.synchronized { out ++= b.collect().map(_.toSeq) }
    }
    try {
      ms.addData((1L, "intro q1 q2 q3 outro words"),
        (2L, "wholly unrelated training text here"))
      q.processAllAvailable()
      ms.addData((3L, "q1 q2 q3"),
        (4L, "padding sentence with many clean tokens inside"),
        (5L, "tail mention of q2 q3 answer key here"))
      q.processAllAvailable()
    } finally q.stop()
    val got = out.toSeq.sortBy(_.head.asInstanceOf[Long].longValue)
    assert(got == want, s"got=$got want=$want")
  }
}
