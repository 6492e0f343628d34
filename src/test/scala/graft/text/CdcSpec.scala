package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class CdcSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def chunksOf(rows: Seq[(Long, String)]) =
    Cdc.cdcChunks(rows.toDF("doc_id", "text"), col("doc_id"), col("text"))

  test("chunks reassemble the document exactly") {
    val text = scala.util.Random.javaRandomToRandom(new java.util.Random(7))
      .alphanumeric.take(2000).mkString
    val got = chunksOf(Seq((1L, text)))
      .orderBy("chunk_idx")
      .select("start", "chunk_len").as[(Long, Long)].collect()
    assert(got.head._1 == 1L)
    got.sliding(2).foreach {
      case Array((s1, l1), (s2, _)) => assert(s2 == s1 + l1)
      case _ =>
    }
    assert(got.map(_._2).sum == text.length.toLong)
    assert(got.forall(_._2 > 0))
  }

  test("an edit changes only chunks near the edit site") {
    val rnd = scala.util.Random.javaRandomToRandom(new java.util.Random(11))
    val text = rnd.alphanumeric.take(4000).mkString
    // flip one character in the middle
    val edited = text.substring(0, 2000) + "!" + text.substring(2001)
    val a = chunksOf(Seq((1L, text))).select("chunk_md5").as[String].collect().toSet
    val b = chunksOf(Seq((1L, edited))).select("chunk_md5").as[String].collect().toSet
    val shared = (a intersect b).size
    // all chunks except the edited one (and at most its W-neighbor
    // boundary splits) survive — fixed-stride chunking would share
    // only the prefix before the edit
    assert(shared >= a.size - 3, s"shared=$shared of ${a.size}")
    assert(a != b)
  }

  test("short and empty documents") {
    val got = chunksOf(Seq((1L, "tiny"), (2L, ""), (3L, "x" * 7)))
      .select("id", "chunk_idx", "chunk_len").as[(Long, Int, Long)].collect()
    // empty doc emits nothing; sub-window docs are one whole chunk
    assert(got.toSet == Set((1L, 0, 4L), (3L, 0, 7L)))
  }

  test("mean chunk length tracks the modulus") {
    val rnd = scala.util.Random.javaRandomToRandom(new java.util.Random(13))
    val text = rnd.alphanumeric.take(20000).mkString
    val n = chunksOf(Seq((1L, text))).count()
    val mean = 20000.0 / n
    assert(mean > 30 && mean < 130, s"mean=$mean")  // target ~64
  }

  test("deterministic under repartitioning") {
    val docs = (1L to 50L).map(i => (i, s"document $i " * 20))
    val a = chunksOf(docs).collect().map(_.toString).sorted
    val b = Cdc.cdcChunks(docs.toDF("doc_id", "text").repartition(7),
      col("doc_id"), col("text")).collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }
}
