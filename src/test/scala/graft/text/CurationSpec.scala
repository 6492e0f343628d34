package graft.text

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class CurationSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    // (id, domain, score, tokens)
    (1L, "a", 0.9, 100L), (2L, "a", 0.8, 100L), (3L, "a", 0.7, 100L),
    (4L, "a", 0.7, 100L), (5L, "b", 0.5, 250L), (6L, "b", 0.4, 250L),
    (7L, "c", 0.1, 50L)
  ).toDF("id", "dom", "score", "toks")

  test("domainCap keeps the top-n by score with id tiebreak") {
    val kept = Curation.domainCap(corpus, col("dom"), col("id"),
        col("score"), maxDocs = 2)
      .select("id").as[Long].collect().toSet
    // domain a: scores 0.9, 0.8 win; the 0.7 tie (ids 3,4) is cut.
    assert(kept == Set(1L, 2L, 5L, 6L, 7L))
  }

  test("tie at the cap boundary resolves by ascending id") {
    val kept = Curation.domainCap(corpus, col("dom"), col("id"),
        col("score"), maxDocs = 3)
      .where(col("dom") === "a").select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L))   // id 3 beats id 4 on the tie
  }

  test("domainTokenBudget keeps the quality-ordered prefix inclusively") {
    val kept = Curation.domainTokenBudget(corpus, col("dom"), col("id"),
        col("score"), col("toks"), maxTokens = 250L)
      .select("id", "cum_tokens").as[(Long, Long)].collect().toMap
    // a: 100, 200 kept; 300 crosses. b: first doc alone hits 250
    // exactly (inclusive ≤ keeps it); second crosses. c: 50 kept.
    assert(kept == Map(1L -> 100L, 2L -> 200L, 5L -> 250L, 7L -> 50L))
  }

  test("a document larger than the whole budget blocks its domain") {
    val kept = Curation.domainTokenBudget(corpus, col("dom"), col("id"),
        col("score"), col("toks"), maxTokens = 40L)
      .count()
    assert(kept == 0L)
  }

  test("results are partitioning-invariant") {
    val base = Curation.domainCap(corpus, col("dom"), col("id"),
      col("score"), maxDocs = 2).select("id", "domain_rank")
      .collect().toSet
    val shuffled = Curation.domainCap(corpus.repartition(5, col("id")),
      col("dom"), col("id"), col("score"), maxDocs = 2)
      .select("id", "domain_rank").collect().toSet
    assert(base == shuffled)
  }
}
