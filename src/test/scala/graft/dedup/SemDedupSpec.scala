package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec
import graft.sources.Tables

/** SemDeDup: the nlist=1 exactness gate (single cluster == the exact
  * global tier), clustered-route containment (pairs ⊆ exact pairs),
  * the paper's centroid keep policy on a hand-computed fixture, and
  * partitioning invariance.
  */
class SemDedupSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val Tau = 0.35

  private def emb = Tables.embeddings(spark, dir)

  private def pairSet(df: DataFrame): Set[(Long, Long, Double)] =
    df.select("id_a", "id_b", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("nlist=1 pairs equal the exact all-pairs tier") {
    val idx = SemDedup.assignClusters(emb, col("vec_id"), col("embedding"), nlist = 1)
    val sem = pairSet(SemDedup.semanticPairs(idx, Tau))
    val exact = pairSet(EmbeddingDedup.cosinePairs(emb, col("vec_id"),
      col("embedding"), Tau))
    assert(sem == exact)
    assert(sem.nonEmpty, "fixture must produce near-dup pairs at the threshold")
  }

  test("clustered pairs are a subset of the exact pairs") {
    val idx = SemDedup.assignClusters(emb, col("vec_id"), col("embedding"), nlist = 4)
    val sem = pairSet(SemDedup.semanticPairs(idx, Tau))
    val exact = pairSet(EmbeddingDedup.cosinePairs(emb, col("vec_id"),
      col("embedding"), Tau))
    assert(sem.subsetOf(exact))
    assert(sem.nonEmpty, "within-cluster near-dups must survive clustering")
  }

  test("keep rule: drops exactly the docs with a lower-id neighbor above tau") {
    val idx = SemDedup.assignClusters(emb, col("vec_id"), col("embedding"), nlist = 1)
    val keep = SemDedup.semanticKeep(idx, Tau, SemDedup.KeepLowestId)
      .select("id", "is_keeper").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val exact = pairSet(EmbeddingDedup.cosinePairs(emb, col("vec_id"),
      col("embedding"), Tau))
    // a doc is dropped iff it appears as the HIGHER id of some pair
    val droppedExpected = exact.map(_._2)
    val all = emb.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(keep.keySet == all, "every doc must receive a verdict")
    assert(keep.filterNot(_._2).keySet == droppedExpected)
  }

  test("centroid policy keeps boundary examples, drops the prototype") {
    import spark.implicits._
    // a=(1,0) and c=(0.8,0.6) both neighbor b=(0.95,0.3122) at tau=0.94
    // but not each other (cos(a,c)=0.8); centroid = mean of the three,
    // so centroid-cosines rank c (0.9482) < a (0.9491) < b (~1.0):
    // the prototypical middle vector is the one that gets dropped
    val df = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.95f, 0.3122f)),
      (3L, Array(0.8f, 0.6f))
    ).toDF("id", "emb")
    val idx = SemDedup.assignClusters(df, col("id"), col("emb"), nlist = 1)
    val keepers = SemDedup.semanticKeep(idx, 0.94, SemDedup.KeepFarthestFromCentroid)
      .where(col("is_keeper")).select("id").collect().map(_.getLong(0)).toSet
    assert(keepers == Set(1L, 3L))
    // lowest-id policy keeps only a: b is dropped by neighbor a, and c
    // by neighbor b (the rule is pairwise-local — a LOWER-id neighbor
    // above the threshold drops you even if that neighbor was itself
    // dropped). The centroid policy's {1,3} vs this {1} is exactly the
    // paper's point: id order evicts boundary examples the
    // centroid-distance order keeps.
    val byId = SemDedup.semanticKeep(idx, 0.94, SemDedup.KeepLowestId)
      .where(col("is_keeper")).select("id").collect().map(_.getLong(0)).toSet
    assert(byId == Set(1L))
  }

  test("keep verdicts are invariant to input partitioning") {
    val idx8 = SemDedup.assignClusters(emb.repartition(8), col("vec_id"),
      col("embedding"), nlist = 4)
    val idx1 = SemDedup.assignClusters(emb.coalesce(1), col("vec_id"),
      col("embedding"), nlist = 4)
    def verdicts(i: graft.vector.Ann.IvfIndex): Seq[(Long, Boolean)] =
      SemDedup.semanticKeep(i, Tau, SemDedup.KeepFarthestFromCentroid)
        .select("id", "is_keeper").collect()
        .map(r => (r.getLong(0), r.getBoolean(1))).sortBy(_._1).toSeq
    assert(verdicts(idx8) == verdicts(idx1))
  }

  test("every dropped doc has a same-cluster neighbor above the threshold") {
    val idx = SemDedup.assignClusters(emb, col("vec_id"), col("embedding"), nlist = 4)
    val dropped = SemDedup.semanticKeep(idx, Tau)
      .where(!col("is_keeper")).select("id").collect().map(_.getLong(0)).toSet
    val withNeighbors = SemDedup.semanticPairs(idx, Tau)
      .select(explode(array(col("id_a"), col("id_b"))).as("id"))
      .collect().map(_.getLong(0)).toSet
    assert(dropped.subsetOf(withNeighbors))
    assert((withNeighbors -- dropped).nonEmpty,
      "at least one member of every neighborhood must survive")
  }
}
