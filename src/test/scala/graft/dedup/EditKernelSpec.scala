package graft.dedup

import scala.util.Random

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Parity of [[EditKernel.editDist]] with Spark's own
  * `levenshtein(l, r, threshold)` — the kernel replaces the built-in
  * in the edit-verified tier, so its contract (code-point distance,
  * −1 over threshold, null propagation) must match bit-for-bit on any
  * input, not just the gate fixture.
  */
class EditKernelSpec extends AnyFunSuite with SparkSpec {

  private def crossCheck(pairs: Seq[(String, String, Int)]): Unit = {
    import spark.implicits._
    val df = pairs.toDF("a", "b", "t")
    val rows = df.select(
        col("a"), col("b"), col("t"),
        EditKernel.editDist(col("a"), col("b"), col("t")).as("kernel"),
        call_function("levenshtein", col("a"), col("b"), col("t"))
          .as("builtin"))
      .collect()
    rows.foreach { r =>
      assert(r.getInt(3) == r.getInt(4),
        s"kernel=${r.getInt(3)} builtin=${r.getInt(4)} for " +
          s"a='${r.getString(0)}' b='${r.getString(1)}' t=${r.getInt(2)}")
    }
  }

  test("matches the built-in on hand-picked edge cases") {
    crossCheck(Seq(
      ("", "", 0), ("", "", 5), ("a", "", 0), ("", "abc", 3), ("", "abc", 2),
      ("same", "same", 0), ("kitten", "sitting", 3), ("kitten", "sitting", 2),
      ("flaw", "lawn", 2), ("flaw", "lawn", 1),
      // shared affixes — the kernel's fast path
      ("dup block exact 3 alpha beta", "dup block exact 51 alpha beta", 3),
      ("prefix middleX suffix", "prefix middleY suffix", 1),
      ("prefix suffix", "prefix X suffix", 2),
      ("aaaa", "aa", 2), ("aaaa", "aa", 1), ("abcabc", "abc", 3),
      // multibyte: code-point distance, affix trim on boundaries
      ("héllo wörld", "héllo wörld", 0), ("héllo", "hèllo", 1),
      ("日本語テスト", "日本語テスト", 0), ("日本語テスト", "日本誤テスト", 1),
      ("日本語", "本", 3), ("日本語", "本", 2), ("aé", "ab", 2),
      ("é", "è", 1), ("é", "è", 0),
      // threshold far above any distance (overflow guard)
      ("abc", "xyz", Int.MaxValue), ("", "abcdef", Int.MaxValue)))
  }

  test("matches the built-in on randomized corpora (ascii + multibyte + affix-heavy)") {
    val rnd = new Random(4099)
    val ascii = "abcde XY.,"
    val multi = "abé日本ö "
    def s(alpha: String, n: Int): String =
      (0 until n).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    val cases = Seq.newBuilder[(String, String, Int)]
    for (_ <- 1 to 300) {
      val alpha = if (rnd.nextBoolean()) ascii else multi
      val a = s(alpha, rnd.nextInt(30))
      val b =
        if (rnd.nextInt(3) == 0) a // exact equality path
        else if (rnd.nextBoolean()) s(alpha, rnd.nextInt(30))
        else { // affix-heavy: shared prefix+suffix, differing middle
          val p = s(alpha, rnd.nextInt(20)); val q = s(alpha, rnd.nextInt(20))
          cases += ((p + s(alpha, rnd.nextInt(4)) + q,
            p + s(alpha, rnd.nextInt(4)) + q, rnd.nextInt(8)))
          p + a + q
        }
      cases += ((a, b, rnd.nextInt(12)))
    }
    crossCheck(cases.result())
  }

  test("propagates nulls like the built-in") {
    import spark.implicits._
    val df = Seq((Some("a"), None: Option[String]),
        (None: Option[String], Some("b")),
        (None: Option[String], None: Option[String]),
        (Some("a"), Some("b")))
      .toDF("a", "b")
    val rows = df.select(
        EditKernel.editDist(col("a"), col("b"), lit(3)).as("k"),
        call_function("levenshtein", col("a"), col("b"), lit(3)).as("s"))
      .collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1),
        s"null propagation diverged: kernel=${r.get(0)} builtin=${r.get(1)}")
      if (!r.isNullAt(0)) assert(r.getInt(0) == r.getInt(1))
    }
  }
}
