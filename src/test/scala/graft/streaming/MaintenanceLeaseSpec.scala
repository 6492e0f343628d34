package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Cross-process maintenance lease: a second process's maintenance op
  * fails loudly while a lease is held; an expired lease is taken over;
  * a holder that lost its lease aborts at validate instead of swapping.
  * "Second process" is simulated by planting a lease file with a
  * foreign holder id — the on-disk state is all another process would
  * see.
  */
class MaintenanceLeaseSpec extends AnyFunSuite with SparkSpec {

  private def tmp(tag: String): String = graft.TempDirs.create(tag).toString

  private def fsFor(dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def plantForeignLease(dir: String, expiresInMs: Long): Unit = {
    val fs = fsFor(dir)
    val out = fs.create(new Path(dir, "__maintenance_lease"), true)
    try out.write((s"holder=other-host#99999#feedbeef\n" +
      s"expires=${System.currentTimeMillis() + expiresInMs}\n")
      .getBytes("UTF-8"))
    finally out.close()
  }

  /** A small band registry to run real maintenance ops against. */
  private def buildRegistry(tag: String): String = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val reg = tmp(tag) + "/reg"
    val ms = MemoryStream[(Long, String)]
    val q = StreamingNearDup.nearDupStream(
      ms.toDS().toDF("id", "text"), col("id"), col("text"),
      reg, buckets = 4, minJaccard = 0.9) { df => df.collect(); () }
    try {
      ms.addData(Seq((1L, "alpha beta gamma delta epsilon zeta eta"),
        (2L, "one two three four five six seven")))
      q.processAllAvailable()
    } finally q.stop()
    reg
  }

  test("a live foreign lease blocks compact, rebucket, and screen " +
      "maintenance loudly") {
    val reg = buildRegistry("lease-block")
    val bandsDir = s"$reg/bands"
    val btPre = StreamingNearDup.bandsTableName(reg)
    // a screen must exist for the extend leg to reach its acquire
    assert(BucketScreen.build(spark, btPre, bandsDir, 4,
      keyCol = "band_key").isDefined)
    plantForeignLease(bandsDir, expiresInMs = 10 * 60 * 1000)
    val e1 = intercept[IllegalStateException] {
      StreamingNearDup.compact(spark, reg, 4)
    }
    assert(e1.getMessage.contains("held by other-host"), e1.getMessage)
    val e2 = intercept[IllegalStateException] {
      StreamingNearDup.rebucket(spark, reg, 8)
    }
    assert(e2.getMessage.contains("held by other-host"), e2.getMessage)
    val bt = StreamingNearDup.bandsTableName(reg)
    val e3 = intercept[IllegalStateException] {
      BucketScreen.build(spark, bt, bandsDir, 4, keyCol = "band_key")
    }
    assert(e3.getMessage.contains("held by other-host"), e3.getMessage)
    val e4 = intercept[IllegalStateException] {
      BucketScreen.extend(spark, bt, bandsDir, 4, keyCol = "band_key")
    }
    assert(e4.getMessage.contains("held by other-host"), e4.getMessage)
    // the foreign lease is not ours to delete — release of a failed
    // acquire must leave it in place
    assert(fsFor(bandsDir).exists(new Path(bandsDir, "__maintenance_lease")))
    fsFor(bandsDir).delete(new Path(bandsDir, "__maintenance_lease"), false)
  }

  test("an expired foreign lease is taken over and maintenance " +
      "completes, releasing the lease") {
    val reg = buildRegistry("lease-stale")
    val bandsDir = s"$reg/bands"
    plantForeignLease(bandsDir, expiresInMs = -1000) // already expired
    StreamingNearDup.compact(spark, reg, 4) // must not throw
    assert(!fsFor(bandsDir).exists(new Path(bandsDir, "__maintenance_lease")),
      "a completed op must release the lease it took over")
  }

  test("validate aborts when the lease was lost to a takeover") {
    val dir = tmp("lease-validate")
    val fs = fsFor(dir)
    val lease = MaintenanceLease.acquire(fs, dir)
    MaintenanceLease.validate(fs, lease) // self-held: fine
    plantForeignLease(dir, expiresInMs = 10 * 60 * 1000) // takeover
    val e = intercept[IllegalStateException] {
      MaintenanceLease.validate(fs, lease)
    }
    assert(e.getMessage.contains("no longer self-held"), e.getMessage)
    // and release must not delete the new holder's lease
    MaintenanceLease.release(fs, lease)
    assert(fs.exists(new Path(dir, "__maintenance_lease")))
  }

  test("self re-acquire refreshes instead of deadlocking") {
    val dir = tmp("lease-reacquire")
    val fs = fsFor(dir)
    val l1 = MaintenanceLease.acquire(fs, dir)
    val l2 = MaintenanceLease.acquire(fs, dir) // same JVM, same holder
    MaintenanceLease.validate(fs, l1)
    MaintenanceLease.validate(fs, l2)
    MaintenanceLease.release(fs, l2)
    assert(!fs.exists(new Path(dir, "__maintenance_lease")))
  }
}
