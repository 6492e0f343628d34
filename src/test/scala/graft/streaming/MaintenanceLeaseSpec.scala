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

  test("a garbled lease degrades to expired-at-epoch takeover, " +
      "not a wedge") {
    val dir = tmp("lease-garbled")
    val fs = fsFor(dir)
    val out = fs.create(new Path(dir, "__maintenance_lease"), true)
    try out.write("holder=zombie#1#dead\nexpires=NOT_A_NUMBER\n"
      .getBytes("UTF-8"))
    finally out.close()
    // readLease must not throw NumberFormatException; the next acquire
    // treats it as expired and takes over loudly
    assert(MaintenanceLease.readLease(fs, dir) ==
      Some(("zombie#1#dead", 0L)))
    val lease = MaintenanceLease.acquire(fs, dir) // must not throw
    assert(lease.held)
    MaintenanceLease.release(fs, lease)
    // pure truncation garbage (no parseable lines at all) also degrades
    val out2 = fs.create(new Path(dir, "__maintenance_lease"), true)
    try out2.write(Array[Byte](0x00, 0x7f, 0x33)) finally out2.close()
    val l2 = MaintenanceLease.acquire(fs, dir)
    assert(l2.held)
    MaintenanceLease.release(fs, l2)
  }

  test("heartbeat keeps a slow op's lease live past its TTL") {
    val dir = tmp("lease-heartbeat")
    val fs = fsFor(dir)
    val t0 = System.currentTimeMillis()
    val lease = MaintenanceLease.acquire(fs, dir, ttlMs = 250)
    // simulate an op 3x slower than the TTL, heartbeating between
    // stages: the lease's expiry must keep advancing, so a contender
    // observing it at any point sees it LIVE (never takeover-eligible)
    (1 to 5).foreach { _ =>
      Thread.sleep(150)
      MaintenanceLease.heartbeat(fs, lease)
      val (holder, expires) = MaintenanceLease.readLease(fs, dir).get
      assert(holder == MaintenanceLease.holderId)
      assert(expires > System.currentTimeMillis(),
        "heartbeat must keep the lease unexpired")
    }
    assert(System.currentTimeMillis() - t0 > 250,
      "the simulated op must have outlived the original TTL")
    MaintenanceLease.validate(fs, lease) // still self-held: fine
    MaintenanceLease.release(fs, lease)
    assert(!fs.exists(new Path(dir, "__maintenance_lease")))
  }

  test("heartbeat aborts early when the lease was already taken over") {
    val dir = tmp("lease-heartbeat-lost")
    val fs = fsFor(dir)
    val lease = MaintenanceLease.acquire(fs, dir, ttlMs = 50)
    Thread.sleep(80) // expire
    plantForeignLease(dir, expiresInMs = 10 * 60 * 1000) // takeover
    val e = intercept[IllegalStateException] {
      MaintenanceLease.heartbeat(fs, lease)
    }
    assert(e.getMessage.contains("held by"), e.getMessage)
    fsFor(dir).delete(new Path(dir, "__maintenance_lease"), false)
  }

  test("real maintenance ops heartbeat between stages") {
    val reg = buildRegistry("lease-hb-ops")
    val bandsDir = s"$reg/bands"
    val bt = StreamingNearDup.bandsTableName(reg)
    val h0 = MaintenanceLease.heartbeats.get()
    assert(BucketScreen.build(spark, bt, bandsDir, 4,
      keyCol = "band_key").isDefined)
    assert(MaintenanceLease.heartbeats.get() > h0,
      "screen build must refresh its lease after the bloom collect")
    val h1 = MaintenanceLease.heartbeats.get()
    StreamingNearDup.rebucket(spark, reg, 8)
    assert(MaintenanceLease.heartbeats.get() > h1,
      "rebucket must refresh its lease after the stage write")
  }

  test("first-ever maintenance of a not-yet-created dir is unguarded " +
      "but never spuriously aborts") {
    val dir = tmp("lease-firstopen") + "/reg-not-yet"
    val fs = fsFor(dir)
    assert(!fs.exists(new Path(dir)))
    val lease = MaintenanceLease.acquire(fs, dir)
    assert(!lease.held, "no dir -> nothing to guard yet")
    // the op itself creates the dir mid-flight (BucketScreen.build
    // mkdirs the stage under it); validate must NOT then fail over the
    // missing lease file — held=false makes it a no-op
    fs.mkdirs(new Path(dir))
    MaintenanceLease.validate(fs, lease) // must not throw
    MaintenanceLease.heartbeat(fs, lease) // no-op, must not write
    assert(!fs.exists(new Path(dir, "__maintenance_lease")))
    MaintenanceLease.release(fs, lease) // no-op
  }

  test("the lease move refuses to replace an existing file (local-FS " +
      "rename would clobber)") {
    val dir = tmp("lease-moveexcl")
    val fs = fsFor(dir)
    def mk(name: String, body: String): Path = {
      val p = new Path(dir, name)
      val o = fs.create(p, true)
      try o.write(body.getBytes("UTF-8")) finally o.close()
      p
    }
    val src = mk("src.tmp", "mine")
    val dst = mk("dst", "theirs")
    assert(!MaintenanceLease.moveNoReplace(fs, src, dst),
      "move onto an existing file must lose, not clobber")
    val in = fs.open(dst)
    val kept =
      try new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
      finally in.close()
    assert(kept == "theirs", "the existing file must be intact")
    // and with the target absent the same move wins
    fs.delete(dst, false)
    val src2 = mk("src2.tmp", "mine2")
    assert(MaintenanceLease.moveNoReplace(fs, src2, dst))
    assert(!fs.exists(src2) && fs.exists(dst))
  }
}
