package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

class LayoutSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def freshDir() =
    Files.createTempDirectory("graft-layout").toString

  private val docs = (0L until 1000L)
    .map(i => (i, s"doc body $i", sha256Hex(s"mix:$i")))
    .toDF("doc_id", "text", "mix")

  private def sha256Hex(s: String): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("round-trip preserves content exactly") {
    val dir = freshDir()
    Layout.writeShards(docs, dir, numShards = 4,
      maxRecordsPerFile = 1000L, col("mix"))
    val back = spark.read.parquet(dir)
    assert(back.count() === 1000L)
    assert(back.orderBy("doc_id").collect().toSeq ===
      docs.orderBy("doc_id").collect().toSeq)
  }

  test("maxRecordsPerFile bounds every file; manifest counts add up") {
    val dir = freshDir()
    Layout.writeShards(docs, dir, numShards = 3,
      maxRecordsPerFile = 100L, col("mix"))
    val m = Layout.manifest(spark, dir).collect()
    assert(m.map(_.getAs[Long]("n_rows")).sum === 1000L)
    assert(m.forall(_.getAs[Long]("n_rows") <= 100L),
      s"oversized shard in ${m.mkString(", ")}")
    // 1000 rows / 100-row cap → at least 10 files
    assert(m.length >= 10)
  }

  test("shards tile the global mix order: file key ranges are disjoint") {
    val dir = freshDir()
    Layout.writeShards(docs, dir, numShards = 5,
      maxRecordsPerFile = 1000L, col("mix"))
    val ranges = spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(min("mix").as("lo"), max("mix").as("hi"))
      .collect()
      .map(r => (r.getAs[String]("lo"), r.getAs[String]("hi")))
      .sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hiA), (loB, _)) =>
        assert(hiA < loB, s"overlapping shard ranges: $hiA vs $loB")
      case _ =>
    }
  }

  test("compactTo merges fragmented files, sizes output from bytes, keeps content") {
    val src = freshDir()
    // fragment: 50 files of 20 rows each
    docs.repartition(50).write.mode("overwrite").parquet(src)
    val files = new java.io.File(src).listFiles().count(_.getName.endsWith(".parquet"))
    assert(files === 50)
    val totalBytes = new java.io.File(src).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    val dest = freshDir() + "/out"
    // target of half the total → exactly 2 output files
    val n = Layout.compactTo(spark, src, dest, (totalBytes + 1) / 2)
    assert(n === 2)
    val outFiles = new java.io.File(dest).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(outFiles === 2)
    assert(spark.read.parquet(dest).orderBy("doc_id").collect().toSeq ===
      docs.orderBy("doc_id").collect().toSeq)
  }

  test("invalid arguments are rejected") {
    intercept[IllegalArgumentException] {
      Layout.writeShards(docs, freshDir(), numShards = 0,
        maxRecordsPerFile = 10L, col("mix"))
    }
    intercept[IllegalArgumentException] {
      Layout.writeShards(docs, freshDir(), numShards = 1,
        maxRecordsPerFile = 0L, col("mix"))
    }
    intercept[IllegalArgumentException] {
      Layout.compactTo(spark, "/tmp/a", "/tmp/a", 100L)
    }
  }

  test("compactPartitioned: one file per partition dir, content and pruning kept") {
    import spark.implicits._
    val src = Files.createTempDirectory("graft-cpart-src").toString
    val dest = Files.createTempDirectory("graft-cpart-dst").toString + "/out"
    // simulate 4 micro-batch appends over 3 partition values
    (0 until 4).foreach { b =>
      (0 until 3).map(p => (b * 100L + p, p))
        .toDF("v", "cluster_id")
        .write.mode("append").partitionBy("cluster_id").parquet(src)
    }
    def filesPerDir(root: String): Map[String, Int] =
      new java.io.File(root).listFiles().filter(_.isDirectory)
        .map(d => d.getName -> d.listFiles()
          .count(f => f.isFile && !f.getName.startsWith("_") &&
            !f.getName.startsWith("."))).toMap
    assert(filesPerDir(src).values.forall(_ == 4), s"${filesPerDir(src)}")
    Layout.compactPartitioned(spark, src, dest, Seq("cluster_id"))
    val after = filesPerDir(dest)
    assert(after.keySet == Set("cluster_id=0", "cluster_id=1", "cluster_id=2"))
    assert(after.values.forall(_ == 1),
      s"each partition dir must hold one file: $after")
    val a = spark.read.parquet(src).orderBy("v").collect().map(_.toSeq).toSeq
    val b = spark.read.parquet(dest).orderBy("v").collect().map(_.toSeq).toSeq
    assert(a == b, "content must be identical after compaction")
    // directory pruning still applies on the compacted layout
    val plan = spark.read.parquet(dest).where(col("cluster_id") === 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(cluster_id"),
      s"partition filter must prune at scan:\n$plan")
  }

  test("versioned writes: commit markers, time travel, current resolution") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-versions").toString
    assert(Layout.currentVersion(spark, root).isEmpty)
    val v1 = Layout.writeVersioned(Seq((1L, "a"), (2L, "b")).toDF("k", "p"), root)
    val v2 = Layout.writeVersioned(Seq((1L, "a"), (2L, "B2"), (3L, "c"))
      .toDF("k", "p"), root)
    assert((v1, v2) == ((1L, 2L)))
    assert(Layout.currentVersion(spark, root).contains(2L))
    // current = v2; v1 stays addressable (time travel)
    assert(Layout.readVersion(spark, root).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "B2"), (3L, "c")))
    assert(Layout.readVersion(spark, root, v1).count() == 2L)
    // uncommitted/unknown versions are refused, never half-served
    intercept[IllegalArgumentException] { Layout.readVersion(spark, root, 9L) }
  }

  test("a writer killed mid-write leaves the previous snapshot serving") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-versions-crash").toString
    Layout.writeVersioned(Seq((1L, "v1")).toDF("k", "p"), root)
    // fabricate the crash: v=2 data half-written (present, no marker)
    val garbage = java.nio.file.Paths.get(root, "v=2")
    Files.createDirectories(garbage)
    Files.write(garbage.resolve("part-junk.parquet"), Array[Byte](1, 2, 3))
    // readers still resolve v1 and never look at the garbage
    assert(Layout.currentVersion(spark, root).contains(1L))
    assert(Layout.readVersion(spark, root).collect()
      .map(_.getString(1)).toSeq == Seq("v1"))
    // the next write reclaims the garbage v=2 and commits cleanly
    val v2 = Layout.writeVersioned(Seq((1L, "v2")).toDF("k", "p"), root)
    assert(v2 == 2L)
    assert(Layout.readVersion(spark, root).collect()
      .map(_.getString(1)).toSeq == Seq("v2"))
  }

  test("two interleaved writers commit distinct versions; readers stay consistent") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-versions-mw").toString
    Layout.writeVersioned(Seq((0L, "base")).toDF("k", "p"), root)
    // two concurrent writers with distinct payloads; the claim
    // protocol must serialize them onto distinct version numbers with
    // neither clobbering the other's data dir
    val results = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val barrier = new java.util.concurrent.CyclicBarrier(2)
    def writer(tag: String, rows: Seq[(Long, String)]): Thread = {
      val t = new Thread(() => {
        try {
          barrier.await()
          results.put(tag, Layout.writeVersioned(rows.toDF("k", "p"), root))
        } catch { case e: Throwable => errors.add(e) }
      })
      t.start(); t
    }
    val ta = writer("a", Seq((1L, "writer-a"), (2L, "writer-a")))
    val tb = writer("b", Seq((1L, "writer-b")))
    // a reader polling DURING the interleaved writes must only ever
    // see complete committed snapshots
    val seen = scala.collection.mutable.Set[Set[String]]()
    while (ta.isAlive || tb.isAlive) {
      seen += Layout.readVersion(spark, root).collect()
        .map(_.getString(1)).toSet
      Thread.sleep(20)
    }
    ta.join(); tb.join()
    assert(errors.isEmpty, s"writer failed: ${errors.peek()}")
    val (va, vb) = (results.get("a"), results.get("b"))
    assert(va != vb && Set(va, vb) == Set(2L, 3L),
      s"distinct claimed versions: a=$va b=$vb")
    assert(Layout.committedVersions(spark, root) == Seq(1L, 2L, 3L))
    // each writer's snapshot is intact under its own version
    assert(Layout.readVersion(spark, root, va).collect()
      .map(_.getString(1)).toSet == Set("writer-a"))
    assert(Layout.readVersion(spark, root, vb).collect()
      .map(_.getString(1)).toSet == Set("writer-b"))
    val legal = Set(Set("base"), Set("writer-a"), Set("writer-b"))
    assert(seen.nonEmpty && seen.forall(legal.contains),
      s"reader saw a torn snapshot: $seen")
  }

  test("interleaved-writer stress: 12 rounds of 2 concurrent writeVersioned, every snapshot intact") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-versions-stress").toString
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val byVersion = new java.util.concurrent.ConcurrentHashMap[Long, String]()
    (0 until 12).foreach { round =>
      val barrier = new java.util.concurrent.CyclicBarrier(2)
      val ts = Seq("a", "b").map { tag =>
        val payload = s"r$round-$tag"
        val t = new Thread(() => {
          try {
            barrier.await()
            val v = Layout.writeVersioned(
              Seq((1L, payload)).toDF("k", "p"), root)
            val prev = byVersion.putIfAbsent(v, payload)
            assert(prev == null, s"version $v handed to two writers")
          } catch { case e: Throwable => errors.add(e) }
        })
        t.start(); t
      }
      ts.foreach(_.join(120000))
    }
    assert(errors.isEmpty, s"writer failed: ${errors.peek()}")
    assert(Layout.committedVersions(spark, root) == (1L to 24L),
      s"${Layout.committedVersions(spark, root)}")
    // every committed snapshot holds exactly its writer's payload
    (1L to 24L).foreach { v =>
      val got = Layout.readVersion(spark, root, v).collect()
        .map(_.getString(1)).toSeq
      assert(got == Seq(byVersion.get(v)), s"v=$v clobbered: $got")
    }
  }

  test("a live claim blocks its version number; only old sub-retained claims sweep") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-versions-claim").toString
    Layout.writeVersioned(Seq((1L, "v1")).toDF("k", "p"), root)
    // simulate a concurrent writer holding v=2: claim marker present
    // (with its own writer id), no commit yet
    val claims = java.nio.file.Paths.get(root, "_claims")
    Files.createDirectories(claims)
    Files.write(claims.resolve("v-2"), "other-writer".getBytes("UTF-8"))
    val v = Layout.writeVersioned(Seq((1L, "v3")).toDF("k", "p"), root)
    assert(v == 3L, s"claimed version must be skipped, got $v")
    Layout.writeVersioned(Seq((1L, "v4")).toDF("k", "p"), root)
    assert(Layout.readVersion(spark, root).collect()
      .map(_.getString(1)).toSeq == Seq("v4"))
    // a RECENT claim is never swept, even below the retained floor —
    // it may belong to a live slow writer
    Layout.pruneVersions(spark, root, keepLast = 2)
    assert(Files.exists(claims.resolve("v-2")),
      "recent claim must survive the sweep (age gate)")
    // once the claim is demonstrably stale (old mtime) AND below the
    // oldest retained committed version, the sweep releases it
    Files.setLastModifiedTime(claims.resolve("v-2"),
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 48L * 3600 * 1000))
    Layout.pruneVersions(spark, root, keepLast = 2)
    assert(!Files.exists(claims.resolve("v-2")),
      "stale sub-retained claim must be swept")
  }

  test("a slow writer whose claim is swept aborts loudly, never commits truncated data") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-versions-sweep").toString
    Layout.writeVersioned(Seq((0L, "base")).toDF("k", "p"), root)
    // slow writer claims v=2 and finishes its data write; at the
    // vulnerable point a faster writer commits v=3 AND a zero-grace
    // prune sweeps the slow writer's claim + data dir
    val slow = intercept[IllegalArgumentException] {
      Layout.writeVersionedWithHook(Seq((1L, "slow")).toDF("k", "p"), root,
        beforeCommit = { _ =>
          Layout.writeVersioned(Seq((2L, "fast")).toDF("k", "p"), root)
          Layout.pruneVersions(spark, root, keepLast = 1, claimGraceMs = 0L)
        })
    }
    assert(slow.getMessage.contains("lost before publish"), slow.getMessage)
    // the swept version never became visible; the fast snapshot serves
    assert(Layout.committedVersions(spark, root) == Seq(3L))
    assert(Layout.readVersion(spark, root).collect()
      .map(_.getString(1)).toSeq == Seq("fast"))
  }

  test("claim allocation is exclusive under concurrency: 8 writers x 25 claims, all distinct") {
    val root = Files.createTempDirectory("graft-claim-stress").toString
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val got = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val start = new java.util.concurrent.CyclicBarrier(8)
    val threads = (0 until 8).map { t =>
      val th = new Thread(() => {
        try {
          start.await()
          (0 until 25).foreach { i =>
            got.add(Layout.claimVersion(fs, root, s"writer-$t-$i"))
          }
        } catch { case e: Throwable => errors.add(e) }
      })
      th.start(); th
    }
    threads.foreach(_.join(120000))
    assert(errors.isEmpty, s"claim failed: ${errors.peek()}")
    val versions = got.toArray(Array.empty[java.lang.Long]).map(_.longValue).toSeq
    assert(versions.length == 200)
    assert(versions.distinct.length == 200,
      s"duplicate claims handed out: ${versions.groupBy(identity)
        .filter(_._2.length > 1).keys.toSeq.sorted}")
  }

  test("pruneVersions drops old snapshots, keeps the serving tail") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-versions-prune").toString
    (1 to 4).foreach(i =>
      Layout.writeVersioned(Seq((i.toLong, s"v$i")).toDF("k", "p"), root))
    val dropped = Layout.pruneVersions(spark, root, keepLast = 2)
    assert(dropped == Seq(1L, 2L))
    assert(Layout.committedVersions(spark, root) == Seq(3L, 4L))
    assert(Layout.readVersion(spark, root).collect()
      .map(_.getString(1)).toSeq == Seq("v4"))
    intercept[IllegalArgumentException] { Layout.readVersion(spark, root, 1L) }
  }

  test("pruneVersions reclaims orphaned data dirs (no claim, no marker) — age-gated") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-versions-orphan").toString
    Layout.writeVersioned(Seq((1L, "v1")).toDF("k", "p"), root)
    // the ADVICE r11 residue: sweep revoked a claim, skipped the data
    // delete because a marker appeared, and the writer then RETRACTED
    // that marker — v=2 holds data with neither claim nor marker
    val orphan = java.nio.file.Paths.get(root, "v=2")
    Files.createDirectories(orphan)
    Files.write(orphan.resolve("part-x.parquet"), Array[Byte](9, 9))
    // a stray non-numeric v= dir (user surface) must neither crash the
    // sweep nor be touched by it
    val stray = java.nio.file.Paths.get(root, "v=backup")
    Files.createDirectories(stray)
    // a RECENT orphan survives (could be a rename whose marker is a
    // moment away on a store where the claim read raced)
    Layout.pruneVersions(spark, root, keepLast = 1)
    assert(Files.exists(orphan), "recent orphan must survive the age gate")
    Files.setLastModifiedTime(orphan,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() - 48L * 3600 * 1000))
    Layout.pruneVersions(spark, root, keepLast = 1)
    assert(!Files.exists(orphan), "aged orphan data dir must be reclaimed")
    assert(Files.exists(stray), "non-numeric v= dirs are not ours to delete")
    // committed snapshots are never touched by the orphan sweep
    assert(Layout.readVersion(spark, root).collect()
      .map(_.getString(1)).toSeq == Seq("v1"))
  }

  test("pruneVersions sweeps aged staging dirs of dead writers, never a live claimant's") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-versions-staging").toString
    Layout.writeVersioned(Seq((1L, "v1")).toDF("k", "p"), root)
    val staging = java.nio.file.Paths.get(root, "_staging")
    Files.createDirectories(staging)
    val old = System.currentTimeMillis() - 48L * 3600 * 1000
    // dead writer: stage exists, claim long gone
    val dead = staging.resolve("v-7-dead-writer-uuid")
    Files.createDirectories(dead)
    Files.setLastModifiedTime(dead,
      java.nio.file.attribute.FileTime.fromMillis(old))
    // live slow writer: stage is old but its claim still names it
    val live = staging.resolve("v-8-live-writer-uuid")
    Files.createDirectories(live)
    Files.setLastModifiedTime(live,
      java.nio.file.attribute.FileTime.fromMillis(old))
    val claims = java.nio.file.Paths.get(root, "_claims")
    Files.createDirectories(claims)
    Files.write(claims.resolve("v-8"), "live-writer-uuid".getBytes("UTF-8"))
    Layout.pruneVersions(spark, root, keepLast = 1)
    assert(!Files.exists(dead), "claimless aged staging dir must be swept")
    assert(Files.exists(live), "a live claimant's stage must never be swept")
  }
}
