package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSpec

/** Streamed MaxSim: the windowed facet-max fold must equal the batch
  * kernel, accumulate correctly ACROSS micro-batches (a facet's better
  * chunk arriving later must raise the doc score), and keep per-key
  * state bounded by the query's facet count.
  */
class StreamingMaxSimSpec extends AnyFunSuite with SparkSpec {

  test("facet maxima accumulate across micro-batches into the batch score") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val e1 = Seq(1f, 0f, 0f, 0f)
    val e2 = Seq(0f, 1f, 0f, 0f)
    val mid = Seq(1f, 1f, 0f, 0f)
    val corpus = Seq((10L, e1), (10L, e2), (20L, mid))
      .toDF("doc_id", "embedding")
    val t0 = 1700000000000L
    def ts(ms: Long) = new java.sql.Timestamp(t0 + ms)
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Seq[Float], java.sql.Timestamp)]
    val out = StreamingMaxSim.scoredPerQueryDoc(
      ms.toDS().toDF("query_id", "qvec_id", "q_emb", "ts"), corpus)
    val q = out.writeStream.format("memory").queryName("sms_spec")
      .outputMode("append").start()
    try {
      // facet 0 arrives in batch 1, facet 1 in batch 2 — SAME window:
      // the stateful fold must merge them before the window closes
      ms.addData(Seq((0L, 0L, e1, ts(0))))
      q.processAllAvailable()
      ms.addData(Seq((0L, 1L, e2, ts(1000))))
      q.processAllAvailable()
      ms.addData(Seq((-1L, -1L, e1, ts(3600000L)))) // close the window
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("sms_spec").where(col("query_id") === 0L)
      .select(col("doc_id"), col("score")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // doc 10: each facet matches its own chunk exactly → 1.0 + 1.0
    assert(rows(10L) == 2.0, s"cross-batch facet merge: $rows")
    // doc 20: both facets hit the same mid chunk at cos 0.7071
    assert(rows(20L) == 1.4142, s"grid sum of per-facet maxima: $rows")
  }

  test("chained windowed top-k ranks fully in-stream (two stateful ops)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val e1 = Seq(1f, 0f, 0f, 0f)
    val e2 = Seq(0f, 1f, 0f, 0f)
    val mid = Seq(1f, 1f, 0f, 0f)
    val far = Seq(0f, 0f, 1f, 0f)
    val corpus = Seq((10L, e1), (10L, e2), (20L, mid), (30L, far))
      .toDF("doc_id", "embedding")
    val t0 = 1700000000000L
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Seq[Float], java.sql.Timestamp)]
    val ranked = StreamingMaxSim.topKPerQuery(
      StreamingMaxSim.scoredPerQueryDoc(
        ms.toDS().toDF("query_id", "qvec_id", "q_emb", "ts"), corpus), k = 2)
    val q = ranked.writeStream.format("memory").queryName("sms_chain")
      .outputMode("append").start()
    try {
      ms.addData(Seq((0L, 0L, e1, new java.sql.Timestamp(t0)),
        (0L, 1L, e2, new java.sql.Timestamp(t0))))
      q.processAllAvailable()
      ms.addData(Seq((-1L, -1L, e1, new java.sql.Timestamp(t0 + 7200000L))))
      q.processAllAvailable()
      ms.addData(Seq.empty[(Long, Long, Seq[Float], java.sql.Timestamp)])
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("sms_chain").where(col("query_id") === 0L)
      .orderBy("rank").select("doc_id", "score", "rank").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSeq
    assert(rows == Seq((10L, 2.0, 1), (20L, 1.4142, 2)),
      s"in-stream ranking: $rows")
  }

  // ---- IVF route (the beyond-broadcast tier) -------------------------

  /** Run `route` over a fixed 2-query / 24-chunk corpus; returns the
    * (query_id, doc_id) → score map of the emitted scored feed.
    */
  private def runIvfRoute(nprobe: Int, nlist: Int, name: String)
      : Map[(Long, Long), Double] = {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // deterministic spread-out corpus: 8 docs × 3 chunks in 4-dim space
    def vec(seed: Int): Seq[Float] = {
      val a = ((seed * 73 + 11) % 19).toFloat
      val b = ((seed * 31 + 7) % 17).toFloat
      val c = ((seed * 57 + 3) % 13).toFloat
      val d = ((seed * 97 + 5) % 11).toFloat
      Seq(a, b, c, d)
    }
    val corpus = (0 until 24).map(i => ((i % 8).toLong, vec(i)))
      .toDF("doc_id", "embedding")
    val index = graft.vector.Ann.buildIvf(corpus, emb = "embedding",
      nlist = nlist)
    val t0 = 1700000000000L
    val facets = for (qid <- 0L to 1L; f <- 0 to 2)
      yield (qid, qid * 3 + f, vec(100 + (qid * 3 + f).toInt),
        new java.sql.Timestamp(t0))
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Seq[Float], java.sql.Timestamp)]
    ms.addData(facets)
    val out = StreamingMaxSim.scoredPerQueryDocIvf(
      ms.toDS().toDF("query_id", "qvec_id", "q_emb", "ts"), index, nprobe)
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      ms.addData(Seq((-1L, -1L, vec(0), new java.sql.Timestamp(t0 + 7200000L))))
      q.processAllAvailable()
    } finally q.stop()
    spark.table(name).where(col("query_id") >= 0)
      .select("query_id", "doc_id", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
  }

  test("IVF route at full probe equals the broadcast route exactly") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val full = runIvfRoute(nprobe = 4, nlist = 4, name = "sms_ivf_full")
    // broadcast route over the same corpus/facets
    def vec(seed: Int): Seq[Float] = {
      val a = ((seed * 73 + 11) % 19).toFloat
      val b = ((seed * 31 + 7) % 17).toFloat
      val c = ((seed * 57 + 3) % 13).toFloat
      val d = ((seed * 97 + 5) % 11).toFloat
      Seq(a, b, c, d)
    }
    val corpus = (0 until 24).map(i => ((i % 8).toLong, vec(i)))
      .toDF("doc_id", "embedding")
    val t0 = 1700000000000L
    val facets = for (qid <- 0L to 1L; f <- 0 to 2)
      yield (qid, qid * 3 + f, vec(100 + (qid * 3 + f).toInt),
        new java.sql.Timestamp(t0))
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, Seq[Float], java.sql.Timestamp)]
    ms.addData(facets)
    val out = StreamingMaxSim.scoredPerQueryDoc(
      ms.toDS().toDF("query_id", "qvec_id", "q_emb", "ts"), corpus)
    val q = out.writeStream.format("memory").queryName("sms_bcast_ref")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      ms.addData(Seq((-1L, -1L, vec(0), new java.sql.Timestamp(t0 + 7200000L))))
      q.processAllAvailable()
    } finally q.stop()
    val bcast = spark.table("sms_bcast_ref").where(col("query_id") >= 0)
      .select("query_id", "doc_id", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(full == bcast,
      s"full-probe IVF must bit-equal broadcast: ivf=$full bcast=$bcast")
    assert(full.nonEmpty && full.keySet.map(_._2).size == 8,
      "every doc scored at full probe")
  }

  test("partial probe is contained in full probe (scores never exceed)") {
    val full = runIvfRoute(nprobe = 4, nlist = 4, name = "sms_ivf_f2")
    val partial = runIvfRoute(nprobe = 1, nlist = 4, name = "sms_ivf_p1")
    assert(partial.nonEmpty, "partial probe still emits candidates")
    assert(partial.keySet.subsetOf(full.keySet),
      "pruning only removes candidates, never invents them")
    partial.foreach { case (k, v) =>
      assert(v <= full(k) + 1e-9,
        s"facet max over a candidate subset cannot exceed full probe: $k")
    }
  }

  test("maintained layout serves across an index refresh: answers straddle consistently") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def vec(seed: Int): Seq[Float] = {
      val a = ((seed * 73 + 11) % 19).toFloat
      val b = ((seed * 31 + 7) % 17).toFloat
      val c = ((seed * 57 + 3) % 13).toFloat
      val d = ((seed * 97 + 5) % 11).toFloat
      Seq(a, b, c, d)
    }
    val rows = (0 until 24).map(i => (i.toLong, vec(i)))
    val centroids = graft.vector.Ann.buildIvf(
      rows.take(12).toDF("vec_id", "embedding"), emb = "embedding",
      nlist = 4).centroids
    val tmp = java.nio.file.Files.createTempDirectory("graft-smaxm").toString
    val corp = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Seq[Float])]
    val maint = graft.streaming.StreamingIvf.assignAndWrite(
      corp.toDS().toDF("vec_id", "embedding"), centroids,
      s"$tmp/layout", s"$tmp/ckpt")
    val t0 = 1700000000000L
    val facets = for (qid <- 0L to 1L; f <- 0 to 2)
      yield (qid, qid * 3 + f, vec(100 + (qid * 3 + f).toInt),
        new java.sql.Timestamp(t0))
    def serve(phase: String): Map[(Long, Long), Double] = {
      val index = graft.vector.Ann.IvfIndex(
        spark.read.parquet(s"$tmp/layout")
          .select((col("vec_id") % 8).as("doc_id"), col("embedding"),
            col("cluster_id")),
        centroids)
      val ms = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long, Seq[Float], java.sql.Timestamp)]
      ms.addData(facets)
      val out = StreamingMaxSim.scoredPerQueryDocIvf(
        ms.toDS().toDF("query_id", "qvec_id", "q_emb", "ts"), index,
        nprobe = 4)
      val name = s"sms_maint_$phase"
      val q = out.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        ms.addData(Seq((-1L, -1L, vec(0), new java.sql.Timestamp(t0 + 7200000L))))
        q.processAllAvailable()
      } finally q.stop()
      spark.table(name).where(col("query_id") >= 0)
        .select("query_id", "doc_id", "score").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    }
    try {
      corp.addData(rows.take(12)); maint.processAllAvailable()
      val a = serve("a")
      // the refresh: the second corpus half arrives on the SAME stream
      corp.addData(rows.drop(12)); maint.processAllAvailable()
      val b = serve("b")
      assert(a.nonEmpty && a.keySet.subsetOf(b.keySet),
        "a refresh adds candidates, never loses them")
      a.foreach { case (k, v) =>
        assert(v <= b(k) + 1e-9,
          s"facet maxima can only grow when chunks are added: $k")
      }
      assert(b.keySet.map(_._2) == (0L to 7L).toSet,
        "post-refresh every doc is served")
      assert(b.exists { case (k, v) => v > a.getOrElse(k, Double.MinValue) },
        "the refresh visibly changed at least one answer")
    } finally maint.stop()
  }

  test("aggregator state is bounded by facet count, not chunk count") {
    val agg = new StreamingMaxSim.FacetMaxSum()
    // 1000 chunk observations over 3 facets → 3 state entries
    val buf = (0 until 1000).foldLeft(agg.zero) { (b, i) =>
      agg.reduce(b, StreamingMaxSim.FacetSim(i % 3, (i % 7) / 10.0))
    }
    assert(buf.size == 3)
    val merged = agg.merge(buf, agg.reduce(agg.zero,
      StreamingMaxSim.FacetSim(1L, 0.9)))
    assert(merged.size == 3 && merged(1L) == 0.9, "merge keeps the max")
    assert(agg.finish(merged) ==
      (math.round(0.6 * 10000d) * 2 + math.round(0.9 * 10000d)) / 10000d)
  }
}
