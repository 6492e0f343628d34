package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.vector.{Ann, BlockMatrix, EmbStats, Quantize}

/** Dev-only dimensionality probe: the harness `embeddings` table is
  * dim 64, but the reference's real vectors are dim 1536
  * (`/root/reference/extract_and_embed.py:46` — ada-002). This runs
  * the vector family end to end on a GENERATED 1536-dim corpus and a
  * dim-64 twin of identical row count, recording wall ratios — the
  * evidence that nothing in the family is dim-quadratic where it
  * shouldn't be (covariance is d² by definition; everything else must
  * scale ~linearly in d) and that no per-task buffer fails at d=1536.
  *
  * Vectors are deterministic pseudo-random floats in [-1, 1]
  * (xxhash64 of vec_id·dim + j), generated IN-PLAN — no driver-side
  * materialization of the corpus.
  *
  * Usage: `runMain graft.tools.Dim1536Probe [rows] [outJson]`.
  */
object Dim1536Probe {

  private def corpus(spark: SparkSession, rows: Int, dim: Int): DataFrame =
    spark.range(rows.toLong).toDF("vec_id")
      .select(col("vec_id"), expr(
        s"""transform(sequence(0, ${dim - 1}), j ->
           | CAST((pmod(xxhash64(vec_id * $dim + CAST(j AS BIGINT)), 2000001)
           |        - 1000000) / 1000000.0 AS FLOAT))""".stripMargin)
        .as("embedding"))

  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  private def runFamily(spark: SparkSession, rows: Int, dim: Int): Seq[(String, Double)] = {
    val df = corpus(spark, rows, dim).cache()
    df.count() // materialize outside the measurements
    val queries = df.where(col("vec_id") < 20)
      .select(col("vec_id").as("id"), col("embedding"))
    val out = scala.collection.mutable.ArrayBuffer[(String, Double)]()

    out += "emb_covariance" -> time {
      EmbStats.covariance(df, col("embedding"), dim).count()
    }
    out += "emb_pca_power" -> time {
      EmbStats.pcaTop(df, col("embedding"), dim, iters = 12).count()
    }
    out += "emb_pca_randomized" -> time {
      // the d-LINEAR sibling of emb_pca_power: sketch to k=32, exact
      // cross moments (d·k), subspace power iteration — the route that
      // should hold flat-ish while exact covariance pays d²
      EmbStats.pcaRandomized(df, col("vec_id"), col("embedding"), dim,
        k = math.min(32, dim), iters = 12).count()
    }
    out += "emb_standardize" -> time {
      EmbStats.standardize(df, col("vec_id"), col("embedding"), dim).count()
    }
    var idx: Ann.IvfIndex = null
    out += "ann_ivf_build" -> time {
      idx = Ann.buildIvf(df, nlist = 16, maxTrainRows = 2000)
      idx.assigned.count()
    }
    out += "ann_ivf_join" -> time {
      Ann.ivfKnnJoin(queries, idx, k = 10, nprobe = 4).count()
    }
    out += "ann_pq_train_join" -> time {
      val pq = Quantize.trainPq(df, m = 8, ksub = 64, maxTrainRows = 1000)
      Ann.ivfPqKnnJoin(queries, idx, pq, k = 10, nprobe = 4).count()
    }
    out += "blockmatrix_cosine_topk" -> time {
      BlockMatrix.cosineTopK(df.where(col("vec_id") < math.min(rows, 10000)),
        col("vec_id"), col("embedding"), k = 5).count()
    }
    out += "quantize_hamming_topk" -> time {
      val qb = df.where(col("vec_id") === 0)
        .select(Quantize.binary(col("embedding")).as("qw"))
      df.crossJoin(broadcast(qb))
        .select(col("vec_id"),
          Quantize.hamming(Quantize.binary(col("embedding")), col("qw")).as("ham"))
        .orderBy(col("ham"), col("vec_id")).limit(10).count()
    }
    out += "quantize_int8_scan" -> time {
      df.select(Quantize.int8(col("embedding")).as("q"))
        .agg(sum(element_at(col("q.codes"), 1))).count()
    }
    out += "maxsim_topk" -> time {
      // late-interaction: 2 queries × 4 facets vs docs of ~8 chunks
      // (vec_id/8 doc key) — cosine kernel per pair, d-linear expected
      val qv = df.where(col("vec_id") < 8)
        .select((col("vec_id") % 2).as("query_id"),
          col("vec_id").as("qvec_id"), col("embedding"))
      graft.search.MaxSim.maxSimTopK(
        df.select((col("vec_id") / 8).cast("long").as("doc_id"),
          col("embedding")),
        col("doc_id"), col("embedding"),
        qv, col("query_id"), col("qvec_id"), col("embedding"), k = 10).count()
    }
    out += "maxsim_ivf_stream" -> time {
      // the STREAMING IVF MaxSim kernel at d: per-facet probe lists +
      // cluster equi-join + the FacetMaxSum udaf across a real
      // micro-batch — d enters only the cosine/centroid kernels, so
      // the route must stay ~linear in d like its batch sibling
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val ts = new java.sql.Timestamp(1700000000000L)
      val facets = df.where(col("vec_id") < 8)
        .select((col("vec_id") % 2).as("query_id"), col("vec_id"),
          col("embedding"))
        .collect().map(r => (r.getLong(0), r.getLong(1),
          r.getSeq[Float](2), ts)).toSeq
      val ms = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long, Seq[Float], java.sql.Timestamp)]
      ms.addData(facets)
      val corpusIdx = Ann.IvfIndex(
        idx.assigned.select((col("vec_id") / 8).cast("long").as("doc_id"),
          col("embedding"), col("cluster_id")),
        idx.centroids)
      val scored = graft.streaming.StreamingMaxSim.scoredPerQueryDocIvf(
        ms.toDS().toDF("query_id", "qvec_id", "q_emb", "ts"), corpusIdx,
        nprobe = 4)
      val name = s"dimprobe_msim_d$dim"
      val q = scored.writeStream.format("memory").queryName(name)
        .outputMode("append").start()
      try {
        q.processAllAvailable()
        // advance the watermark so the window closes and emits
        ms.addData(Seq((-1L, -1L, facets.head._3,
          new java.sql.Timestamp(1700000000000L + 7200000L))))
        q.processAllAvailable()
      } finally q.stop()
      spark.table(name).count()
    }
    df.unpersist()
    out.toSeq
  }

  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toInt else 20000
    val outPath = if (args.length > 1) args(1) else "DIMCHECK.json"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm the JVM so the d=64 pass doesn't absorb one-time codegen cost
    runFamily(spark, 2000, 16)

    val d64 = runFamily(spark, rows, 64).toMap
    val d1536 = runFamily(spark, rows, 1536)

    def s3(v: Double) = f"$v%.3f"
    val ops = d1536.map { case (name, t1536) =>
      val t64 = d64(name)
      s""""$name":{"d64":${s3(t64)},"d1536":${s3(t1536)},"ratio":${s3(t1536 / math.max(t64, 1e-9))}}"""
    }.mkString(",")
    val json =
      s"""{"what":"dim-1536 probe: vector family on a generated 1536-dim corpus vs a dim-64 twin, identical $rows rows (reference dim per extract_and_embed.py:46; dim ratio 24x; covariance/pca are d-quadratic by definition = ratio ~576x bound, everything else must stay ~linear in d)","rows":$rows,"ops":{$ops}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      json.getBytes("UTF-8"))
    spark.sparkContext.setLogLevel("OFF")
    spark.stop()
    println(json)
  }
}
