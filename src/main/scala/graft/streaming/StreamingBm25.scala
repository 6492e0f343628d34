package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.text.TextAnalysis

/** Incremental BM25 index maintenance — the lexical sibling of
  * [[StreamingIvf]]: the postings table is batch-built once
  * ([[TextAnalysis.buildBm25Index]] — token-bucketed, so serving joins
  * run with zero postings-side exchanges), and arriving documents keep
  * it fresh by appending their postings INTO THE SAME BUCKET LAYOUT
  * and refreshing the 1-row corpus stats. Serving
  * ([[TextAnalysis.bm25JoinIndexed]]) needs no code change: document
  * frequencies and scores are derived from the postings table at query
  * time, so a query issued after any number of appended batches sees
  * exactly the index a full rebuild would produce.
  *
  * Scale design: each micro-batch is tokenize → per-doc tf aggregate
  * (the SAME [[TextAnalysis.bm25Postings]] derivation the batch build
  * uses — one definition, so the served-equals-rebuild invariant can't
  * drift) → one bucketed append (batch bucketBy inside foreachBatch —
  * the streaming parquet sink cannot bucket) → a stats overwrite
  * derived from the postings table's pruned (id, dl) columns. No state
  * store, no watermark: the INDEX is the state, exactly where a
  * serving system wants it. Callers ingesting documents with ids
  * already indexed should dedup upstream ([[StreamingDedup]]) or
  * compact with [[graft.operators.Upsert]] semantics at rebuild time —
  * appends are add-only, the same contract as the reference's
  * insert-only vector store.
  *
  * == Exactly-once commit protocol ==
  *
  * foreachBatch is AT-LEAST-ONCE: after a crash the last batch
  * replays, and a blind append would double its postings (doubling
  * tf/df in every served score). A marker file alone only covers
  * replays of batches that COMPLETED — a crash after the parquet
  * append commits but before the marker lands would still double on
  * replay. The sink therefore stages and commits each batch:
  *
  *  1. write the batch's postings bucketed into a batch-scoped STAGING
  *     dir (a crash here touches nothing the serving table lists);
  *  2. write a MANIFEST of the staged file names (temp file + atomic
  *     rename);
  *  3. move each staged file into the table dir — bucket identity
  *     lives in the part-file NAME (the `_0000N` suffix Spark's
  *     bucketed reader parses), so a rename preserves the bucket
  *     layout and the exchange-free serving join;
  *  4. refresh + overwrite the stats side table (idempotent);
  *  5. create the batch MARKER — the commit point.
  *
  * Replay of batch b: marker present → fully committed, skip. Marker
  * absent but manifest present → the crash hit between steps 2 and 5;
  * delete every manifest-listed file from the table dir (files not yet
  * moved are simply absent) and redo from step 1. Marker and manifest
  * both absent → the crash hit before step 2 and the table dir was
  * never touched; redo from step 1. Every served read therefore sees
  * each document's postings exactly once.
  */
object StreamingBm25 {

  /** Start the maintenance sink over a document stream: per batch,
    * append postings into `table` (must exist — built by
    * [[TextAnalysis.buildBm25Index]]) under the same bucket spec, then
    * refresh `<table>_stats`.
    */
  def maintain(stream: DataFrame, idCol: String, textCol: String,
               table: String, path: String, checkpointDir: String,
               numBuckets: Int = 32): StreamingQuery = {
    // foreachBatch executes under a micro-batch CLONE of the session;
    // a refreshTable there invalidates only the clone's relation
    // cache, and the serving session keeps reading the pre-append file
    // listing. Capture the serving session now and refresh ITS catalog
    // after every append.
    val serveSession = stream.sparkSession
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val root = new Path(path)
        val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val marker = new Path(s"$path/__batches/batch-$batchId")
        if (!fs.exists(marker)) {
          val manifest = new Path(s"$path/__batches/manifest-$batchId")
          // reconcile a mid-move crash: remove whatever subset of this
          // batch's files already reached the table dir before redoing
          if (fs.exists(manifest)) {
            val in = fs.open(manifest)
            val names = scala.io.Source.fromInputStream(in, "UTF-8")
              .getLines().filter(_.nonEmpty).toList
            in.close()
            names.foreach(n => fs.delete(new Path(root, n), false))
            fs.delete(manifest, false)
          }
          // stage: bucketed write into a batch-scoped dir (bucketBy
          // requires saveAsTable; the staging table is transient)
          val stagePath = new Path(s"$path/__staging/batch-$batchId")
          fs.delete(stagePath, true)
          val stageTable = s"${table}_stage"
          spark.sql(s"DROP TABLE IF EXISTS $stageTable")
          TextAnalysis.bm25Postings(batch, col(idCol), col(textCol))
            .repartition(numBuckets, col("token"))
            .write.mode(SaveMode.Overwrite)
            .format("parquet")
            .option("path", stagePath.toString)
            .bucketBy(numBuckets, "token")
            .sortBy("token")
            .saveAsTable(stageTable)
          val staged = fs.listStatus(stagePath).toSeq.map(_.getPath)
            .filter(_.getName.startsWith("part-"))
          // manifest before any move, via atomic rename
          val mTmp = new Path(s"$path/__batches/.manifest-$batchId.tmp")
          val out = fs.create(mTmp, true)
          out.write(staged.map(_.getName).mkString("\n").getBytes("UTF-8"))
          out.close()
          // Hadoop rename signals failure by RETURNING FALSE, not by
          // throwing (e.g. destination exists, cross-volume move). A
          // swallowed false here would let the cleanup below delete the
          // staged postings while the marker still lands — the batch
          // would be recorded committed with its postings silently
          // missing from the served index. Fail the micro-batch instead
          // so the checkpoint replays it.
          def renameOrFail(src: Path, dst: Path): Unit =
            if (!fs.rename(src, dst))
              throw new java.io.IOException(
                s"StreamingBm25 commit: rename $src -> $dst returned false; " +
                "failing batch so the checkpoint replays it")
          renameOrFail(mTmp, manifest)
          // commit: move staged files into the serving table dir
          staged.foreach(p => renameOrFail(p, new Path(root, p.getName)))
          spark.sql(s"DROP TABLE IF EXISTS $stageTable")
          fs.delete(stagePath, true)
          spark.catalog.refreshTable(table)
          spark.table(table)
            .select(col("id"), col("dl")).distinct()
            .agg(count(lit(1)).as("n"), avg(col("dl")).as("avgdl"))
            .write.mode(SaveMode.Overwrite)
            .format("parquet").option("path", s"$path/__stats")
            .saveAsTable(s"${table}_stats")
          spark.catalog.refreshTable(s"${table}_stats")
          serveSession.catalog.refreshTable(table)
          serveSession.catalog.refreshTable(s"${table}_stats")
          fs.create(marker, true).close()
        }
        ()
      }
      .start()
  }
}
