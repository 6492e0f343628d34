package graft.plans

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeReference, AttributeSet, GenericInternalRow, PredicateHelper, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, LongType}

/** Whole-operator KNN join as a first-class Catalyst citizen: a logical
  * node + planner strategy + physical operator (SURVEY §8 round-2
  * candidate; the custom-operator tier (c) of the build brief).
  *
  * Semantics: for every left row, the k nearest right rows by L2 over
  * `array<float>` embeddings — identical output contract to
  * [[graft.vector.Knn.similarityJoin]] (score rounded half-up to 4dp,
  * ascending (score, right_id) order, rank 1..k).
  *
  * Why a custom physical node when the compositional form exists: the
  * declarative plan is `BroadcastNestedLoopJoin` → full M×N row
  * materialization → `Window(row_number)` — which *shuffles the M×N
  * intermediate by left_id* before discarding all but k per row.
  * [[BroadcastKnnExec]] keeps a k-heap per left row while streaming the
  * broadcast right side, so the M×N candidate set is never materialized
  * and the operator emits exactly M×k rows with NO exchange: per-
  * partition work is CPU-bound distance math, the shape that scales
  * linearly with executors at 100 TB.
  */
case class KnnJoin(left: LogicalPlan, right: LogicalPlan, k: Int,
                   output: Seq[Attribute]) extends BinaryNode {

  require(k > 0, "k must be positive")

  // The node mints its own output attributes (they reference no child
  // column); declare them produced or CheckAnalysis reports them as
  // missing from the children's output.
  override def producedAttributes: AttributeSet = AttributeSet(output)

  // The physical operator consumes BOTH child columns positionally, but
  // no Catalyst expression in this node references them — without this
  // override `references` is empty and ColumnPruning rewrites the
  // children to empty Projects (observed under `count()`, where nothing
  // downstream references our output either: the exec then read field 0
  // of zero-field rows — wild reads, intermittent SIGSEGV).
  override lazy val references: AttributeSet =
    AttributeSet(left.output ++ right.output)

  override protected def withNewChildrenInternal(newLeft: LogicalPlan,
                                                 newRight: LogicalPlan): KnnJoin =
    copy(left = newLeft, right = newRight)
}

object KnnJoin {

  /** Output attributes: (left_id, right_id, score, rank). */
  def knnOutput(): Seq[Attribute] = Seq(
    AttributeReference("left_id", LongType, nullable = false)(),
    AttributeReference("right_id", LongType, nullable = false)(),
    AttributeReference("score", DoubleType, nullable = false)(),
    AttributeReference("rank", IntegerType, nullable = false)())

  /** Build the KNN-join DataFrame. `left`/`right` must carry
    * (`id`: long, `embedding`: array<float>) columns; extra columns are
    * pruned here so the physical operator can address fields by
    * position.
    */
  def apply(left: DataFrame, right: DataFrame, k: Int): DataFrame = {
    val spark = left.sparkSession
    GraftColumnBridge.addStrategy(spark, KnnJoinStrategy)
    GraftColumnBridge.addOptimization(spark, PushFilterThroughKnnJoin)
    // The exec addresses (id: long, embedding: array<float>) by position
    // and assumes both non-null; enforce that contract here (null rows
    // can't participate in a distance ranking anyway — matches the
    // compositional similarityJoin, where null inputs round to no rows).
    def prep(df: DataFrame): DataFrame = df
      .select(col("id").cast("long").as("id"),
        col("embedding").cast("array<float>").as("embedding"))
      .where(col("id").isNotNull && col("embedding").isNotNull)
    val l = prep(left)
    val r = prep(right)
    GraftColumnBridge.ofRows(spark,
      new KnnJoin(GraftColumnBridge.analyzed(l), GraftColumnBridge.analyzed(r),
        k, knnOutput()))
  }
}

/** Optimizer rule for the custom operator: a filter on `left_id`
  * commutes with the per-left-row top-k (each left row's neighbor set
  * is independent of every other left row), so left_id-only conjuncts
  * push through [[KnnJoin]] into the LEFT child — pruning rows before
  * any distance is computed, and letting Catalyst continue pushing the
  * rewritten predicate all the way into the parquet scan. Built-in
  * pushdown cannot do this (KnnJoin is an opaque node to it); this is
  * the `Rule[LogicalPlan]` the custom-operator tier owes the optimizer.
  *
  * Filters on `right_id`/`score`/`rank` do NOT commute (removing a
  * right row changes every left row's ranking) and stay above the join.
  */
object PushFilterThroughKnnJoin extends Rule[LogicalPlan] with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, kj: KnnJoin) =>
      val leftId = kj.output.head
      val (push, keep) = splitConjunctivePredicates(cond)
        .partition(c => c.deterministic && c.references == AttributeSet(leftId))
      if (push.isEmpty) f
      else {
        // left_id carries the value of the left child's id column verbatim
        val childId = kj.left.output.head
        val rewritten = push.map(_.transform {
          case a: AttributeReference if a.exprId == leftId.exprId => childId
        }).reduce(And)
        val pushed = kj.withNewChildren(
          Seq(Filter(rewritten, kj.left), kj.right))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** Plans [[KnnJoin]] into [[BroadcastKnnExec]]; injected via
  * [[graft.ext.GraftExtensions]] or `experimental.extraStrategies`.
  */
object KnnJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case KnnJoin(l, r, k, out) => BroadcastKnnExec(planLater(l), planLater(r), k, out) :: Nil
    case _ => Nil
  }
}

/** Physical broadcast-KNN: collect + broadcast the (small) right side,
  * then one narrow map over left partitions maintaining a bounded
  * max-heap of (rounded score, right_id) per left row. Emits k rows per
  * left row in ascending rank order. No exchange anywhere in the
  * operator; parallelism is the left side's partitioning.
  */
case class BroadcastKnnExec(left: SparkPlan, right: SparkPlan, k: Int,
                            output: Seq[Attribute]) extends BinaryExecNode {

  override def producedAttributes: AttributeSet = AttributeSet(output)

  override protected def withNewChildrenInternal(newLeft: SparkPlan,
                                                 newRight: SparkPlan): BroadcastKnnExec =
    copy(left = newLeft, right = newRight)

  /** The exec addresses child fields positionally; a planner rewrite
    * that prunes or reorders them must fail loudly, never read wild.
    */
  private def checkChildSchema(p: SparkPlan, side: String): Unit = {
    val ok = p.output.length == 2 &&
      p.output.head.dataType == LongType &&
      (p.output(1).dataType match {
        case org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, _) => true
        case _ => false
      })
    require(ok, s"BroadcastKnnExec $side child must produce exactly " +
      s"(id: bigint, embedding: array<float>), got: ${p.output.map(a => s"${a.name}: ${a.dataType.simpleString}")}")
  }

  protected override def doExecute(): RDD[InternalRow] = {
    checkChildSchema(left, "left")
    checkChildSchema(right, "right")
    // Guard the driver collect: this operator is for a SMALL right side
    // (the dimension/query set). A large right side must go through the
    // compositional path, where Spark's broadcast thresholds apply.
    val maxRows = conf.getConfString("graft.knn.maxBroadcastRows", "4000000").toInt
    // executeTake stops pulling partitions once it has maxRows+1 rows, so an
    // oversized right side fails fast instead of OOMing the driver mid-collect.
    val rightRows = right.executeTake(maxRows + 1)
    if (rightRows.length > maxRows)
      throw new IllegalStateException(
        s"BroadcastKnnExec: right side exceeds graft.knn.maxBroadcastRows=$maxRows; " +
          "use graft.vector.Knn.similarityJoin (compositional, respects Spark " +
          "broadcast limits) for large right sides.")
    val rIds = new Array[Long](rightRows.length)
    val rEmbs = new Array[Array[Float]](rightRows.length)
    var i = 0
    while (i < rightRows.length) {
      rIds(i) = rightRows(i).getLong(0)
      rEmbs(i) = rightRows(i).getArray(1).toFloatArray()
      i += 1
    }
    val bc = sparkContext.broadcast((rIds, rEmbs))
    val kk = k
    left.execute().mapPartitions { iter =>
      val proj = UnsafeProjection.create(
        Array[DataType](LongType, LongType, DoubleType, IntegerType))
      val (ids, embs) = bc.value
      iter.flatMap { row =>
        val lid = row.getLong(0)
        val lemb = row.getArray(1).toFloatArray()
        // bounded max-heap: root = current worst of the kept k,
        // ordered by (score desc, right_id desc) so better candidates
        // evict it; final extraction sorts ascending.
        val hScore = new Array[Double](kk)
        val hId = new Array[Long](kk)
        var size = 0

        def worse(s1: Double, id1: Long, s2: Double, id2: Long): Boolean =
          s1 > s2 || (s1 == s2 && id1 > id2)

        def siftDown(start: Int): Unit = {
          var p = start
          var continue = true
          while (continue) {
            val lc = 2 * p + 1
            val rc = lc + 1
            var m = p
            if (lc < size && worse(hScore(lc), hId(lc), hScore(m), hId(m))) m = lc
            if (rc < size && worse(hScore(rc), hId(rc), hScore(m), hId(m))) m = rc
            if (m == p) continue = false
            else {
              val ts = hScore(p); hScore(p) = hScore(m); hScore(m) = ts
              val ti = hId(p); hId(p) = hId(m); hId(m) = ti
              p = m
            }
          }
        }

        var r = 0
        val n = ids.length
        while (r < n) {
          val e = embs(r)
          var acc = 0.0
          var j = 0
          val d = math.min(lemb.length, e.length)
          while (j < d) {
            val t = lemb(j).toDouble - e(j).toDouble
            acc += t * t; j += 1
          }
          // identical rounding to Spark's round(col, 4): HALF_UP decimal
          val score = new JBigDecimal(java.lang.Double.toString(math.sqrt(acc)))
            .setScale(4, RoundingMode.HALF_UP).doubleValue()
          if (size < kk) {
            // insert + sift up
            hScore(size) = score; hId(size) = ids(r); size += 1
            var c = size - 1
            while (c > 0 && worse(hScore(c), hId(c), hScore((c - 1) / 2), hId((c - 1) / 2))) {
              val p = (c - 1) / 2
              val ts = hScore(p); hScore(p) = hScore(c); hScore(c) = ts
              val ti = hId(p); hId(p) = hId(c); hId(c) = ti
              c = p
            }
          } else if (worse(hScore(0), hId(0), score, ids(r))) {
            hScore(0) = score; hId(0) = ids(r)
            siftDown(0)
          }
          r += 1
        }
        // drain the heap into ascending (score, id) order
        val m = size
        val outScore = new Array[Double](m)
        val outId = new Array[Long](m)
        var s = m
        while (s > 0) {
          outScore(s - 1) = hScore(0); outId(s - 1) = hId(0)
          size -= 1
          hScore(0) = hScore(size); hId(0) = hId(size)
          siftDown(0)
          s -= 1
        }
        (0 until m).iterator.map { rk =>
          proj(new GenericInternalRow(
            Array[Any](lid, outId(rk), outScore(rk), rk + 1)))
        }
      }
    }
  }
}

/** Convenience API mirroring [[graft.vector.Knn.similarityJoin]]. */
object BroadcastKnn {
  def similarityJoin(left: DataFrame, right: DataFrame, k: Int): DataFrame =
    KnnJoin(left, right, k)

  def inject(spark: SparkSession): Unit = {
    GraftColumnBridge.addStrategy(spark, KnnJoinStrategy)
    GraftColumnBridge.addOptimization(spark, PushFilterThroughKnnJoin)
  }

  /** Physical-route dispatch for the KNN join — the cost decision a
    * planner would make, exposed as API because the two routes have
    * identical semantics but opposite scaling walls:
    *
    *  - right side fits the broadcast budget → [[BroadcastKnnExec]]
    *    (zero exchanges, M×k output, never materializes M×N);
    *  - right side too large → [[graft.vector.BlockMatrix.l2Join]]
    *    (SUMMA block tiles, bounded shuffle streams, no broadcast of
    *    either side) — same output contract, opposite memory shape.
    *
    * The probe is `limit(budget + 1).count()` on the right side — a
    * bounded scan that stops as soon as the budget is exceeded, not a
    * full count of a 100 TB input.
    */
  def similarityJoinAuto(left: DataFrame, right: DataFrame, k: Int,
                         maxBroadcastRows: Long = 4000000L): DataFrame = {
    val budget = math.min(maxBroadcastRows, Int.MaxValue - 1L).toInt
    val smallEnough = right.limit(budget + 1).count() <= budget
    if (smallEnough) similarityJoin(left, right, k)
    else {
      // committed to the tiled route: size the block count from data
      // volume so one tile fits a task's heap (the per-task bound in
      // BlockMatrix's doc), not from a core-count guess. The counts
      // are two scans — noise next to the B² tile join they configure.
      import org.apache.spark.sql.functions.{col, size => asize}
      val leftRows = left.count()
      val rightRows = right.count()
      // probe the dim from a VALID row — null/empty embeddings exist in
      // the wild and l2Join itself just filters them out
      val dim = right
        .where(col("embedding").isNotNull && asize(col("embedding")) > 0)
        .select(asize(col("embedding")).as("d")).head(1)
        .headOption.map(_.getInt(0))
      dim match {
        case Some(d) =>
          // asymmetric split: only the buffered LEFT side carries the
          // per-task heap bound; the streamed right split just fills
          // the parallelism floor / caps scan extent, so the shuffle
          // replicates each side by the OTHER side's (small) factor
          val (bl, br) = graft.vector.BlockMatrix.chooseBlockCounts(
            leftRows, rightRows, d)
          graft.vector.BlockMatrix.l2JoinBlocks(left, right, k, bl, br)
        case None => graft.vector.BlockMatrix.l2Join(left, right, k)
      }
    }
  }
}
