package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.SparkSessionExtensions

/** Custom whole-operator: per-group top-K without sorting whole groups.
  *
  * The built-in formulation (`row_number().over(Window.partitionBy(g)
  * .orderBy(desc(s)))` + `filter(rank <= k)` — W1, q21) must SORT every group
  * in full before discarding all but k rows; at 100 TB with millions of rows
  * per group that is the dominant cost. This operator keeps a bounded k-row
  * heap per group — memory O(groups × k), no sort — in two phases like a
  * partial aggregation: a map-side pass ([[TopKPerGroupPartialExec]]) bounds
  * the exchange to ≤ k rows per group per input partition, then the final
  * pass re-heaps and ranks. It demonstrates the full
  * Catalyst extension stack per the build guidance: logical node ([[TopKPerGroupNode]]) →
  * planner strategy ([[TopKStrategy]]) → physical exec ([[TopKPerGroupExec]]),
  * registered via `SparkSessionExtensions` ([[GraftExtensions]]) or
  * `spark.experimental.extraStrategies` ([[TopKPerGroup.install]]).
  *
  * Semantics: rows ranked per group by `sortCol` DESC, ties broken by
  * `tieCol` ASC; emits child columns + `rnk` (1..k). Identical to the window
  * formulation — q37 is oracle-checked against exactly that SQL.
  */
object TopKPerGroup {

  /** Public API: top `k` rows per `groupCols` by `sortCol` desc / `tieCol` asc. */
  def topK(df: DataFrame, groupCols: Seq[String], sortCol: String, tieCol: String, k: Int): DataFrame =
    plan(df, groupCols, sortCol, tieCol, k, dedup = false)

  /** Like [[topK]], but rows EQUAL under the per-group ordering
    * (`sortCol`,`tieCol`) are kept once — `distinct`-then-top-K folded into
    * the heap passes. One exchange (on the group key) replaces the distinct's
    * (group,item) exchange PLUS the top-K exchange, and map-side state stays
    * bounded at k rows per group. Only sound when (group, sort, tie)
    * functionally determine the whole row (true for basket caps, where the
    * row IS (key, item, -item)); rows differing in other columns would be
    * deduped arbitrarily.
    */
  def topKDistinct(df: DataFrame, groupCols: Seq[String], sortCol: String, tieCol: String, k: Int): DataFrame =
    plan(df, groupCols, sortCol, tieCol, k, dedup = true)

  /** Keep the k SMALLEST distinct `itemCol` values per group — the basket-cap
    * shape (r14, q15's capBasket decomposition): ranking ascending on the
    * item itself removes the negated sort column the descending formulation
    * needed, so the exchange carries (key, item) — two longs — instead of
    * three, and when both columns are in fact non-null longs the heap passes
    * run on PRIMITIVE state (open-addressed long→long[] — see
    * [[TopKHeaps.LongTopKMap]]) instead of a TreeSet of copied rows per key.
    */
  def topKSmallestDistinct(df: DataFrame, groupCols: Seq[String], itemCol: String, k: Int): DataFrame =
    plan(df, groupCols, itemCol, itemCol, k, dedup = true, ascending = true)

  private def plan(df: DataFrame, groupCols: Seq[String], sortCol: String, tieCol: String, k: Int, dedup: Boolean, ascending: Boolean = false): DataFrame = {
    install(df.sparkSession)
    val child = df.queryExecution.analyzed
    def attr(n: String): Attribute = child.output.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(s"column $n not in ${child.output.map(_.name)}"))
    val node = TopKPerGroupNode(k, groupCols.map(attr), attr(sortCol), attr(tieCol), child, dedup, ascending)
    ColumnBridge.ofRows(df.sparkSession, node)
  }

  /** Idempotently add the planner strategy to a session. */
  def install(spark: SparkSession): Unit = {
    val s = spark.experimental.extraStrategies
    if (!s.exists(_.isInstanceOf[TopKStrategy.type]))
      spark.experimental.extraStrategies = s :+ TopKStrategy
  }

  /** Plan `df` with the [[WindowTopKRewrite]] optimizer rule active, then
    * restore the session's rule set. The physical plan is forced (and
    * memoized by QueryExecution) while the rule is installed, so only this
    * frame gets the rewrite — other queries in the session keep their
    * deterministic plans.
    */
  def withAutoRewrite(df: DataFrame): DataFrame = synchronized {
    val spark = df.sparkSession
    install(spark)
    val before = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = before :+ WindowTopKRewrite
    try { df.queryExecution.executedPlan; df }
    finally spark.experimental.extraOptimizations = before
  }

  import graft.{QueryDef, Tables}
  import org.apache.spark.sql.functions._

  val defs: Seq[QueryDef] = Seq(
    // ----- q37: q21's per-brand top-5, executed by the custom operator —
    // oracle-checked against the window-formulation SQL (identical semantics,
    // bounded-heap physical plan).
    QueryDef.sql(
      "q37_topk_custom_operator",
      """WITH rev AS (
        |  SELECT p_brand, p_partkey, p_name,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |    COUNT(*) AS line_count
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1, 2, 3)
        |SELECT p_brand, p_partkey, p_name, revenue, line_count, rnk FROM (
        |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY revenue DESC, p_partkey) AS BIGINT) AS rnk
        |  FROM rev) x
        |WHERE rnk <= 5
        |ORDER BY p_brand, rnk""".stripMargin,
    ) { (spark, dir) =>
      val t = Tables(spark, dir)
      val li = t.lineitem
      val rev = li.join(broadcast(t.part), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "p_partkey", "p_name")
        .agg(
          sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1) - col("l_discount").cast("decimal(18,2)"))).cast("double").as("revenue"),
          count(lit(1)).as("line_count"))
      topK(rev, Seq("p_brand"), "revenue", "p_partkey", 5)
        .orderBy("p_brand", "rnk")
    },

    // ----- q39: the SAME query written as the plain window idiom, replanned
    // automatically by the WindowTopKRewrite optimizer rule — users keep
    // their SQL shape, the engine swaps in the bounded-heap operator
    // (TopKPerGroupSpec asserts the rewritten plan; identical oracle).
    QueryDef.sql(
      "q39_auto_topk_rewrite",
      """WITH rev AS (
        |  SELECT p_brand, p_partkey, p_name,
        |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
        |    COUNT(*) AS line_count
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1, 2, 3)
        |SELECT p_brand, p_partkey, p_name, revenue, line_count, rnk FROM (
        |  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY p_brand ORDER BY revenue DESC, p_partkey) AS BIGINT) AS rnk
        |  FROM rev) x
        |WHERE rnk <= 5
        |ORDER BY p_brand, rnk""".stripMargin,
    ) { (spark, dir) =>
      import org.apache.spark.sql.expressions.{Window => W}
      val t = Tables(spark, dir)
      val rev = t.lineitem.join(broadcast(t.part), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand", "p_partkey", "p_name")
        .agg(
          sum(col("l_extendedprice").cast("decimal(18,2)") *
            (lit(1) - col("l_discount").cast("decimal(18,2)"))).cast("double").as("revenue"),
          count(lit(1)).as("line_count"))
      val windowed = rev
        .withColumn("rnk", row_number().over(
          W.partitionBy("p_brand").orderBy(desc("revenue"), asc("p_partkey"))))
        .filter(col("rnk") <= 5)
        .select(col("p_brand"), col("p_partkey"), col("p_name"),
          col("revenue"), col("line_count"), col("rnk").cast("long").as("rnk"))
        .orderBy("p_brand", "rnk")
      withAutoRewrite(windowed)
    },
  )
}

case class TopKPerGroupNode(
    k: Int,
    groupExprs: Seq[Attribute],
    sortExpr: Attribute,
    tieExpr: Attribute,
    child: LogicalPlan,
    // dedup: rows equal under (sortExpr, tieExpr) within a group kept once
    dedup: Boolean = false,
    // ascending: rank by sortExpr ASC (tie ASC) instead of the default DESC;
    // the smallest-k shape basket caps use
    ascending: Boolean = false,
    // constructor param (NOT a body val): plan transforms call copy(), and a
    // body val would mint a fresh exprId each time — parents bound to the
    // original rnk#N would then fail with ATTRIBUTE_NOT_FOUND at runtime
    rankAttr: Attribute = AttributeReference("rnk", LongType, nullable = false)())
  extends UnaryNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

/** Optimizer rewrite (`Rule[LogicalPlan]`): recognize the built-in per-group
  * top-K idiom —
  * `Filter(rnk <= k, Project(..., Window(row_number over (part, s DESC, t ASC))))`
  * — and replan it onto [[TopKPerGroupNode]], the bounded-heap operator.
  * Users keep the window formulation; the engine swaps in the plan that
  * doesn't sort whole groups — the Catalyst analog of ClickHouse projections
  * choosing a better physical form for the same query.
  *
  * Deliberately narrow match (the rewrite must be provably identical):
  * single row_number window expression, non-empty attribute-only partition
  * spec, ORDER BY exactly (attr DESC, attr ASC), filter exactly `rnk <= K`
  * or `rnk < K` on the rank attribute with a positive integer literal.
  */
object WindowTopKRewrite extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project, Window, WindowGroupLimit}
  import org.apache.spark.sql.types.IntegerType

  private def topKOf(w: Window, rankAlias: Alias): Option[(Seq[Attribute], Attribute, Attribute)] =
    rankAlias.child match {
      // null orderings must be the defaults (DESC→NULLS LAST, ASC→NULLS
      // FIRST): TopKHeaps ranks with default ordering, so an explicit
      // `DESC NULLS FIRST` / `ASC NULLS LAST` query would be silently
      // re-ranked if matched here
      case WindowExpression(_: RowNumber, WindowSpecDefinition(parts,
          Seq(SortOrder(s: Attribute, Descending, NullsLast, _),
              SortOrder(t: Attribute, Ascending, NullsFirst, _)), _))
        if parts.nonEmpty && parts.forall(_.isInstanceOf[Attribute]) =>
        Some((parts.map(_.asInstanceOf[Attribute]), s, t))
      case _ => None
    }

  private def limitOf(cond: Expression, rankId: ExprId): Option[Int] = cond match {
    case LessThanOrEqual(a: Attribute, Literal(k: Int, IntegerType)) if a.exprId == rankId && k >= 1 => Some(k)
    case LessThan(a: Attribute, Literal(k: Int, IntegerType)) if a.exprId == rankId && k >= 2 => Some(k - 1)
    case _ => None
  }

  /** Rewrite one Filter-over-Window occurrence if it matches; None = leave. */
  private def rewrite(cond: Expression, projList: Option[Seq[NamedExpression]], w: Window): Option[LogicalPlan] =
    w.windowExpressions match {
      case Seq(al: Alias) =>
        (topKOf(w, al), limitOf(cond, al.exprId)) match {
          case (Some((groups, sortA, tieA)), Some(k))
            // every projection reference to the rank must be a bare
            // top-level attribute: a rank nested in an expression (`rnk+1`)
            // could not be re-pointed at the new node's rank and would
            // dangle — decline the rewrite instead
            if projList.forall(_.forall(e =>
              e.isInstanceOf[AttributeReference] ||
                !e.references.exists(_.exprId == al.exprId))) =>
            // Spark's own InferWindowGroupLimit may already have inserted a
            // WindowGroupLimit (sort + per-group limit) under the Window —
            // our heap subsumes it, so unwrap to avoid double work
            val source = w.child match {
              case wgl: WindowGroupLimit => wgl.child
              case c => c
            }
            val node = TopKPerGroupNode(k, groups, sortA, tieA, source)
            // restore the rank under its original exprId/type so parents
            // (and the dropped Filter's consumers) resolve unchanged
            val rankBack = Alias(Cast(node.rankAttr, IntegerType), al.name)(exprId = al.exprId)
            val restored = projList match {
              case Some(pl) => pl.map {
                case a: AttributeReference if a.exprId == al.exprId => rankBack
                case other => other
              }
              case None => w.child.output :+ rankBack // project collapsed away
            }
            Some(Project(restored, node))
          case _ => None
        }
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, Project(projList, w: Window)) =>
      rewrite(cond, Some(projList), w).getOrElse(f)
    case f @ Filter(cond, w: Window) =>
      rewrite(cond, None, w).getOrElse(f)
  }
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: TopKPerGroupNode =>
      // partial (map-side) pass under the final pass: the exchange the final
      // exec requires then carries at most k rows per group per input
      // partition — the top-K analog of partial aggregation
      TopKPerGroupExec(n.k, n.groupExprs, n.sortExpr, n.tieExpr, n.rankAttr,
        TopKPerGroupPartialExec(n.k, n.groupExprs, n.sortExpr, n.tieExpr,
          planLater(n.child), n.dedup, n.ascending), n.dedup, n.ascending) :: Nil
    case _ => Nil
  }
}

/** Shared bounded-heap pass: consume a partition, keep the best k rows per
  * group (worst at heap head). Memory O(groups-in-partition × k); rows are
  * copied only when they enter a heap — after warm-up that is the rare
  * better-than-current-worst case, not every input row.
  */
private[plans] object TopKHeaps {

  /** Primitive-path applicability (r14, from q15's capBasket decomposition:
    * the generic path's per-key TreeSet of copied UnsafeRows is GC-bound —
    * 15 s of GC in a 45 s CPU stage at sf1 vs 0.5 s for the same dedup in
    * codegen'd hash-agg form). When the operator is the smallest-k-distinct
    * shape over exactly (long key, long item), both heap passes run on an
    * open-addressed long→long[] map instead: one array per key, no per-row
    * copies, no comparator dispatch. Returns (keyOrdinal, itemOrdinal).
    */
  def primitiveOrds(
      childOutput: Seq[Attribute],
      groupExprs: Seq[Attribute],
      sortExpr: Attribute,
      tieExpr: Attribute,
      dedup: Boolean,
      ascending: Boolean): Option[(Int, Int)] = {
    if (!(dedup && ascending && groupExprs.size == 1 &&
        sortExpr.exprId == tieExpr.exprId && childOutput.size == 2)) return None
    val keyOrd = childOutput.indexWhere(_.exprId == groupExprs.head.exprId)
    val itemOrd = childOutput.indexWhere(_.exprId == sortExpr.exprId)
    val ok = keyOrd >= 0 && itemOrd >= 0 && keyOrd != itemOrd &&
      childOutput(keyOrd).dataType == LongType &&
      childOutput(itemOrd).dataType == LongType
    if (ok) Some((keyOrd, itemOrd)) else None
  }

  /** Open-addressed long→sorted-long[] map keeping the k smallest DISTINCT
    * items per key. vals(slot)(0) = count m, items sorted ascending at
    * 1..m. Insert is a binary search + bounded shift (baskets are ≤ k = 64
    * by construction); memory is one long[] per key — ~5× fewer objects and
    * zero per-row copies vs the generic TreeSet path.
    */
  final class LongTopKMap(k: Int) {
    private var capacity = 1 << 12
    private var mask = capacity - 1
    private var keys = new Array[Long](capacity)
    private var used = new Array[Boolean](capacity)
    private var vals = new Array[Array[Long]](capacity)
    private var n = 0

    private def slotOf(key: Long): Int = {
      var h = key * -7046029254386353131L // Murmur3 fmix-class avalanche
      h ^= h >>> 32
      var i = h.toInt & mask
      while (used(i) && keys(i) != key) i = (i + 1) & mask
      i
    }

    def insert(key: Long, item: Long): Unit = {
      var i = slotOf(key)
      if (!used(i)) {
        if (n >= capacity - (capacity >> 2)) { grow(); i = slotOf(key) } // ≤ 0.75 load
        used(i) = true; keys(i) = key
        val arr = new Array[Long](1 + math.min(k, 8))
        arr(0) = 1L; arr(1) = item
        vals(i) = arr
        n += 1
      } else vals(i) = insertItem(vals(i), item)
    }

    private def insertItem(arr0: Array[Long], item: Long): Array[Long] = {
      var arr = arr0
      val m = arr(0).toInt
      // first index in [1, m+1] with arr(idx) >= item
      var lo = 1; var hi = m
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        if (arr(mid) < item) lo = mid + 1 else hi = mid - 1
      }
      if (lo <= m && arr(lo) == item) return arr // distinct: duplicate is a no-op
      if (m == k) {
        if (lo > m) return arr // worse than the current worst
        System.arraycopy(arr, lo, arr, lo + 1, m - lo) // evict the largest
        arr(lo) = item
        arr
      } else {
        if (m + 2 > arr.length) {
          val b = new Array[Long](math.min(1 + k, (arr.length - 1) * 2 + 1))
          System.arraycopy(arr, 0, b, 0, m + 1)
          arr = b
        }
        System.arraycopy(arr, lo, arr, lo + 1, m - lo + 1)
        arr(lo) = item
        arr(0) = m + 1L
        arr
      }
    }

    private def grow(): Unit = {
      val oldKeys = keys; val oldUsed = used; val oldVals = vals
      capacity <<= 1; mask = capacity - 1
      keys = new Array[Long](capacity)
      used = new Array[Boolean](capacity)
      vals = new Array[Array[Long]](capacity)
      var i = 0
      while (i < oldKeys.length) {
        if (oldUsed(i)) {
          val s = slotOf(oldKeys(i))
          used(s) = true; keys(s) = oldKeys(i); vals(s) = oldVals(i)
        }
        i += 1
      }
    }

    /** Stream rows out: (key, item[, rank]) written at the given ordinals
      * through one reused row + UnsafeProjection (the standard operator
      * emission contract — the exchange copies on buffer).
      */
    def rowIterator(keyOrd: Int, itemOrd: Int, rankOrd: Int): Iterator[InternalRow] = {
      val width = if (rankOrd >= 0) 3 else 2
      val row = new SpecificInternalRow(Seq.fill(width)(LongType))
      val proj = UnsafeProjection.create(Array.fill[org.apache.spark.sql.types.DataType](width)(LongType))
      val outer = this
      new Iterator[InternalRow] {
        private var slot = 0
        private var idx = 1
        private def advance(): Unit =
          while (slot < outer.capacity &&
            (!outer.used(slot) || idx > outer.vals(slot)(0).toInt)) {
            slot += 1; idx = 1
          }
        override def hasNext: Boolean = { advance(); slot < outer.capacity }
        override def next(): InternalRow = {
          advance()
          val arr = outer.vals(slot)
          row.setLong(keyOrd, outer.keys(slot))
          row.setLong(itemOrd, arr(idx))
          if (rankOrd >= 0) row.setLong(rankOrd, idx.toLong)
          idx += 1
          proj(row)
        }
      }
    }
  }

  /** Consume a partition into a [[LongTopKMap]]. Parquet attributes are
    * typically nullable=true regardless of the data, so static typing can't
    * prove the contract — a null mid-partition is handled by FALLING BACK to
    * the generic comparator path for that partition (ADVICE r14; the old
    * IllegalStateException aborted the whole query for callers outside the
    * known-null-free TPC-H basket shapes). The accumulated primitive state
    * is lossless here: in the 2-column dedup shape the (key, item) pairs ARE
    * the rows, so on the first null they replay into the generic build ahead
    * of the trigger row and the remaining input.
    *
    * Right(map) = the whole partition was null-free (the hot path, zero
    * overhead beyond the isNullAt checks it always did); Left(iter) = an
    * equivalent row iterator for the generic [[build]].
    */
  def buildPrimitive(
      iter: Iterator[InternalRow],
      keyOrd: Int,
      itemOrd: Int,
      k: Int): Either[Iterator[InternalRow], LongTopKMap] = {
    val map = new LongTopKMap(k)
    while (iter.hasNext) {
      val row = iter.next()
      if (row.isNullAt(keyOrd) || row.isNullAt(itemOrd))
        // replay order is irrelevant: both heap builds are order-insensitive
        // over a partition (bounded per-key state, not streaming rank)
        return scala.Left(
          map.rowIterator(keyOrd, itemOrd, rankOrd = -1) ++
            Iterator.single[InternalRow](row.copy()) ++ iter)
      map.insert(row.getLong(keyOrd), row.getLong(itemOrd))
    }
    scala.Right(map)
  }

  def build(
      iter: Iterator[InternalRow],
      childOutput: Seq[Attribute],
      groupExprs: Seq[Attribute],
      sortExpr: Attribute,
      tieExpr: Attribute,
      k: Int,
      dedup: Boolean,
      ascending: Boolean = false,
  ): (java.util.HashMap[UnsafeRow, java.util.Collection[InternalRow]],
      java.util.Comparator[InternalRow]) = {
    val groupProj = UnsafeProjection.create(groupExprs, childOutput)
    val dir = if (ascending) Ascending else Descending
    val sortOrd = SortOrder(sortExpr, dir) ::
      SortOrder(tieExpr, Ascending) :: Nil
    val cmp = RowOrdering.create(sortOrd, childOutput)
    val heaps = new java.util.HashMap[UnsafeRow, java.util.Collection[InternalRow]]()
    val heapCmp = new java.util.Comparator[InternalRow] {
      // PriorityQueue keeps the SMALLEST first — "smallest" = worst row =
      // largest under cmp (cmp sorts best-first), so reverse
      override def compare(a: InternalRow, b: InternalRow): Int = cmp.compare(b, a)
    }
    while (iter.hasNext) {
      val row = iter.next()
      val key = groupProj(row)
      var heap = heaps.get(key)
      if (heap == null) {
        heap =
          if (dedup) new java.util.TreeSet[InternalRow](cmp) // ordering equality dedups
          else new java.util.PriorityQueue[InternalRow](k + 1, heapCmp)
        heaps.put(key.copy(), heap)
      }
      if (dedup) {
        // TreeSet.add is a no-op on an ordering-equal row (the distinct);
        // bound at k by evicting the worst (last under best-first cmp)
        val set = heap.asInstanceOf[java.util.TreeSet[InternalRow]]
        if (set.size < k) set.add(row.copy())
        else if (cmp.compare(row, set.last()) < 0 && set.add(row.copy())) set.pollLast()
      } else {
        val pq = heap.asInstanceOf[java.util.PriorityQueue[InternalRow]]
        if (pq.size < k) pq.add(row.copy())
        else if (cmp.compare(row, pq.peek()) < 0) { // row ranks better than current worst
          pq.poll()
          pq.add(row.copy())
        }
      }
    }
    (heaps, cmp)
  }
}

/** Map-side combine: emits each input partition's per-group top-k survivors
  * (unranked — ranking needs the group complete). No required distribution,
  * so it runs before the exchange on whatever partitioning the child has.
  */
case class TopKPerGroupPartialExec(
    k: Int,
    groupExprs: Seq[Attribute],
    sortExpr: Attribute,
    tieExpr: Attribute,
    child: SparkPlan,
    dedup: Boolean = false,
    ascending: Boolean = false) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override protected def doExecute(): RDD[InternalRow] = {
    val (childOutput, kL, gL, sL, tL, dL, aL) = (child.output, k, groupExprs, sortExpr, tieExpr, dedup, ascending)
    def generic(iter: Iterator[InternalRow]): Iterator[InternalRow] = {
      val (heaps, _) = TopKHeaps.build(iter, childOutput, gL, sL, tL, kL, dL, aL)
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
    }
    TopKHeaps.primitiveOrds(childOutput, gL, sL, tL, dL, aL) match {
      case Some((keyOrd, itemOrd)) =>
        child.execute().mapPartitions({ iter =>
          TopKHeaps.buildPrimitive(iter, keyOrd, itemOrd, kL) match {
            case scala.Right(map) => map.rowIterator(keyOrd, itemOrd, rankOrd = -1)
            case scala.Left(rows) => generic(rows) // null seen: per-partition fallback
          }
        }, preservesPartitioning = true)
      case None =>
        child.execute().mapPartitions(generic, preservesPartitioning = true)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

case class TopKPerGroupExec(
    k: Int,
    groupExprs: Seq[Attribute],
    sortExpr: Attribute,
    tieExpr: Attribute,
    rankAttr: Attribute,
    child: SparkPlan,
    dedup: Boolean = false,
    ascending: Boolean = false) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)

  // co-locate each group's rows on one partition; Spark inserts the exchange
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val (childOutput, kL, gL, sL, tL, dL, aL) = (child.output, k, groupExprs, sortExpr, tieExpr, dedup, ascending)
    val outputL = output
    val rankAttrL = rankAttr
    def generic(iter: Iterator[InternalRow]): Iterator[InternalRow] = {
      val (heaps, cmp) = TopKHeaps.build(iter, childOutput, gL, sL, tL, kL, dL, aL)
      val joined = new JoinedRow
      val outProj = UnsafeProjection.create(outputL, childOutput :+ rankAttrL)
      val rankRow = new SpecificInternalRow(Seq(LongType))
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap { heap =>
        val rows = heap.toArray(new Array[InternalRow](heap.size))
        java.util.Arrays.sort(rows, cmp) // best-first
        rows.iterator.zipWithIndex.map { case (r, i) =>
          rankRow.setLong(0, i + 1L)
          outProj(joined(r, rankRow))
        }
      }
    }
    TopKHeaps.primitiveOrds(childOutput, gL, sL, tL, dL, aL) match {
      case Some((keyOrd, itemOrd)) =>
        child.execute().mapPartitions({ iter =>
          TopKHeaps.buildPrimitive(iter, keyOrd, itemOrd, kL) match {
            case scala.Right(map) => map.rowIterator(keyOrd, itemOrd, rankOrd = childOutput.size)
            case scala.Left(rows) => generic(rows) // null seen: per-partition fallback
          }
        }, preservesPartitioning = true)
      case None =>
        child.execute().mapPartitions(generic, preservesPartitioning = true)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

/** `spark.sql.extensions=graft.plans.GraftExtensions` registration path:
  * installs the full operator stack — planner strategy AND the window-idiom
  * auto-rewrite — on every session of the application.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => TopKStrategy)
    e.injectOptimizerRule(_ => WindowTopKRewrite)
    // transparent MV routing (no-op until a cascade registers a root)
    e.injectOptimizerRule(session => MvRoutingRule(session))
  }
}
