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
  def topK(df: DataFrame, groupCols: Seq[String], sortCol: String, tieCol: String, k: Int): DataFrame = {
    install(df.sparkSession)
    val child = df.queryExecution.analyzed
    def attr(n: String): Attribute = child.output.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(s"column $n not in ${child.output.map(_.name)}"))
    val node = TopKPerGroupNode(k, groupCols.map(attr), attr(sortCol), attr(tieCol), child)
    ColumnBridge.ofRows(df.sparkSession, node)
  }

  /** Idempotently add the planner strategy to a session. */
  def install(spark: SparkSession): Unit = {
    val s = spark.experimental.extraStrategies
    if (!s.exists(_.isInstanceOf[TopKStrategy.type]))
      spark.experimental.extraStrategies = s :+ TopKStrategy
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
  )
}

case class TopKPerGroupNode(
    k: Int,
    groupExprs: Seq[Attribute],
    sortExpr: Attribute,
    tieExpr: Attribute,
    child: LogicalPlan,
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

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: TopKPerGroupNode =>
      // partial (map-side) pass under the final pass: the exchange the final
      // exec requires then carries at most k rows per group per input
      // partition — the top-K analog of partial aggregation
      TopKPerGroupExec(n.k, n.groupExprs, n.sortExpr, n.tieExpr, n.rankAttr,
        TopKPerGroupPartialExec(n.k, n.groupExprs, n.sortExpr, n.tieExpr,
          planLater(n.child))) :: Nil
    case _ => Nil
  }
}

/** Shared bounded-heap pass: consume a partition, keep the best k rows per
  * group (worst at heap head). Memory O(groups-in-partition × k); rows are
  * copied only when they enter a heap — after warm-up that is the rare
  * better-than-current-worst case, not every input row.
  */
private[plans] object TopKHeaps {
  def build(
      iter: Iterator[InternalRow],
      childOutput: Seq[Attribute],
      groupExprs: Seq[Attribute],
      sortExpr: Attribute,
      tieExpr: Attribute,
      k: Int,
  ): (java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]],
      java.util.Comparator[InternalRow]) = {
    val groupProj = UnsafeProjection.create(groupExprs, childOutput)
    val sortOrd = SortOrder(sortExpr, Descending) ::
      SortOrder(tieExpr, Ascending) :: Nil
    val cmp = RowOrdering.create(sortOrd, childOutput)
    val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
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
        heap = new java.util.PriorityQueue[InternalRow](k + 1, heapCmp)
        heaps.put(key.copy(), heap)
      }
      if (heap.size < k) heap.add(row.copy())
      else if (cmp.compare(row, heap.peek()) < 0) { // row ranks better than current worst
        heap.poll()
        heap.add(row.copy())
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
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override protected def doExecute(): RDD[InternalRow] = {
    val (childOutput, kL, gL, sL, tL) = (child.output, k, groupExprs, sortExpr, tieExpr)
    child.execute().mapPartitions({ iter =>
      val (heaps, _) = TopKHeaps.build(iter, childOutput, gL, sL, tL, kL)
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
    }, preservesPartitioning = true)
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
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)

  // co-locate each group's rows on one partition; Spark inserts the exchange
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val (childOutput, kL, gL, sL, tL) = (child.output, k, groupExprs, sortExpr, tieExpr)
    child.execute().mapPartitions({ iter =>
      val (heaps, cmp) = TopKHeaps.build(iter, childOutput, gL, sL, tL, kL)
      val joined = new JoinedRow
      val outProj = UnsafeProjection.create(output, childOutput :+ rankAttr)
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
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

/** `spark.sql.extensions=graft.plans.GraftExtensions` registration path. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectPlannerStrategy(_ => TopKStrategy)
}
