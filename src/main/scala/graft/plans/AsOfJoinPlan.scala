package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col

/** AS-OF join as a first-class Catalyst operator — the custom
  * LogicalPlan → SparkStrategy → SparkPlan path for whole-operator
  * semantics the built-in operators can't express (the alternative
  * union-sort WINDOW formulation lives in `operators/AsOfJoin.asOf`; this
  * node is the dedicated physical algorithm Spark itself lacks, the shape
  * of DuckDB's native ASOF JOIN and Pandas' merge_asof).
  *
  * Physical contract: both children hash-clustered on the key and sorted
  * within partitions by (key, ts) — declared via requiredChildDistribution
  * / requiredChildOrdering, so EnsureRequirements plans the exchanges and
  * sorts exactly as it would for a sort-merge join (ONE keyed shuffle of
  * each side, AQE-coalescible). Execution is then a streaming two-pointer
  * merge per partition: O(|L|+|R|) time, O(1) state (the latest right row
  * for the current key) — no window buffer, no payload struct
  * materialization, no range explosion at any scale.
  */
final case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, leftTs: Attribute,
    rightKey: Attribute, rightTs: Attribute,
    payload: Seq[Attribute]) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

final case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, leftTs: Attribute,
    rightKey: Attribute, rightTs: Attribute,
    payload: Seq[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  // The right side additionally sorts by the (orderable) payload columns:
  // "later rows at equal ts win" in the merge then deterministically picks
  // the GREATEST payload among equal-ts ties — without this the winner is
  // shuffle-arrival order, which differs across executor layouts (caught
  // by the round-12 multi-JVM suite: local[4] and local-cluster[2,4]
  // disagreed on a tied fixture). The window formulation pins the same
  // rule, so native ≡ window on every input, ties included.
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)) ++
      payload.filter(a => org.apache.spark.sql.catalyst.expressions
        .RowOrdering.isOrderable(a.dataType))
        .map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val lkOrd = leftOut.indexWhere(_.exprId == leftKey.exprId)
    val ltOrd = leftOut.indexWhere(_.exprId == leftTs.exprId)
    val rkOrd = rightOut.indexWhere(_.exprId == rightKey.exprId)
    val rtOrd = rightOut.indexWhere(_.exprId == rightTs.exprId)
    require(lkOrd >= 0 && ltOrd >= 0 && rkOrd >= 0 && rtOrd >= 0,
      "as-of key/ts attributes must come from the respective child")
    val kType = leftKey.dataType
    val tType = leftTs.dataType
    val out = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val keyOrd = TypeUtils.getInterpretedOrdering(kType)
      val tsOrd = TypeUtils.getInterpretedOrdering(tType)
      // sort iterators reuse their UnsafeRow — the lookahead head and the
      // retained match must be stable, so right rows are copied on fetch
      // (the same buffered-side copy a sort-merge join performs)
      val rBuf = rIter.map(_.copy()).filter { r =>
        !r.isNullAt(rkOrd) && !r.isNullAt(rtOrd)
      }.buffered
      val proj = UnsafeProjection.create(out, leftOut ++ rightOut)
      val nullRight = new GenericInternalRow(rightOut.size)
      val joined = new JoinedRow
      var cur: InternalRow = null // latest right row, always key == curKey
      var curKey: Any = null
      lIter.map { lrow =>
        if (lrow.isNullAt(lkOrd) || lrow.isNullAt(ltOrd)) {
          proj(joined(lrow, nullRight))
        } else {
          val lk = lrow.get(lkOrd, kType)
          val lt = lrow.get(ltOrd, tType)
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val h = rBuf.head
            val rk = h.get(rkOrd, kType)
            val c = keyOrd.compare(rk, lk)
            if (c < 0) { rBuf.next(); cur = null; curKey = null }
            else if (c == 0 && tsOrd.compare(h.get(rtOrd, tType), lt) <= 0) {
              cur = rBuf.next(); curKey = rk // later rows at equal ts win
            } else advancing = false
          }
          val matched = cur != null && curKey != null &&
            keyOrd.compare(curKey, lk) == 0
          proj(joined(lrow, if (matched) cur else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule restoring pushdown through the custom node: Catalyst
  * cannot see through an unknown LogicalPlan, so a Filter sitting on an
  * [[AsOfJoinNode]] would otherwise evaluate AFTER the keyed shuffle.
  * Conjuncts referencing only LEFT columns are semantics-preserving to
  * push (each left row's match depends only on the right side, never on
  * other left rows) and migrate below the node — from there the stock
  * rules carry them into the scan. RIGHT-side conjuncts are NOT pushed:
  * filtering the right side changes which row is "latest" and would
  * alter matches. Registered per session via the public
  * `spark.experimental.extraOptimizations` hook. */
object AsOfJoinPushdown extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions.And
  import org.apache.spark.sql.catalyst.plans.logical.Filter
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, j: AsOfJoinNode) =>
      val (push, keep) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic && p.references.subsetOf(j.left.outputSet))
      if (push.isEmpty) f
      else {
        val pushed = j.copy(left = Filter(push.reduce(And), j.left))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** Planner strategy for the graft logical nodes, attachable to a live
  * session through `spark.experimental.extraStrategies` (the public
  * hook) or a SparkSessionExtensions injection. */
object GraftStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, lts, rk, rts, pay) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lts, rk, rts, pay) :: Nil
    case _ => Nil
  }
}

object AsOfJoinPlan {

  /** Native-operator face of `operators/AsOfJoin.asOf` — same semantics
    * (latest right row with ts ≤ left ts per key, right payload renamed
    * per `rightCols`, null payload when nothing precedes), planned through
    * [[AsOfJoinNode]]/[[AsOfJoinExec]] instead of the union-sort window. */
  def asOfNative(left: DataFrame, right: DataFrame, key: String, ts: String,
                 rightCols: Map[String, String]): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(GraftStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GraftStrategy
    if (!spark.experimental.extraOptimizations.contains(AsOfJoinPushdown))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ AsOfJoinPushdown
    val aliases = rightCols.values.toSeq
    require(aliases.toSet.intersect(left.columns.toSet).isEmpty,
      "right payload aliases collide with left columns")
    val r2 = right.select(
      col(key) +: col(ts) +: rightCols.toSeq.map { case (c, a) => col(c).as(a) }: _*)
    val lPlan = left.queryExecution.analyzed
    val rPlan = r2.queryExecution.analyzed
    require(lPlan.outputSet.intersect(rPlan.outputSet).isEmpty,
      "left and right must be independent plans (re-read the right side)")
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column '$n'"))
    val lk = attr(lPlan, key); val lt = attr(lPlan, ts)
    val rk = attr(rPlan, key); val rt = attr(rPlan, ts)
    require(lk.dataType == rk.dataType && lt.dataType == rt.dataType,
      "key/ts dtypes must match across sides")
    val pay = aliases.map(a => attr(rPlan, a))
    org.apache.spark.sql.graft.Bridge.ofRows(spark,
      AsOfJoinNode(lPlan, rPlan, lk, lt, rk, rt, pay))
  }
}
