package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Alias, And, Ascending, Attribute, Expression, GenericInternalRow,
  JoinedRow, PredicateHelper, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{
  BinaryNode, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graft.PlanBridge
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Native as-of join — the whole-operator custom-plan path (SURVEY §2.12
  * ladder step (c)): a first-class Catalyst operator instead of the
  * union+window encoding used by q_join_asof.
  *
  * For each probe row, the single build row with the same key and the
  * greatest build time ≤ probe time (ties on build time broken by the
  * trailing tie-break sort columns — the LAST row in (time, tieBreak...)
  * order wins, matching the union+window form's `last(...)` semantics).
  * Probe rows with no qualifying build row keep nulls: left-join shape.
  *
  * Why a custom operator beats the union+window encoding at scale:
  *  - the window form shuffles probe+build UNIONED (one wide schema, both
  *    corpora through one exchange) and then buffers each key partition
  *    through a WindowExec carrying every probe AND build row; the native
  *    form shuffles each side in its own (narrow) schema and the merge is
  *    a pure streaming zip — O(1) state (one retained build row), no
  *    window buffer, no post-filter to drop the build-side rows.
  *  - EnsureRequirements co-partitions and co-sorts both sides exactly
  *    like a SortMergeJoin, so the operator composes with AQE, reuses
  *    exchanges, and never degrades to a range cross join.
  *
  * The four pieces, smallest-possible but complete:
  *  - [[AsOfJoinPlan]]    — logical node (output, references, dedup-safe)
  *  - [[PushFilterThroughAsOfJoin]] — optimizer `Rule[LogicalPlan]`:
  *    probe-only predicates migrate below the operator (then
  *    FileSourceStrategy carries them into the parquet scan), so a filter
  *    written AFTER the as-of join still prunes BEFORE the shuffle
  *  - [[AsOfJoinStrategy]] — `SparkStrategy` lowering logical → physical
  *  - [[AsOfJoinExec]]    — physical partition-sorted streaming merge
  *
  * Registered at runtime via `spark.experimental` (public API) by
  * [[AsOf.register]]; `GraftExtensions` installs the same pieces for the
  * builder/config path.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    rightTieBreak: Seq[Expression],
    forward: Boolean = false)
  extends BinaryNode {

  // probe columns keep their nullability; every build column is nullable
  // in the output (unmatched probe rows emit nulls)
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Probe-side predicate pushdown through the as-of join: conjuncts that
  * reference only probe columns move below the operator. Build-side
  * predicates must NOT move — dropping a build row can change which row
  * is "latest" for probe rows that still match, so only the probe side is
  * safe (same reasoning as left-outer join pushdown). */
object PushFilterThroughAsOfJoin extends Rule[LogicalPlan]
    with PredicateHelper {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, j: AsOfJoinPlan) =>
      val (push, keep) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic &&
          p.references.subsetOf(j.left.outputSet))
      if (push.isEmpty) f
      else {
        val pushed = j.copy(left = Filter(push.reduce(And), j.left))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tb, fwd) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tb,
        fwd) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    rightTieBreak: Seq[Expression],
    forward: Boolean)
  extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // co-partition both sides on the key, SMJ-style. The pinned partition
  // count keeps the two exchanges aligned under AQE (coalescing must not
  // pick different counts per side — zipPartitions needs equal counts).
  override def requiredChildDistribution: Seq[Distribution] = Seq(
    ClusteredDistribution(Seq(leftKey),
      requiredNumPartitions = Some(conf.numShufflePartitions)),
    ClusteredDistribution(Seq(rightKey),
      requiredNumPartitions = Some(conf.numShufflePartitions)))

  // probe: (key, time); build: (key, time, tieBreak...) so "last consumed
  // match" == greatest (time, tieBreak) ≤ probe time
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(sortAsc(leftKey), sortAsc(leftTime)),
    (Seq(sortAsc(rightKey), sortAsc(rightTime)) ++
      rightTieBreak.map(sortAsc)))

  private def sortAsc(e: Expression): SortOrder =
    SortOrder(e, Ascending, Ascending.defaultNullOrdering, Seq.empty)

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(sortAsc(leftKey), sortAsc(leftTime))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  /** Fixed-width types whose internal representation reads as a long —
    * the no-allocation merge fast path (covers the id/timestamp keys an
    * as-of join is actually built on). */
  private def longGetter(dt: org.apache.spark.sql.types.DataType)
      : Option[(InternalRow, Int) => Long] = {
    import org.apache.spark.sql.types._
    dt match {
      case LongType | TimestampType | TimestampNTZType =>
        Some((r, i) => r.getLong(i))
      case IntegerType | DateType => Some((r, i) => r.getInt(i).toLong)
      case ShortType => Some((r, i) => r.getShort(i).toLong)
      case ByteType => Some((r, i) => r.getByte(i).toLong)
      case _ => None
    }
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val keyGet = longGetter(leftKey.dataType)
    val timeGet = longGetter(leftTime.dataType)
    val keyDt = leftKey.dataType
    val timeDt = leftTime.dataType
    val allOut = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // codegen'd (key, time) extraction — ONE projection per row; the
      // first cut interpreted-eval'ed the pending right head once per
      // probe-row comparison, which made the merge the bottleneck
      val lProj = UnsafeProjection.create(Seq(leftKey, leftTime), lOut)
      val rProj = UnsafeProjection.create(Seq(rightKey, rightTime), rOut)
      val project = UnsafeProjection.create(allOut, allOut)
      val nullRight = new GenericInternalRow(rOut.length)
      val joined = new JoinedRow

      if (keyGet.isDefined && timeGet.isDefined) {
        // primitive path: key/time ride in local longs — zero allocation
        // per comparison, one row copy per retained build row
        val kG = keyGet.get
        val tG = timeGet.get
        var pendRow: InternalRow = null // right head, not yet consumed
        var pendKey = 0L
        var pendTime = 0L
        // null semantics (upstream as-of EqualTo): a null key or time
        // NEVER matches — null build rows are discarded here (otherwise
        // getLong reads the null slot as 0 and falsely matches key 0),
        // and null probe rows emit null-extended below. Nulls sort FIRST
        // under the default ascending order, so skipping them before the
        // merge keeps the key/time monotonicity the zip relies on.
        def loadPend(): Boolean = {
          while (pendRow == null && rIter.hasNext) {
            pendRow = rIter.next()
            val kt = rProj(pendRow)
            if (kt.isNullAt(0) || kt.isNullAt(1)) pendRow = null
            else { pendKey = kG(kt, 0); pendTime = tG(kt, 1) }
          }
          pendRow != null
        }
        if (forward) {
          // forward: the match is the FIRST unconsumed build row with
          // time ≥ probe time — i.e. the pending head itself (ties on
          // time resolve to the min tie-break, which sorts first). Rows
          // strictly before the probe time can never match a later
          // (ascending) probe, so they are discarded; nothing is retained.
          lIter.map { l =>
            val lkt = lProj(l)
            if (lkt.isNullAt(0) || lkt.isNullAt(1)) {
              project(joined(l, nullRight))
            } else {
              val lk = kG(lkt, 0)
              val lt = tG(lkt, 1)
              var advance = true
              while (advance && loadPend()) {
                if (pendKey < lk || (pendKey == lk && pendTime < lt))
                  pendRow = null
                else advance = false
              }
              val matched = pendRow != null && pendKey == lk
              project(joined(l, if (matched) pendRow else nullRight))
            }
          }
        } else {
          var matchRow: InternalRow = null
          var matchKey = 0L
          lIter.map { l =>
            val lkt = lProj(l)
            if (lkt.isNullAt(0) || lkt.isNullAt(1)) {
              project(joined(l, nullRight))
            } else {
              val lk = kG(lkt, 0)
              val lt = tG(lkt, 1)
              var advance = true
              while (advance && loadPend()) {
                if (pendKey < lk || (pendKey == lk && pendTime <= lt)) {
                  if (pendKey == lk) { matchRow = pendRow.copy(); matchKey = lk }
                  else matchRow = null
                  pendRow = null
                } else advance = false
              }
              val matched = matchRow != null && matchKey == lk
              project(joined(l, if (matched) matchRow else nullRight))
            }
          }
        }
      } else {
        // generic path: boxed values + interpreted orderings; the 2-col
        // extraction rows are copied because retained values (pending
        // head, current match key) must outlive the projection buffer
        var pendRow: InternalRow = null
        var pendKey: Any = null
        var pendTime: Any = null
        // same null semantics as the primitive path: null key/time build
        // rows are dropped (the interpreted orderings NPE on boxed nulls
        // for atomic types), null probe rows emit null-extended below
        def loadPend(): Boolean = {
          while (pendRow == null && rIter.hasNext) {
            pendRow = rIter.next()
            val kt = rProj(pendRow)
            if (kt.isNullAt(0) || kt.isNullAt(1)) pendRow = null
            else {
              val copied = kt.copy()
              pendKey = copied.get(0, keyDt)
              pendTime = copied.get(1, timeDt)
            }
          }
          pendRow != null
        }
        if (forward) {
          lIter.map { l =>
            val lkt = lProj(l).copy()
            if (lkt.isNullAt(0) || lkt.isNullAt(1)) {
              project(joined(l, nullRight))
            } else {
              val lk = lkt.get(0, keyDt)
              val lt = lkt.get(1, timeDt)
              var advance = true
              while (advance && loadPend()) {
                val c = keyOrd.compare(pendKey, lk)
                if (c < 0 || (c == 0 && timeOrd.compare(pendTime, lt) < 0))
                  pendRow = null
                else advance = false
              }
              val matched = pendRow != null &&
                keyOrd.compare(pendKey, lk) == 0
              project(joined(l, if (matched) pendRow else nullRight))
            }
          }
        } else {
          var matchRow: InternalRow = null
          var matchKey: Any = null
          lIter.map { l =>
            val lkt = lProj(l).copy()
            if (lkt.isNullAt(0) || lkt.isNullAt(1)) {
              project(joined(l, nullRight))
            } else {
              val lk = lkt.get(0, keyDt)
              val lt = lkt.get(1, timeDt)
              var advance = true
              while (advance && loadPend()) {
                val c = keyOrd.compare(pendKey, lk)
                if (c < 0 || (c == 0 && timeOrd.compare(pendTime, lt) <= 0)) {
                  if (c == 0) { matchRow = pendRow.copy(); matchKey = pendKey }
                  else matchRow = null
                  pendRow = null
                } else advance = false
              }
              val matched = matchRow != null &&
                keyOrd.compare(matchKey, lk) == 0
              project(joined(l, if (matched) matchRow else nullRight))
            }
          }
        }
      }
    }
  }
}

/** Public surface of the native as-of join. */
object AsOf {
  /** Idempotently install the strategy + optimizer rule into a session
    * via the public `experimental` hooks (the imperative twin of the
    * `GraftExtensions` builder path). */
  def register(s: SparkSession): Unit = {
    if (!s.experimental.extraStrategies.contains(AsOfJoinStrategy))
      s.experimental.extraStrategies =
        s.experimental.extraStrategies :+ AsOfJoinStrategy
    if (!s.experimental.extraOptimizations
        .contains(PushFilterThroughAsOfJoin))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ PushFilterThroughAsOfJoin
  }

  /** probe ⟕asof build: per probe row, the build row with equal `key`
    * and — backward (default) — the greatest `buildTime` ≤ `probeTime`
    * (build-time ties broken by `tieBreak`, LAST wins), or — forward —
    * the smallest `buildTime` ≥ `probeTime` (ties: FIRST/min tie-break).
    * Output = probe columns ++ build columns (nullable); callers
    * pre-rename so the names are disjoint. */
  def asof(probe: DataFrame, build: DataFrame, probeKey: String,
      buildKey: String, probeTime: String, buildTime: String,
      tieBreak: Seq[String] = Nil, forward: Boolean = false): DataFrame = {
    val spark = probe.sparkSession
    register(spark)
    val lPlan = probe.queryExecution.analyzed
    // self-join safety: probe and build usually derive from the same
    // table, so the build side's attribute ids collide with the probe's
    // — re-alias every build column through fresh exprIds (the analyzer
    // dedups built-in Joins this way; a custom node does it itself)
    val rPlan = Project(
      build.queryExecution.analyzed.output.map(a => Alias(a, a.name)()),
      build.queryExecution.analyzed)
    // resolve with the session's configured case sensitivity (like the
    // analyzer would), and refuse ambiguity instead of silently binding
    // to the first of several same-named attributes
    val resolver = spark.sessionState.analyzer.resolver
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.filter(a => resolver(a.name, n)) match {
        case Seq(a) => a
        case Seq() => throw new IllegalArgumentException(
          s"column $n not in [${p.output.map(_.name).mkString(", ")}]")
        case many => throw new IllegalArgumentException(
          s"column $n is ambiguous: ${many.size} attributes match " +
            s"(${many.map(a => s"${a.name}#${a.exprId.id}").mkString(", ")})")
      }
    PlanBridge.ofRows(spark, AsOfJoinPlan(
      lPlan, rPlan,
      attr(lPlan, probeKey), attr(rPlan, buildKey),
      attr(lPlan, probeTime), attr(rPlan, buildTime),
      tieBreak.map(attr(rPlan, _)), forward))
  }
}
