package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule planning a plain SQL range join —
  * `A JOIN B ON a.v BETWEEN b.lo AND b.hi` — as the bucketed EQUI join of
  * [[graft.ops.RangeJoinOps]], so pass-through SQL (the reference's whole
  * query surface, `execute_sql.py:64,77`) gets the rescue automatically:
  * without it Spark plans a BroadcastNestedLoopJoin (or a cartesian when
  * both sides are big) — O(|A|·|B|) at 100 TB.
  *
  * Same contract as Databricks' RANGE_JOIN hint (public docs): the user
  * supplies the bin width, here via `spark.graft.rangeJoin.bucketWidth`
  * (a positive long in VALUE UNITS — days for DATE, seconds for
  * TIMESTAMP, the value itself for integrals; unset/0 disables the rule).
  * Width ≈ the typical interval length: build rows replicate to
  * (len/width + 1) buckets, probe rows land in exactly one, so every
  * qualifying pair meets exactly once and the original condition stays as
  * the residual filter — bit-identical results, different join shape.
  *
  * Eligibility is deliberately narrow: INNER join, no usable equi
  * conjunct (if one exists SMJ/SHJ already works), one side bounded below
  * AND above by expressions from the other side, orderable integral /
  * date / timestamp domains, deterministic expressions. Inverted or NULL
  * intervals generate no buckets (matching BETWEEN's inner-join
  * semantics). The rewrite introduces an equi conjunct, which makes the
  * output ineligible — no self-recursion.
  */
case class RangeJoinRule(spark: org.apache.spark.sql.SparkSession)
    extends Rule[LogicalPlan] {

  private def width: Long =
    spark.conf.getOption("spark.graft.rangeJoin.bucketWidth")
      .flatMap(s => scala.util.Try(s.toLong).toOption).getOrElse(0L)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w = width
    if (w <= 0) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        extract(j, cond, left, right) match {
          case Some((v, lo, hi, probeIsLeft)) =>
            rewrite(j, v, lo, hi, probeIsLeft, w, hint)
          case None => j
        }
    }
  }

  /** Monotone map of the supported domains onto LONG bucket units. */
  private def units(e: Expression): Option[Expression] = e.dataType match {
    case ByteType | ShortType | IntegerType | LongType => Some(Cast(e, LongType))
    case DateType => Some(Cast(UnixDate(e), LongType))
    case TimestampType => Some(UnixSeconds(e)) // truncation: monotone
    case TimestampNTZType => // NTZ→TZ cast is session-zone shift: monotone
      // time-zone-aware Cast must carry its zone explicitly — the analyzer
      // that normally fills it in has already run
      Some(UnixSeconds(Cast(e, TimestampType,
        Some(spark.sessionState.conf.sessionLocalTimeZone))))
    case _ => None
  }

  /** Find `lo <= v <= hi` with v from one side and lo/hi from the other;
    * bail out when an equi conjunct already links the sides. */
  private def extract(j: Join, cond: Expression, left: LogicalPlan,
                      right: LogicalPlan)
      : Option[(Expression, Expression, Expression, Boolean)] = {
    val conjuncts = splitConjunctivePredicates(cond)
    val leftSet = left.outputSet
    val rightSet = right.outputSet
    def fromLeft(e: Expression) = e.references.subsetOf(leftSet) && e.references.nonEmpty
    def fromRight(e: Expression) = e.references.subsetOf(rightSet) && e.references.nonEmpty
    def opposite(a: Expression, b: Expression) =
      (fromLeft(a) && fromRight(b)) || (fromRight(a) && fromLeft(b))
    if (conjuncts.exists { case EqualTo(a, b) => opposite(a, b); case _ => false })
      return None

    // bounds keyed by the value expression (canonicalized)
    val lower = scala.collection.mutable.Map[Expression, (Expression, Expression)]()
    val upper = scala.collection.mutable.Map[Expression, (Expression, Expression)]()
    // each inequality bounds BOTH its operands (a >= b lower-bounds a and
    // upper-bounds b); record both readings and look for an expression
    // bounded on both sides
    conjuncts.foreach {
      case GreaterThanOrEqual(a, b) if opposite(a, b) =>
        lower.getOrElseUpdate(a.canonicalized, (a, b))
        upper.getOrElseUpdate(b.canonicalized, (b, a))
      case LessThanOrEqual(a, b) if opposite(a, b) =>
        upper.getOrElseUpdate(a.canonicalized, (a, b))
        lower.getOrElseUpdate(b.canonicalized, (b, a))
      case _ =>
    }
    lower.keys.find(upper.contains).flatMap { key =>
      val (v, lo) = lower(key)
      val (_, hi) = upper(key)
      val probeIsLeft = fromLeft(v)
      // lo and hi must come from the same (build) side
      val sameBuildSide = if (probeIsLeft) fromRight(lo) && fromRight(hi)
                          else fromLeft(lo) && fromLeft(hi)
      if (sameBuildSide && v.deterministic && lo.deterministic && hi.deterministic &&
          units(v).isDefined && units(lo).isDefined && units(hi).isDefined)
        Some((v, lo, hi, probeIsLeft))
      else None
    }
  }

  private def splitConjunctivePredicates(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjunctivePredicates(a) ++ splitConjunctivePredicates(b)
    case other => Seq(other)
  }

  /** Exact floor division on long units (negative-safe). */
  private def floorDiv(u: Expression, w: Long): Expression =
    IntegralDivide(Subtract(u, Pmod(u, Literal(w))), Literal(w))

  private def rewrite(j: Join, v: Expression, lo: Expression, hi: Expression,
                      probeIsLeft: Boolean, w: Long,
                      hint: JoinHint): LogicalPlan = {
    val (probe, build) = if (probeIsLeft) (j.left, j.right) else (j.right, j.left)
    // probe: one bucket per row
    val pBkt = Alias(floorDiv(units(v).get, w), "__graft_bkt_p")()
    val probeProj = Project(probe.output :+ pBkt, probe)
    // build: explode every covered bucket; inverted/NULL intervals emit none
    val uLo = units(lo).get
    val uHi = units(hi).get
    val guarded = Filter(LessThanOrEqual(uLo, uHi), build)
    val bBktAttr = AttributeReference("__graft_bkt_b", LongType)()
    val gen = Generate(
      // Sequence is TimeZoneAwareExpression (date sequences) — it is only
      // `resolved` with a zone, even for a pure LONG sequence
      Explode(Sequence(floorDiv(uLo, w), floorDiv(uHi, w), Some(Literal(1L)),
        Some(spark.sessionState.conf.sessionLocalTimeZone))),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(bBktAttr), child = guarded)
    val (newLeft, newRight) =
      if (probeIsLeft) (probeProj, gen) else (gen, probeProj)
    val newCond = And(EqualTo(pBkt.toAttribute, bBktAttr), j.condition.get)
    Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), hint))
  }
}
