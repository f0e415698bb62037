package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Percentile}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule merging multiple exact-percentile aggregates over the
  * same value column into ONE array-percentage buffer.
  *
  * `PERCENTILE_CONT(0.25) WITHIN GROUP (ORDER BY x)` next to
  * `PERCENTILE_CONT(0.75) WITHIN GROUP (ORDER BY x)` — the shape every
  * profiling query in the reference's pass-through surface takes
  * (`execute_sql.py:64,77`) — analyzes to two independent
  * [[Percentile]] aggregates, and Spark's ObjectHashAggregate then
  * builds the (value → count) OpenHashMap buffer once PER AGGREGATE:
  * the whole column is buffered, shuffled, and merged k times for k
  * requested percentages. Spark's own `Percentile` already supports an
  * array percentage evaluating every requested fraction over one shared
  * buffer (`Percentile.getPercentiles` walks the sorted counts once), so
  * the k-buffer plan is pure waste — this rule rewrites each scalar
  * occurrence to `GetArrayItem` over one shared array-percentage
  * aggregate. Values are bit-identical: the merged aggregate runs the
  * SAME `getPercentile` interpolation over the SAME buffer the scalar
  * form would have built.
  *
  * Physical dedup rides the planner's own contract: every rewritten
  * occurrence references the SAME `AggregateExpression` object, and
  * `PhysicalAggregation` collects aggregate functions up to semantic
  * equality — one buffer in the physical plan (PlanSpec pins this).
  *
  * Eligibility is narrow and idempotent: exact [[Percentile]] only
  * (approx sketches merge nothing), scalar DOUBLE literal percentage
  * (an array form is already merged — the rewrite output no-ops),
  * non-DISTINCT, unfiltered, and ≥2 distinct percentages sharing the
  * same (child, frequency, reverse) up to canonicalization. At 100 TB
  * the win is a k-fold cut of the dominant shuffle: a 5-point profile
  * of a hot column ships one buffer set instead of five.
  */
object MergePercentileRule extends Rule[LogicalPlan] {

  /** Merge key: the buffer identity — same child values, same
    * frequencies, same tie-break direction. */
  private case class Key(child: Expression, freq: Expression, reverse: Boolean)

  private def keyOf(p: Percentile): Key =
    Key(p.child.canonicalized, p.frequencyExpression.canonicalized, p.reverse)

  /** The scalar percentage, when this aggregate is merge-eligible. */
  private def scalarPct(p: Percentile): Option[Double] =
    p.percentageExpression match {
      case Literal(d: Double, DoubleType) => Some(d)
      case _ => None
    }

  private def eligible(ae: AggregateExpression): Option[(Percentile, Double)] =
    ae.aggregateFunction match {
      case p: Percentile if !ae.isDistinct && ae.filter.isEmpty =>
        scalarPct(p).map(p -> _)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg: Aggregate =>
      // pass 1: group eligible scalar percentiles by buffer identity
      val pcts = mutable.LinkedHashMap[Key, mutable.LinkedHashSet[Double]]()
      val first = mutable.LinkedHashMap[Key, Percentile]()
      agg.aggregateExpressions.foreach(_.foreach {
        case ae: AggregateExpression =>
          eligible(ae).foreach { case (p, d) =>
            val k = keyOf(p)
            pcts.getOrElseUpdate(k, mutable.LinkedHashSet.empty) += d
            first.getOrElseUpdate(k, p)
          }
        case _ =>
      })
      val mergeable = pcts.filter(_._2.size >= 2)
      if (mergeable.isEmpty) agg
      else {
        // one shared array-percentage AggregateExpression per key; every
        // occurrence below references the SAME object so the planner's
        // semantic dedup collapses them to one physical buffer
        val merged: Map[Key, (AggregateExpression, Seq[Double])] =
          mergeable.map { case (k, ps) =>
            val list = ps.toSeq
            val proto = first(k)
            val arr = CreateArray(list.map(Literal(_, DoubleType)))
            val fn = Percentile(proto.child, arr, proto.frequencyExpression,
              0, 0, proto.reverse)
            k -> (AggregateExpression(fn, Complete,
              isDistinct = false, filter = None,
              resultId = NamedExpression.newExprId), list)
          }.toMap
        val rewritten = agg.aggregateExpressions.map(_.transform {
          case ae: AggregateExpression if eligible(ae).exists(e =>
              merged.contains(keyOf(e._1))) =>
            val (p, d) = eligible(ae).get
            val (m, list) = merged(keyOf(p))
            GetArrayItem(m, Literal(list.indexOf(d)))
        }.asInstanceOf[NamedExpression])
        agg.copy(aggregateExpressions = rewritten)
      }
  }
}
