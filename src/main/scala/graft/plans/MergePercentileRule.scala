package graft.plans

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, AggregateFunction, ApproximatePercentile, Complete, Percentile}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule merging multiple percentile aggregates over the same
  * value column into ONE shared buffer.
  *
  * `PERCENTILE_CONT(0.25) WITHIN GROUP (ORDER BY x)` next to
  * `PERCENTILE_CONT(0.75) WITHIN GROUP (ORDER BY x)` — the standard
  * column-profiling shape, which reaches this engine verbatim through
  * the reference's generic SQL pass-through surface
  * (`execute_sql.py:64,77` executes arbitrary user SQL; the percentile
  * shape is the usage pattern, not text in that file) — analyzes to two
  * independent
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
  * form would have built. [[ApproximatePercentile]] gets the identical
  * treatment (same child + same accuracy → one Greenwald-Khanna sketch
  * queried at every percentage instead of k duplicate sketches).
  *
  * Physical dedup rides the planner's own contract: every rewritten
  * occurrence references the SAME `AggregateExpression` object, and
  * `PhysicalAggregation` collects aggregate functions up to semantic
  * equality — one buffer in the physical plan (PlanSpec pins this).
  *
  * Eligibility is narrow and idempotent: exact [[Percentile]] or
  * [[ApproximatePercentile]] with a scalar DOUBLE literal percentage
  * (an array form is already merged — the rewrite output no-ops),
  * non-DISTINCT, unfiltered, and ≥2 distinct percentages sharing the
  * same (child, frequency/accuracy, reverse) up to canonicalization.
  * At 100 TB the win is a k-fold cut of the dominant shuffle: a
  * 5-point profile of a hot column ships one buffer set instead of
  * five.
  */
object MergePercentileRule extends Rule[LogicalPlan] {

  /** Merge key: the buffer identity. `kind` separates the exact
    * count-map buffer from the approx sketch; `aux` is the frequency
    * (exact) or accuracy (approx) expression; `reverse` is the exact
    * form's tie-break direction. */
  private case class Key(kind: String, child: Expression, aux: Expression,
                         reverse: Boolean)

  private def scalarPct(e: Expression): Option[Double] = e match {
    case Literal(d: Double, DoubleType) => Some(d)
    case _ => None
  }

  /** (merge key, percentage) when this aggregate is merge-eligible. */
  private def eligible(ae: AggregateExpression): Option[(Key, Double)] =
    if (ae.isDistinct || ae.filter.isDefined) None
    else ae.aggregateFunction match {
      case p: Percentile =>
        scalarPct(p.percentageExpression).map(d =>
          (Key("exact", p.child.canonicalized,
            p.frequencyExpression.canonicalized, p.reverse), d))
      case p: ApproximatePercentile =>
        scalarPct(p.percentageExpression).map(d =>
          (Key("approx", p.child.canonicalized,
            p.accuracyExpression.canonicalized, reverse = false), d))
      case _ => None
    }

  /** The array-percentage twin of `proto`, evaluating `ps` in order. */
  private def arrayForm(proto: AggregateFunction, ps: Seq[Double]): AggregateFunction = {
    val arr = CreateArray(ps.map(Literal(_, DoubleType)))
    proto match {
      case p: Percentile =>
        Percentile(p.child, arr, p.frequencyExpression, 0, 0, p.reverse)
      case p: ApproximatePercentile =>
        new ApproximatePercentile(p.child, arr, p.accuracyExpression)
      case other =>
        throw new IllegalStateException(s"not a percentile: $other")
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg: Aggregate =>
      // pass 1: group eligible scalar percentiles by buffer identity
      val pcts = mutable.LinkedHashMap[Key, mutable.LinkedHashSet[Double]]()
      val first = mutable.LinkedHashMap[Key, AggregateFunction]()
      agg.aggregateExpressions.foreach(_.foreach {
        case ae: AggregateExpression =>
          eligible(ae).foreach { case (k, d) =>
            pcts.getOrElseUpdate(k, mutable.LinkedHashSet.empty) += d
            first.getOrElseUpdate(k, ae.aggregateFunction)
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
            k -> (AggregateExpression(arrayForm(first(k), list), Complete,
              isDistinct = false, filter = None,
              resultId = NamedExpression.newExprId), list)
          }.toMap
        // eligible() runs ONCE per occurrence: the match binds its result
        // and returns the node unchanged when the key wasn't merged
        // (ADVICE r17 — the guard+get form evaluated it twice)
        val rewritten = agg.aggregateExpressions.map(_.transform {
          case ae: AggregateExpression =>
            eligible(ae).flatMap { case (k, d) =>
              merged.get(k).map { case (m, list) =>
                GetArrayItem(m, Literal(list.indexOf(d))): Expression
              }
            }.getOrElse(ae)
        }.asInstanceOf[NamedExpression])
        agg.copy(aggregateExpressions = rewritten)
      }
  }
}
