package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable frequency sketches — the bounded-memory tier next to the
  * exact two-phase aggregations (the same role HLL plays next to exact
  * COUNT DISTINCT, SURVEY §2.2).
  *
  * [[heavyHitters]] is the standard two-pass heavy-hitters pipeline:
  *
  *   1. a Misra-Gries summary (capacity k) runs once over the token
  *      stream as a typed `Aggregator` — O(k) state per partition,
  *      partial summaries merged with the count-offset rule (the
  *      mergeable-summaries construction of Agarwal et al., PODS'12,
  *      public) — producing a CANDIDATE set that provably contains every
  *      token with true count > N/(k+1);
  *   2. an exact rescoring pass semi-joins the corpus against the
  *      candidates and keeps those with exact count ≥ `minCount`.
  *
  * Because pass 1 can only over-admit (never miss, given k ≥ N/minCount),
  * the final output equals the exact `HAVING count ≥ m` answer — the
  * sketch buys the bounded memory, the rescore buys back exactness, and
  * the whole op hash-gates against a direct DuckDB GROUP BY. At 100 TB
  * the candidate set (≤ k rows) broadcasts; both passes are map-side
  * partials over the token explode.
  */
object SketchOps {

  /** Misra-Gries summary of a string stream: at most `k` counters. */
  private final class MisraGries(k: Int)
      extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    def zero: Map[String, Long] = Map.empty
    def reduce(b: Map[String, Long], tok: String): Map[String, Long] =
      if (b.contains(tok)) b.updated(tok, b(tok) + 1L)
      else if (b.size < k) b.updated(tok, 1L)
      else {
        // decrement-all: every counter pays one; zeros drop out. Amortized
        // O(1) per stream element (each decrement is funded by an insert).
        b.flatMap { case (t, c) => if (c > 1L) Some(t -> (c - 1L)) else None }
      }
    def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] = {
      val sum = b2.foldLeft(b1) { case (acc, (t, c)) =>
        acc.updated(t, acc.getOrElse(t, 0L) + c)
      }
      if (sum.size <= k) sum
      else {
        // subtract the (k+1)-th largest count from all, drop non-positive —
        // the mergeable-MG offset rule; error stays ≤ N/(k+1)
        val d = sum.valuesIterator.toSeq.sorted(Ordering[Long].reverse)(k)
        sum.flatMap { case (t, c) => if (c > d) Some(t -> (c - d)) else None }
      }
    }
    def finish(r: Map[String, Long]): Map[String, Long] = r
    def bufferEncoder: Encoder[Map[String, Long]] = Encoders.kryo[Map[String, Long]]
    def outputEncoder: Encoder[Map[String, Long]] = Encoders.kryo[Map[String, Long]]
  }

  /** Exact tokens whose corpus frequency is ≥ `minShare` of all token
    * occurrences (⌈minShare·N⌉), found through a capacity-`k` Misra-Gries
    * candidate pass. A SHARE threshold makes the capacity requirement
    * scale-free: MG undercounts by at most N/(k+1), so k+1 > 1/minShare
    * guarantees no miss at ANY corpus size — the same `k` that works at
    * sf0.01 works at 100 TB (an absolute count threshold would need k to
    * grow with the data; the r8 bench caught exactly that). The default
    * capacity is the smallest that satisfies the guarantee. */
  def heavyHitters(docs: DataFrame, minShare: Double, k0: Int = 0): DataFrame = {
    require(minShare > 0 && minShare < 1, s"minShare in (0,1), got $minShare")
    val k = if (k0 > 0) k0 else math.ceil(1.0 / minShare).toInt
    require(k + 1 > 1.0 / minShare,
      s"MG capacity $k cannot guarantee share $minShare (need k+1 > 1/share)")
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.selectExpr(s"explode(${TextOps.wordsExpr("text")}) as token")
      .filter("token <> ''")
    val n = toks.count()
    val minCount = math.ceil(minShare * n).toLong
    val summary = toks.as[String].select(new MisraGries(k).toColumn).head()
    val cands = summary.keys.toSeq.toDF("token")
    toks.join(broadcast(cands), Seq("token"), "left_semi")
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .orderBy("token")
  }
}
