package graft.ops

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (`embedding:
  * array<float>`): brute-force cosine top-k as the exact baseline, a
  * bounded-state top-k Aggregator as the scalable exact path, and an
  * IVF-bucketed variant as the approximate scale path.
  *
  * Determinism: cosine is computed as a sequential left-fold over the
  * array in double precision — IEEE addition in a fixed order, so the
  * result is bit-identical across engines that fold in array order
  * (DuckDB's `list_reduce` does). The fold runs in the native
  * [[graft.sql.expressions.ArrayDot]] kernel (one codegen'd JVM loop per
  * row) rather than the interpreted `aggregate(zip_with(..))` chain it
  * replaces — same fold order, so oracle hashes are unchanged. `sqrt` is
  * correctly-rounded per IEEE; no other transcendentals are used.
  */
object VectorOps {

  /** cosine(a, b) as a SQL fragment over two array<double> columns. */
  private def cosExpr(a: String, b: String, na: String, nb: String): String =
    s"array_dot($a, $b) / (sqrt($na) * sqrt($nb))"

  private def withNorm(e: DataFrame, id: String, v: String): DataFrame =
    e.selectExpr(s"vec_id as $id", s"transform(embedding, x -> cast(x as double)) as $v")
      .selectExpr(id, v, s"array_dot($v, $v) as norm_$v")

  /** Brute-force cosine top-k: queries (vec_id < `nQueries`) against the
    * whole corpus. The query side is broadcast, so the corpus streams —
    * one pass, no shuffle of the big side; the per-query sort is the
    * window. Exact, O(Q·N): the baseline every ANN variant is measured
    * against.
    */
  def cosineTopK(emb: DataFrame, k: Int = 5, nQueries: Int = 20): DataFrame = {
    val q = withNorm(emb.filter(col("vec_id") < nQueries), "qid", "qv")
    val c = withNorm(emb, "nid", "nv")
    val pairs = c.join(broadcast(q), expr("qid <> nid"))
      .selectExpr("qid", "nid", s"${cosExpr("qv", "nv", "norm_qv", "norm_nv")} as cosine")
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("nid"))
    pairs.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .selectExpr("qid", "cast(rank as bigint) as rank", "nid", "cosine")
      .orderBy("qid", "rank")
  }

  /** Bounded-state exact top-k per (cos, id) pair — the 100 TB path.
    *
    * The window variant above shuffles ALL Q·N scored pairs to sort them;
    * this Aggregator keeps only k pairs per query in its buffer, so
    * partial (map-side) aggregation reduces each partition to k rows per
    * query before the shuffle — shuffle volume is O(Q·k·partitions), not
    * O(Q·N). Same exact result, same oracle.
    */
  class TopKAgg(k: Int)(implicit enc: Encoder[Seq[(Double, Long)]])
      extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
    private val ord = Ordering.by[(Double, Long), (Double, Long)](t => (-t._1, t._2))
    def zero: Seq[(Double, Long)] = Seq.empty
    def reduce(b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] =
      (b :+ a).sorted(ord).take(k)
    def merge(b1: Seq[(Double, Long)], b2: Seq[(Double, Long)]): Seq[(Double, Long)] =
      (b1 ++ b2).sorted(ord).take(k)
    def finish(r: Seq[(Double, Long)]): Seq[(Double, Long)] = r.sorted(ord)
    def bufferEncoder: Encoder[Seq[(Double, Long)]] = enc
    def outputEncoder: Encoder[Seq[(Double, Long)]] = enc
  }

  def cosineTopKAgg(emb: DataFrame, k: Int = 5, nQueries: Int = 20): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val q = withNorm(emb.filter(col("vec_id") < nQueries), "qid", "qv")
    val c = withNorm(emb, "nid", "nv")
    val pairs = c.join(broadcast(q), expr("qid <> nid"))
      .selectExpr("qid", "nid", s"${cosExpr("qv", "nv", "norm_qv", "norm_nv")} as cosine")
    val topk = new TopKAgg(k)
    pairs.groupBy("qid")
      .agg(udaf(topk).apply(col("cosine"), col("nid")).as("top"))
      .selectExpr("qid", "posexplode(top) as (pos, t)")
      .selectExpr("qid", "cast(pos + 1 as bigint) as rank", "t._2 as nid", "t._1 as cosine")
      .orderBy("qid", "rank")
  }

  /** IVF-bucketed approximate top-k — the sub-linear scale path.
    *
    * Cells are the `nCells` lowest-vec_id vectors used as fixed centroids
    * (a k-means iteration would refine them; centroid choice is orthogonal
    * to the plumbing being exercised). Every corpus vector is assigned to
    * its nearest cell (one broadcast join, one pass); a query probes its
    * `nProbe` nearest cells and ranks only vectors in those cells —
    * scanning ~nProbe/nCells of the corpus instead of all of it.
    *
    * NOTE: fixture embeddings are uniform random — the hardest case for
    * any ANN structure (no cluster structure to exploit), so recall here
    * is ≈ the scanned fraction; on real clustered embeddings the same
    * plumbing concentrates recall. The recall-vs-scan tradeoff is
    * asserted in OpsSpec.
    */
  def cosineTopKIvf(emb: DataFrame, k: Int = 5, nQueries: Int = 20,
                    nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val cells = withNorm(emb.filter(col("vec_id") < nCells), "cell_id", "cv")
    val c = withNorm(emb, "nid", "nv")
    // assign: nearest cell per corpus vector
    val wa = Window.partitionBy("nid").orderBy(col("cell_cos").desc, col("cell_id"))
    val assigned = c.join(broadcast(cells))
      .selectExpr("nid", "nv", "norm_nv", "cell_id",
        s"${cosExpr("cv", "nv", "norm_cv", "norm_nv")} as cell_cos")
      .withColumn("arank", row_number().over(wa)).filter(col("arank") === 1)
      .select("cell_id", "nid", "nv", "norm_nv")
    // probe: nProbe nearest cells per query
    val q = withNorm(emb.filter(col("vec_id") < nQueries), "qid", "qv")
    val wp = Window.partitionBy("qid").orderBy(col("probe_cos").desc, col("cell_id"))
    val probes = q.join(broadcast(cells))
      .selectExpr("qid", "qv", "norm_qv", "cell_id",
        s"${cosExpr("cv", "qv", "norm_cv", "norm_qv")} as probe_cos")
      .withColumn("prank", row_number().over(wp)).filter(col("prank") <= nProbe)
      .select("qid", "qv", "norm_qv", "cell_id")
    // rank within probed cells only
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("nid"))
    assigned.join(broadcast(probes), Seq("cell_id"))
      .filter(expr("qid <> nid"))
      .selectExpr("qid", "nid", s"${cosExpr("qv", "nv", "norm_qv", "norm_nv")} as cosine")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .selectExpr("qid", "cast(rank as bigint) as rank", "nid", "cosine")
      .orderBy("qid", "rank")
  }

  /** Embedding-cosine near-duplicate pairs: all pairs with cosine ≥
    * `threshold`. Exact all-pairs — the oracle tier; at scale, generate
    * candidates first (IVF cells above, or random-hyperplane bands) and
    * verify with this cosine on candidates only.
    */
  def cosineNearDup(emb: DataFrame, threshold: Double = 0.45): DataFrame = {
    val a = withNorm(emb, "ida", "va")
    val b = withNorm(emb, "idb", "vb")
    a.join(b, expr("ida < idb"))
      .selectExpr("ida", "idb", s"${cosExpr("va", "vb", "norm_va", "norm_vb")} as cosine")
      .filter(col("cosine") >= threshold)
      .orderBy("ida", "idb")
  }
}
