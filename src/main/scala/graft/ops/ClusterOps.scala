package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact, deterministic Lloyd k-means over the `embeddings` table — the
  * corpus-clustering primitive of a training-data pipeline (semantic
  * curation / SemDeDup-style pruning / IVF coarse quantizers all start
  * from "assign every vector to a centroid"). The reference reaches
  * clustering only as SQL shipped to the warehouse (`execute_sql.py:64,77`);
  * here it is a first-class distributed operator.
  *
  * Unlike [[VectorOps.cosineTopKIvf]]'s cosine refinement (whose per-row
  * `avg` is addition-order-dependent and therefore engine-specific), this
  * op is EXACT cross-engine — every step is either integer arithmetic or
  * a fixed-order IEEE double computation, so the full assignment
  * hash-matches an independent DuckDB implementation:
  *
  *   - vectors quantize to integers: `⌊double(x) · 2²⁰⌋` (float→double is
  *     exact widening, the product and floor are identical IEEE ops);
  *   - centroid means are exact BIGINT sums divided once in double —
  *     addition over rows is integer, hence order-independent;
  *   - distances are squared L2 decomposed as `x·x − 2·x·m + m·m`, each
  *     dot a fixed-order left fold (the native `array_dot` kernel; DuckDB
  *     `list_reduce` folds the same way), ties broken by centroid id.
  *
  * Scale shape: centroids live in ONE collect_list row broadcast to every
  * task — assignment is a map-only stage (no shuffle, no driver round-trip
  * for the data path). The update is a (cluster, dim)-keyed sum of
  * BIGINTs, partial-aggregated map-side, so each iteration's only exchange
  * carries ≤ k·dim pre-combined rows per partition. Empty clusters keep
  * their previous centroid (left-join fallback). Iterations are a driver
  * loop over PLANS (k·dim state), never over data — the same sync
  * structure as Spark MLlib's KMeans.
  */
object ClusterOps {

  private val SCALE = "1048576.0" // 2^20: quantization step ≈ 1e-6 per unit

  /** (vec_id, cluster) after `iters` Lloyd update rounds from a
    * deterministic seed (the `k` lowest-vec_id vectors), distances against
    * the final centroids.
    *
    * `pruned` switches the per-row argmin from the dense form (an O(k·dim)
    * transform + array_min) to a norm-bound fold: centroids whose
    * lower bound `(‖x‖ − ‖m‖)² > best-so-far` are skipped WITHOUT
    * computing the O(dim) dot product — the Cauchy-Schwarz bound
    * `(‖x‖−‖m‖)² ≤ ‖x−m‖²`, checked in O(1) against the pre-broadcast
    * centroid norms. The prune is STRICT (>), so a skipped centroid is
    * strictly worse than the incumbent, ties included — the pruned argmin
    * equals the dense one exactly (OpsSpec pins equality), it just visits
    * fewer dot products. This is the swap the SemDeDup k contract calls
    * for once k reaches ~10⁴ and dim is embedding-sized: the bound check
    * is dim-free, so sorted-by-norm packing gives most rows a handful of
    * full distance evaluations instead of k. */
  def kmeansAssign(emb: DataFrame, k: Int = 8, iters: Int = 2,
                   pruned: Boolean = false): DataFrame = {
    require(k > 0 && iters >= 0, s"need k > 0, iters >= 0; got k=$k iters=$iters")
    // quantized integer vector + its exact double image (reused everywhere)
    val q = emb.selectExpr("vec_id",
        s"transform(embedding, x -> cast(floor(cast(x as double) * $SCALE) as bigint)) as xq")
      .selectExpr("vec_id", "xq", "transform(xq, v -> cast(v as double)) as xd")
      .selectExpr("vec_id", "xq", "xd", "array_dot(xd, xd) as xx")
      .selectExpr("vec_id", "xq", "xd", "xx", "sqrt(xx) as sx")

    // seed: the k lowest vec_ids, cid = 0..k-1 in vec_id order
    val seed = q.orderBy("vec_id").limit(k)
      .selectExpr("vec_id", "xd as m")
      .withColumn("cid", row_number()
        .over(org.apache.spark.sql.expressions.Window.orderBy(col("vec_id")))
        .cast("long") - 1)
      .select("cid", "m")

    // one row holding all centroids, sorted by cid — the broadcast unit
    // (norms and their roots ride along so the pruned bound check is O(1))
    def pack(cells: DataFrame): DataFrame =
      cells.selectExpr(
          "struct(cid, m, array_dot(m, m) as mm, sqrt(array_dot(m, m)) as sm) as c")
        .agg(expr("array_sort(collect_list(c))").as("cs"))

    // map-only nearest-centroid assignment: in-row argmin over the packed
    // array; struct min = (min dist, then min cid) — the tie-break DuckDB's
    // ROW_NUMBER(ORDER BY dist, cid) applies
    val argmin =
      if (pruned)
        """aggregate(cs,
          |  struct(cast('Infinity' as double) as dist, cast(-1 as bigint) as cid),
          |  (acc, cl) -> case
          |    when (sx - cl.sm) * (sx - cl.sm) > acc.dist then acc
          |    else least(acc,
          |      struct(xx - 2 * array_dot(xd, cl.m) + cl.mm as dist,
          |             cl.cid as cid)) end)""".stripMargin
      else
        """array_min(transform(cs, cl ->
          |  struct(xx - 2 * array_dot(xd, cl.m) + cl.mm as dist,
          |         cl.cid as cid)))""".stripMargin
    def assign(packed: DataFrame): DataFrame =
      q.crossJoin(broadcast(packed))
        .withColumn("best", expr(argmin))
        .selectExpr("vec_id", "xq", "best.cid as cluster")

    var cells = seed
    for (_ <- 0 until iters) {
      // exact integer sums per (cluster, dim); one double division at the end
      val means = assign(pack(cells))
        .selectExpr("cluster as cid", "posexplode(xq) as (pos, v)")
        .groupBy("cid", "pos")
        .agg(sum("v").as("s"), count(lit(1)).as("n"))
        .groupBy("cid")
        .agg(expr("transform(array_sort(collect_list(struct(pos, s, n))), " +
          "t -> cast(t.s as double) / t.n)").as("m"))
      cells = cells.as("old").join(means.as("new"), Seq("cid"), "left")
        .selectExpr("cid", "coalesce(new.m, old.m) as m")
    }
    assign(pack(cells))
      .selectExpr("vec_id", "cluster")
      .orderBy("vec_id")
  }

  /** [[kmeansAssign]] plus a deterministic secondary split of oversized
    * clusters: a cluster of n rows is divided into `⌈n/maxClusterSize⌉`
    * sub-buckets by `vec_id % nsplits` (exact integer arithmetic in both
    * engines, so the split itself hash-gates cross-engine). This is what
    * makes the within-cluster pair join scale-safe: per join key the pair
    * work is bounded by maxClusterSize², so total pair work is
    * ≤ N·maxClusterSize regardless of how skewed the clustering comes out
    * — without it one runaway cluster re-creates the O(N²) shuffle the
    * clustering was supposed to kill. Cluster sizes are a tiny (≤ k rows)
    * aggregate broadcast back onto the assignment, so the split adds no
    * data-sized shuffle. Pairs that straddle two sub-buckets of the same
    * cluster are not compared — the same recall-for-boundedness trade
    * SemDeDup already makes at the cluster boundary, now with a hard
    * per-key ceiling.
    */
  def cappedAssign(emb: DataFrame, k: Int, iters: Int,
                   maxClusterSize: Long): DataFrame = {
    val assigned = kmeansAssign(emb, k, iters)
    if (maxClusterSize <= 0L || maxClusterSize == Long.MaxValue)
      assigned.withColumn("sub", lit(0L))
    else {
      val sizes = assigned.groupBy("cluster").agg(count(lit(1)).as("cn"))
      assigned.join(broadcast(sizes), Seq("cluster"))
        .withColumn("sub",
          expr(s"vec_id % ((cn + ${maxClusterSize - 1}) div $maxClusterSize)"))
        .select("vec_id", "cluster", "sub")
    }
  }

  /** Semantic near-duplicate pairs (the SemDeDup recipe, Abbas et al.
    * 2023, public): cluster the corpus with [[kmeansAssign]], then compare
    * cosine similarity ONLY within each cluster — the pair space shrinks
    * from O(N²) to Σ|cluster|², which is the entire point at 100 TB (the
    * exact all-pairs tier is op_dedup_embedding; this is its sub-quadratic
    * semantic sibling). Cosine runs over the same quantized-exact vectors
    * the clustering used, with the fixed-order array_dot fold, so every
    * pair AND its cosine hash-gate cross-engine.
    *
    * ==The k contract==
    * SemDeDup's economics REQUIRE k to grow with the corpus: Σ|cluster|²
    * ≈ N²/k only beats N² when k ≈ N/targetClusterSize (the paper runs
    * tens of thousands of clusters over billions of docs). A constant k
    * is a scale-killer twice over — the pair space stays quadratic AND
    * the pair join shuffles the whole corpus onto k distinct keys. Use
    * [[semanticPairsAuto]] (k derived from a corpus count) unless you
    * have a principled k, and leave `maxClusterSize` finite so one
    * runaway cluster can't blow past the budget: the [[cappedAssign]]
    * split bounds per-key pair work at maxClusterSize² no matter what
    * the clustering does. Assignment itself is O(k·dim) per row against
    * the broadcast centroid array in the dense form; past k ≈ 10⁴ pass
    * `pruned = true` to [[kmeansAssign]] — the strict norm-bound fold
    * skips the O(dim) dot product for centroids the O(1) Cauchy-Schwarz
    * bound already rules out, with provably identical output
    * (op_embed_kmeans_pruned gates it against the dense oracle).
    */
  def semanticPairs(emb: DataFrame, k: Int = 8, iters: Int = 2,
                    threshold: Double = 0.95,
                    maxClusterSize: Long = Long.MaxValue): DataFrame = {
    val assigned = cappedAssign(emb, k, iters, maxClusterSize)
    val q = emb.selectExpr("vec_id",
        s"transform(embedding, x -> cast(floor(cast(x as double) * $SCALE) as bigint)) as xq")
      .selectExpr("vec_id", "transform(xq, v -> cast(v as double)) as xd")
      .selectExpr("vec_id", "xd", "array_dot(xd, xd) as nn")
      .join(assigned, Seq("vec_id"))
    val a = q.selectExpr("cluster", "sub", "vec_id as va", "xd as xa", "nn as na")
    val b = q.selectExpr("cluster", "sub", "vec_id as vb", "xd as xb", "nn as nb")
    a.join(b, Seq("cluster", "sub"))
      .filter(col("va") < col("vb"))
      .selectExpr("cluster", "va", "vb",
        "array_dot(xa, xb) / (sqrt(na) * sqrt(nb)) as cosine")
      .filter(col("cosine") >= threshold)
      .orderBy("va", "vb")
  }

  /** [[semanticPairs]] with k derived from the corpus size —
    * `k = ⌈N / targetClusterSize⌉` — so the expected cluster size (and
    * with it the pair-join key cardinality N/targetClusterSize) stays
    * constant as the corpus grows; this is the scale-safe entry point
    * per the k contract above. Costs one `count()` over the input (a
    * metadata-cheap scan), which is the honest price of sizing k to the
    * data. The default cap of 4× the target keeps moderately oversized
    * clusters intact while still hard-bounding per-key pair work.
    */
  def semanticPairsAuto(emb: DataFrame, targetClusterSize: Int = 1024,
                        iters: Int = 2, threshold: Double = 0.95,
                        maxClusterSize: Long = 0L): DataFrame = {
    require(targetClusterSize > 0, s"need targetClusterSize > 0; got $targetClusterSize")
    val n = emb.count()
    val k = math.max(1L, (n + targetClusterSize - 1) / targetClusterSize)
    require(k <= Int.MaxValue, s"derived k=$k overflows")
    val cap = if (maxClusterSize > 0L) maxClusterSize else 4L * targetClusterSize
    semanticPairs(emb, k.toInt, iters, threshold, cap)
  }
}
