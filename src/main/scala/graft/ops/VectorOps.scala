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

  /** RADIUS (range) similarity search: every corpus vector within
    * cosine ≥ `minCos` of each query — the fixed-threshold complement
    * to top-k (dedup and retrieval pipelines ask "everything closer
    * than τ", not "the 5 closest", when the answer size is unknown).
    * Map-only after the query broadcast: the corpus streams once, the
    * threshold filter runs inside the scan projection, and NO per-query
    * sort or window exists at all — at 100 TB this is strictly cheaper
    * than top-k (top-k pays a rank stage; radius pays nothing). Same
    * codegen `array_dot` kernel and sqrt·sqrt/divide cosine tree as
    * the top-k family, so every emitted pair hash-gates. */
  def cosineRadius(emb: DataFrame, minCos: Double = 0.4,
                   nQueries: Int = 20): DataFrame = {
    val q = withNorm(emb.filter(col("vec_id") < nQueries), "qid", "qv")
    val c = withNorm(emb, "nid", "nv")
    c.join(broadcast(q), expr("qid <> nid"))
      .selectExpr("qid", "nid", s"${cosExpr("qv", "nv", "norm_qv", "norm_nv")} as cosine")
      .filter(col("cosine") >= minCos)
      .orderBy("qid", "nid")
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
    // INVARIANT: the buffer is always ord-sorted with ≤ k entries, so the
    // common case once it fills — a candidate no better than the current
    // worst — is ONE comparison and zero allocation. Only the ~k·ln(n)
    // expected improvements per group pay the sort. (The naive
    // sort-every-row form measured 32 s on a 10⁸-pair margin-alignment
    // decade; the selection itself is arrival-order-independent — top-k
    // under a TOTAL order — so results are bit-identical.)
    def reduce(b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] =
      if (b.length >= k && ord.lteq(b.last, a)) b
      else (b :+ a).sorted(ord).take(k)
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

  /** k-NN label classification (Fix & Hodges 1951; Cover & Hart 1967 —
    * public): each query vector takes the MAJORITY label of its k
    * nearest corpus neighbors by cosine — the label-propagation /
    * weak-supervision primitive over the embedding table's `label`
    * column. The vote is all-integer (counts per label among exactly
    * the k deterministic neighbors, ties to the SMALLEST label — the
    * argmax-tie recipe), so predictions hash-gate; the true label rides
    * along so the gated output shows accuracy in-row.
    *
    * Scale shape: the neighbor set is [[cosineTopK]]'s (query broadcast,
    * corpus streams, per-query rank window); the vote adds one
    * (qid, label)-keyed count and one qid-keyed argmax — both
    * query-cardinality-bounded. Swap in [[cosineTopKAgg]]'s bounded
    * aggregator for the 100 TB path — identical neighbors, same vote. */
  def knnClassify(emb: DataFrame, k: Int = 5, nQueries: Int = 20): DataFrame = {
    val labels = emb.selectExpr("vec_id as nid", "cast(label as bigint) as nlabel")
    val votes = cosineTopK(emb, k, nQueries)
      .join(labels, Seq("nid"))
      .groupBy("qid", "nlabel").agg(count(lit(1)).as("cnt"))
      .groupBy("qid")
      .agg(expr("max(struct(cnt, -nlabel as nl))").as("b"),
        sum("cnt").as("kk"))
      .selectExpr("qid", "-b.nl as predicted", "b.cnt as votes", "kk as k_used")
    val truth = emb.selectExpr("vec_id as qid", "cast(label as bigint) as true_label")
    votes.join(truth, Seq("qid"))
      .selectExpr("qid", "predicted", "votes", "k_used", "true_label",
        "cast(predicted = true_label as int) as is_correct")
      .orderBy("qid")
  }

  /** Margin-based corpus alignment — the bitext-mining primitive
    * (Artetxe & Schwenk, ACL 2019 "Margin-based Parallel Corpus Mining";
    * the CCMatrix/LASER pipeline shape — public): two corpora of
    * embeddings, and every source vector is matched to the target vector
    * with the best MARGIN score
    *
    *   margin(x, y) = cos(x, y) / ((avgₖ(x→B) + avgₖ(y→A)) / 2)
    *
    * — cosine normalized by the mean of the two directional top-k
    * neighborhood averages, which suppresses hubs (vectors close to
    * everything) that raw cosine ranks first. Output: one row per source
    * vector above `threshold` — (a_id, b_id, cosine, margin, mutual),
    * `mutual` = 1 when the pair is ALSO the target side's best (the
    * highest-precision tier real mining pipelines ship).
    *
    * Sides are a deterministic parity split of `emb` (even vec_id =
    * source A, odd = target B) — the fixture's stand-in for two
    * languages/snapshots.
    *
    * Determinism (the hash-gate contract): cosine is the [[ArrayDot]]
    * sequential fold; each directional average folds the top-k cosines
    * in (cos DESC, id ASC) order — the order [[TopKAgg]]'s finish
    * emits and the oracle's `list(... ORDER BY ...)` reproduces — and
    * the margin is one fixed division tree. Best-pair selection is a
    * lexicographic struct max (margin, then smallest id) — the
    * argmax-tie recipe, comparisons only.
    *
    * Scale shape: this is the EXACT O(|A|·|B|) scoring tier (guarded at
    * `maxSide` per side, the op_dedup_embedding pattern) — with BOUNDED
    * state: the pair stream is a codegen cross join (query side
    * broadcast, the other streams — the cosineTopK shape), both
    * directional top-k passes run through [[TopKAgg]] (map-side partial
    * top-k, shuffle O(ids·k), never a window over the pair set), the
    * scored pass joins two id-cardinality-bounded average tables (AQE
    * broadcasts them), and the best-pair picks are plain hash
    * aggregations (lexicographic struct max). The pair stream is
    * recomputed per pass — four codegen'd streams, nothing pair-sized
    * ever held at ANY tier, the property that matters at 100 TB.
    * Measured floors (r17, local[32]): 2.5 s at 1k×1k, 11.6 s at
    * 10k×10k, 103 s at 30k×30k — the 3×-data growth equals the 9×
    * pair volume, the declared asymptote. Rejected alternatives, all
    * measured at the 10k×10k decade: caching the raw or scored pair
    * rows (slower, and OOM-prone at 30k on a default-heap driver), an
    * in-row broadcast-array fold (the assignCells shape — 2× slower:
    * interpreted per-element lambdas over 10⁴-element arrays lose to
    * codegen cross joins; that shape wins only for few-element arrays
    * like centroid tables), and a GROUPING SETS dual argmax (the
    * Expand doubles the stream). At production scale, use
    * [[marginAlignAnn]]: sign-LSH candidate mining + the same scoring
    * over candidate neighborhoods.
    *
    * Contract note (ADVICE r17): zero-norm embeddings are OUT OF CONTRACT
    * — a vector of all zeros makes cosine 0/0 and can drive both
    * directional averages to exactly 0, where Spark's non-ANSI division
    * yields NULL (row silently dropped by the threshold filter) while an
    * IEEE engine yields inf/NaN (row kept). The fixture generator never
    * emits zero vectors; callers feeding real corpora should pre-filter
    * `array_dot(v, v) > 0`.
    */
  def marginAlign(emb: DataFrame, k: Int = 4, threshold: Double = 1.0,
                  maxSide: Long = 1L << 15): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    val a = withNorm(emb.filter(col("vec_id") % 2 === 0), "a_id", "av")
    val b = withNorm(emb.filter(col("vec_id") % 2 === 1), "b_id", "bv")
    val (na, nb) = (a.count(), b.count())
    require(na > 0 && nb > 0, "marginAlign needs both sides non-empty")
    require(na <= maxSide && nb <= maxSide,
      s"marginAlign is the exact O(|A|·|B|) scoring tier (sides $na × $nb, " +
        s"cap $maxSide): use marginAlignAnn (sign-LSH candidate mining + " +
        "the same margin scoring over candidate neighborhoods — the " +
        "CCMatrix/LASER production shape) at this scale")
    val spark = emb.sparkSession
    // the streaming side arrives in a handful of parquet splits — at
    // 10k×10k that caps every O(|A|·|B|) pass at file-count parallelism
    // on a 32-thread box and makes each scored cache partition too fat
    // to unroll (the 30k×30k OOM). Repartitioning the |A|-row side to
    // the shuffle-partition count costs one tiny exchange and sizes
    // both correctly.
    val aPart = a.repartition(spark.sessionState.conf.numShufflePartitions)
    // recomputed per consumer ON PURPOSE: caching the |A|·|B| RAW pair
    // rows was measured SLOWER (29 vs 23 s at the 10k×10k decade) than
    // re-running the codegen'd cross-join dot products
    def pairs = aPart.crossJoin(broadcast(b)).selectExpr("a_id", "b_id",
      s"${cosExpr("av", "bv", "norm_av", "norm_bv")} as cosine")
    marginScore(spark, () => pairs, k, threshold)
  }

  /** Shared margin-scoring tail of [[marginAlign]] (exact tier) and
    * [[marginAlignAnn]] (ANN-candidate tier): directional top-k averages
    * over the pair stream, the margin division tree, (margin DESC, id ASC)
    * argmax per side, and the mutual-best flag. `pairStream` is a THUNK
    * re-invoked per consumer: the exact tier passes its recomputed codegen
    * cross join (nothing pair-sized is ever held), the ANN tier passes an
    * already-checkpointed linear-sized candidate table (the thunk returns
    * the same reference).
    */
  private def marginScore(spark: org.apache.spark.sql.SparkSession,
                          pairStream: () => DataFrame,
                          k: Int, threshold: Double): DataFrame = {
    import spark.implicits._
    val topk = new TopKAgg(k)
    // directional top-k averages, folded in TopKAgg's (cos DESC, id ASC)
    // finish order — the exact order the oracle's `list(... ORDER BY
    // ...)` + `list_reduce` reproduces
    // the per-id average tables are localCheckpoint()ed (ONE row per id,
    // no vectors — a few hundred KB): each is read by both scored
    // recomputes below, and unlike persist() the checkpoint blocks are
    // released by the ContextCleaner when the returned plan is dropped —
    // no reliance on a harness-side clearCache() between queries
    // (ADVICE r17; the pageRank / ClusterOps idiom). The trade (ADVICE
    // r18): localCheckpoint TRUNCATES lineage, so checkpoint blocks lost
    // with an executor are NOT recomputable — the query fails and
    // reliability is delegated to job-level retry. Acceptable here
    // because the tables are tiny (replicated block loss is rare and a
    // retry recomputes seconds of work); a multi-hour pipeline stage
    // should prefer reliable checkpoint() to survive executor loss.
    def sideAvg(idCol: String, otherId: String) = pairStream()
      .groupBy(idCol)
      .agg(udaf(topk).apply(col("cosine"), col(otherId)).as("top"))
      .selectExpr(idCol,
        s"""aggregate(transform(top, t -> t._1), cast(0 as double),
           |  (x, y) -> x + y) / size(top) as avg_$idCol""".stripMargin)
      .localCheckpoint()
    // the SCORED pair stream is deliberately never materialized: the
    // two argmax consumers each re-stream the pair source with the tiny
    // cached averages broadcast on. Caching |A|·|B| rows was measured
    // slower at the 10k×10k decade and OOM-prone at 30k×30k on a
    // default-heap driver — nothing pair-sized is ever held, at ANY
    // scale, which is the property that matters at 100 TB.
    val avgA = sideAvg("a_id", "b_id")
    val avgB = sideAvg("b_id", "a_id")
    def scored = pairStream().join(avgA, "a_id").join(avgB, "b_id")
      .selectExpr("a_id", "b_id", "cosine",
        "cosine / ((avg_a_id + avg_b_id) / cast(2 as double)) as margin")
    // (margin DESC, id ASC) argmax via lexicographic struct max — the
    // argmax-tie recipe; cosine rides along with the winning pair
    val bestA = scored.groupBy("a_id")
      .agg(expr("max(named_struct('m', margin, 'nb', -b_id, 'c', cosine))").as("s"))
      .selectExpr("a_id", "-s.nb as b_id", "s.c as cosine", "s.m as margin")
    val bestB = scored.groupBy("b_id")
      .agg(expr("max(named_struct('m', margin, 'na', -a_id))").as("s"))
      .selectExpr("b_id as mb_id", "-s.na as ma_id")
    bestA
      .join(bestB,
        bestA("b_id") === bestB("mb_id") && bestA("a_id") === bestB("ma_id"),
        "left")
      .selectExpr("a_id", "b_id", "cosine", "margin",
        "cast(ma_id is not null as int) as mutual")
      .filter(col("margin") >= threshold)
      .orderBy("a_id")
  }

  /** ANN-candidate margin alignment — the production tier the exact
    * [[marginAlign]] guard points at (VERDICT r17 #1; the CCMatrix/LASER
    * mine-then-score shape): sign-LSH band collisions replace the
    * O(|A|·|B|) cross join, and [[marginScore]]'s directional averages are
    * taken over each vector's CANDIDATE top-k neighborhood — exactly how
    * production bitext miners compute the margin denominator once the
    * corpus is too big to score exhaustively.
    *
    *   1. ONE signature pass over the whole corpus (`rhp_signature`
    *      codegen kernel, deterministic md5 hyperplanes), exploded to
    *      (id, band_key) — the [[rhpCandidates]] projection;
    *   2. candidates = even ids (source A) equi-joined to odd ids
    *      (target B) on band_key, DISTINCT — linear in N by the
    *      [[adaptiveBanding]] background bound, never a cross join;
    *   3. exact cosine on candidates only (the shared [[ArrayDot]]
    *      sequential fold), checkpointed ONCE — the candidate table is
    *      linear-sized, so materializing it is safe at every scale
    *      (unlike the exact tier's quadratic stream, which must never
    *      be held);
    *   4. [[marginScore]]: top-k averages, margin, dual argmax, mutual.
    *
    * Semantics note: margins are computed over candidate neighborhoods,
    * so they NUMERICALLY differ from the exact tier's full-corpus
    * neighborhoods (higher denominators — LSH collisions bias toward
    * high-cosine neighbors); pair RECOVERY on planted near-duplicates
    * agrees with the exact tier (OpsSpec). A source vector with zero
    * band collisions emits nothing — the declared ANN contract.
    *
    * Determinism (the hash-gate contract): candidate membership is exact
    * band-bit equality over deterministic signatures, so the DuckDB
    * oracle re-derives the SAME candidate set from COUNT(*)
    * ([[adaptiveBanding]] re-derivation, the dkLshOracle precedent), and
    * every downstream double runs the shared fixed-order folds.
    */
  def marginAlignAnn(emb: DataFrame, k: Int = 4, threshold: Double = 1.0,
                     bands: Int = 0, rowsPerBand: Int = 0,
                     dim: Int = 64): DataFrame = {
    require(k >= 1, s"need k >= 1, got $k")
    require(bands >= 0 && rowsPerBand >= 0 &&
        ((bands == 0) == (rowsPerBand == 0)),
      s"pass bands and rowsPerBand together as positive values (or neither, " +
        s"for N-adaptive banding); got bands=$bands, rowsPerBand=$rowsPerBand")
    val (b, r) =
      if (bands > 0) (bands, rowsPerBand) else adaptiveBanding(emb.count())
    // one signature pass for BOTH sides, checkpointed: the band-key
    // projection feeds the two sides of the candidate join. Both
    // localCheckpoints here carry the marginScore durability trade
    // (ADVICE r18, documented there): lineage is truncated, so an
    // executor loss fails the query for job-level retry instead of
    // recomputing — chosen because both tables are candidate-sized
    // (linear), never pair-sized.
    val keys = bandKeyed(emb, b, r, dim).localCheckpoint()
    val cand = keys.filter(col("id") % 2 === 0).as("a")
      .join(keys.filter(col("id") % 2 === 1).as("b"), expr("a.band_key = b.band_key"))
      .selectExpr("a.id as a_id", "b.id as b_id")
      .distinct()
    scoreAnnCandidates(cand, emb, k, threshold)
  }

  /** The scoring tail shared by [[marginAlignAnn]] (batch-mined
    * candidates) and the streaming miner
    * ([[graft.streaming.StreamingOps.marginAlignCandidatesStream]], whose
    * mined pair table is scored READ-SIDE through exactly this path):
    * exact cosines on the candidate (a_id, b_id) set joined against the
    * corpus halves, then [[marginScore]]. Identical candidates in →
    * identical alignment out, whichever engine mined them. */
  private[graft] def scoreAnnCandidates(cand: DataFrame, emb: DataFrame,
                                        k: Int, threshold: Double): DataFrame = {
    val spark = emb.sparkSession
    val aSide = withNorm(emb.filter(col("vec_id") % 2 === 0), "a_id", "av")
    val bSide = withNorm(emb.filter(col("vec_id") % 2 === 1), "b_id", "bv")
    // exact cosines on candidates only — linear-sized, so ONE
    // materialization feeds all four marginScore consumers
    val cpairs = cand
      .join(aSide, Seq("a_id")).join(bSide, Seq("b_id"))
      .selectExpr("a_id", "b_id",
        s"${cosExpr("av", "bv", "norm_av", "norm_bv")} as cosine")
      .localCheckpoint()
    marginScore(spark, () => cpairs, k, threshold)
  }

  /** The centroid table collapsed to ONE row holding an array of
    * (cell_id, cv, norm_cv) structs, sorted by cell_id — tiny (nCells ≤
    * hundreds), broadcast everywhere an assignment or probe needs it.
    */
  private def cellArray(cells: DataFrame): DataFrame =
    cells.agg(expr("array_sort(collect_list(struct(cell_id, cv, norm_cv)))").as("cells"))

  /** Nearest-centroid assignment with ZERO shuffle: each corpus vector
    * computes its own argmax with one in-row fold —
    * `array_max(transform(cells, ...))` over `struct(cosine, -cell_id)`,
    * which keeps the (max cosine, then min cell_id) tie-break — instead of
    * exploding N×nCells rows through a window Exchange. At 100× corpus this
    * is a map-only stage; the old `row_number` window shuffled 100× the
    * rows (the round-3 op_sim_topk_ivf regression).
    */
  private def assignCells(c: DataFrame, cellsArr: DataFrame): DataFrame =
    c.crossJoin(broadcast(cellsArr))
      .withColumn("best", expr(
        """array_max(transform(cells, cl -> struct(
          |  array_dot(cl.cv, nv) / (sqrt(cl.norm_cv) * sqrt(norm_nv)) as bc,
          |  -cl.cell_id as nbid)))""".stripMargin))
      .selectExpr("-best.nbid as cell_id", "nid", "nv", "norm_nv")

  /** Lloyd k-means refinement of IVF centroids: assign every vector to its
    * nearest (cosine) centroid ([[assignCells]], map-only), recompute each
    * centroid as the element-wise mean of its members — a (cell, dimension)
    * keyed average, partial-aggregated map-side, so the only exchange per
    * iteration carries ≤ nCells·dim pre-combined rows per partition.
    * Nothing driver-side; empty cells keep their previous centroid (left
    * join fallback).
    */
  private def refineCells(c: DataFrame, cells0: DataFrame, iters: Int): DataFrame = {
    var cells = cells0
    for (_ <- 0 until iters) {
      val means = assignCells(c, cellArray(cells))
        .selectExpr("cell_id", "posexplode(nv) as (pos, x)")
        .groupBy("cell_id", "pos").agg(avg(col("x")).as("m"))
        .groupBy("cell_id")
        .agg(expr("transform(array_sort(collect_list(struct(pos, m))), s -> s.m)").as("mv"))
      cells = cells.as("old")
        .join(means.as("new"), Seq("cell_id"), "left")
        .selectExpr("cell_id", "coalesce(mv, cv) as cv")
        .selectExpr("cell_id", "cv", "array_dot(cv, cv) as norm_cv")
    }
    cells
  }

  /** IVF-bucketed approximate top-k — the sub-linear scale path.
    *
    * Centroids seed from the `nCells` lowest-vec_id vectors and are
    * refined with `kmeansIters` Lloyd iterations ([[refineCells]]). Every
    * corpus vector is assigned to its nearest cell (one broadcast join,
    * one pass); a query probes its `nProbe` nearest cells and ranks only
    * vectors in those cells — scanning ~nProbe/nCells of the corpus
    * instead of all of it.
    *
    * NOTE: fixture embeddings are uniform random — the hardest case for
    * any ANN structure (no cluster structure to exploit), so recall here
    * is ≈ the scanned fraction; on real clustered embeddings the same
    * plumbing concentrates recall. The recall-vs-scan tradeoff is
    * asserted in OpsSpec.
    */
  def cosineTopKIvf(emb: DataFrame, k: Int = 5, nQueries: Int = 20,
                    nCells: Int = 16, nProbe: Int = 4,
                    kmeansIters: Int = 2): DataFrame = {
    val c = withNorm(emb, "nid", "nv")
    val cells = refineCells(c,
      withNorm(emb.filter(col("vec_id") < nCells), "cell_id", "cv"), kmeansIters)
    // ONE-row centroid array, read by the assign and probe branches:
    // localCheckpoint (not persist) so the blocks self-release via the
    // ContextCleaner when the returned plan is dropped — no reliance on
    // a harness clearCache() between queries (VERDICT r18 #3; the
    // marginScore idiom, same lost-executor/job-retry trade)
    val arr = cellArray(cells).localCheckpoint()
    // assign: nearest cell per corpus vector — map-only in-row argmax
    val assigned = assignCells(c, arr).select("cell_id", "nid", "nv", "norm_nv")
    // probe: nProbe nearest cells per query — same in-row fold, top-nProbe
    // slice of the descending (cosine, -cell_id) sort, then explode
    val q = withNorm(emb.filter(col("vec_id") < nQueries), "qid", "qv")
    val probes = q.crossJoin(broadcast(arr))
      .withColumn("pcells", expr(
        s"""slice(reverse(array_sort(transform(cells, cl -> struct(
           |  array_dot(cl.cv, qv) / (sqrt(cl.norm_cv) * sqrt(norm_qv)) as pc,
           |  -cl.cell_id as nbid)))), 1, $nProbe)""".stripMargin))
      .selectExpr("qid", "qv", "norm_qv", "explode(pcells) as p")
      .selectExpr("qid", "qv", "norm_qv", "-p.nbid as cell_id")
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

  /** Persist an IVF index for repeated probing — the "index once, probe
    * many" structure [[cosineTopKIvf]] rebuilds inline. Two tables:
    * `<name>_cells` (the refined centroids, tiny) and `<name>_data` (the
    * corpus with its nearest-cell assignment), PARTITIONED BY cell_id via
    * [[graft.io.TableIO.writePartitioned]] — so a probe's `cell_id IN
    * (probed cells)` filter prunes whole directories and each query batch
    * READS only ~nProbe/nCells of the corpus from disk. That is the actual
    * IVF promise at 100 TB: sub-linear I/O per probe, not just sub-linear
    * compute after a full scan.
    */
  def buildIvfIndex(emb: DataFrame, name: String, nCells: Int = 16,
                    kmeansIters: Int = 2): Unit = {
    val c = withNorm(emb, "nid", "nv")
    val cells = refineCells(c,
      withNorm(emb.filter(col("vec_id") < nCells), "cell_id", "cv"), kmeansIters)
    cells.write.mode("overwrite").saveAsTable(s"${name}_cells")
    val arr = cellArray(emb.sparkSession.table(s"${name}_cells"))
    graft.io.TableIO.writePartitioned(
      assignCells(c, arr).select("cell_id", "nid", "nv", "norm_nv"),
      s"${name}_data", "cell_id")
  }

  /** Probe a [[buildIvfIndex]] index: top-k neighbors of each query vector
    * (vec_id < nQueries of `queries`) scanning only the probed cells'
    * partitions. Same ranking semantics (and same tie-breaks) as
    * [[cosineTopKIvf]] — OpsSpec asserts bit-identical output; PlanSpec
    * pins the partition-pruned scan.
    */
  def probeIvf(queries: DataFrame, name: String, k: Int = 5,
               nQueries: Int = 20, nProbe: Int = 4): DataFrame = {
    val spark = queries.sparkSession
    val arr = cellArray(spark.table(s"${name}_cells"))
    val q = withNorm(queries.filter(col("vec_id") < nQueries), "qid", "qv")
    val probes = q.crossJoin(broadcast(arr))
      .withColumn("pcells", expr(
        s"""slice(reverse(array_sort(transform(cells, cl -> struct(
           |  array_dot(cl.cv, qv) / (sqrt(cl.norm_cv) * sqrt(norm_qv)) as pc,
           |  -cl.cell_id as nbid)))), 1, $nProbe)""".stripMargin))
      .selectExpr("qid", "qv", "norm_qv", "explode(pcells) as p")
      .selectExpr("qid", "qv", "norm_qv", "-p.nbid as cell_id")
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("nid"))
    spark.table(s"${name}_data")
      .join(broadcast(probes), Seq("cell_id"))
      .filter(expr("qid <> nid"))
      .selectExpr("qid", "nid", s"${cosExpr("qv", "nv", "norm_qv", "norm_nv")} as cosine")
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .selectExpr("qid", "cast(rank as bigint) as rank", "nid", "cosine")
      .orderBy("qid", "rank")
  }

  /** Embedding-cosine near-duplicate pairs: all pairs with cosine ≥
    * `threshold`. Exact all-pairs — the oracle tier; at scale, use
    * [[cosineNearDupLsh]] (random-hyperplane candidates + this cosine as
    * the verifier on candidates only).
    *
    * GUARDED (VERDICT r14 #4): N²/2 dot products is the declared gating
    * tier, not a production path — above `maxExactRows` input rows
    * (default 2¹⁸; the r14 sf1 checkpoint measured 13.9× growth on 10×
    * data at 10⁵ rows) the call RAISES and points at the LSH twin instead
    * of silently attempting quadratic work (the [[graft.ops.DedupOps]]
    * `driverMaxPairs` loud-fallback pattern). The guard costs one
    * metadata-cheap count over the input.
    */
  def cosineNearDup(emb: DataFrame, threshold: Double = 0.45,
                    maxExactRows: Long = 1L << 18): DataFrame = {
    val n = emb.count()
    require(n <= maxExactRows,
      s"cosineNearDup is the EXACT all-pairs gating tier (N²/2 dot products): " +
        s"input has $n rows > maxExactRows=$maxExactRows. At this scale use " +
        s"cosineNearDupLsh (sign-LSH candidates + exact verify — the 100 TB " +
        s"path), or raise maxExactRows explicitly if quadratic work is intended.")
    val a = withNorm(emb, "ida", "va")
    val b = withNorm(emb, "idb", "vb")
    a.join(b, expr("ida < idb"))
      .selectExpr("ida", "idb", s"${cosExpr("va", "vb", "norm_va", "norm_vb")} as cosine")
      .filter(col("cosine") >= threshold)
      .orderBy("ida", "idb")
  }

  /** Int8-range quantization of embeddings — the storage-footprint op of
    * an embedding pipeline: per-vector affine map x → round(255·(x−min)/
    * (max−min)) yields codes in [0, 255], a 4× reduction vs float32
    * before parquet's dictionary/byte-packing shrinks it further. Pure
    * map-only projection (no shuffle); constant vectors (max = min)
    * quantize to all-zero codes. Reconstruction error per component is
    * ≤ step/2 by construction — asserted in OpsSpec, and the code values
    * themselves are integer-exact cross-engine (gated op_embed_quantize).
    */
  def quantizeEmbeddings(emb: DataFrame): DataFrame =
    emb.selectExpr("vec_id",
        "quantize_i8(transform(embedding, x -> cast(x as double))) as q")
      .selectExpr("vec_id", "q.qmin as qmin", "q.qstep as qstep", "q.qv as qv")

  /** Inverse of [[quantizeEmbeddings]]: x' = qmin + code·qstep. */
  def dequantizeEmbeddings(q: DataFrame): DataFrame =
    q.selectExpr("vec_id", "transform(qv, b -> qmin + b * qstep) as embedding")

  /** Deterministic pseudo-random hyperplanes for sign-LSH: component c of
    * plane p is md5-derived (same portable-hash discipline as
    * [[TextOps.h60]]), uniform on [-1, 1] — no RNG, no seed plumbing, so
    * signatures are reproducible across runs and engines.
    *
    * This is the REFERENCE derivation: the hot path runs the memoized
    * kernel copy ([[graft.sql.expressions.ArrayKernels.rhpPlanes]], used by
    * the `rhp_signature` codegen expression), and KernelSpec pins the two
    * tables equal so the kernel can never drift from the documented rule.
    */
  private[graft] def hyperplanes(nPlanes: Int, dim: Int): Seq[Seq[Double]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until nPlanes).map { p =>
      (0 until dim).map { c =>
        val hex = md.digest(s"$p:$c".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.substring(0, 15)
        ((java.lang.Long.parseLong(hex, 16) % 2001L) - 1000L) / 1000.0
      }
    }
  }

  /** Background-bounded banding (the r16 sf3 lesson). With FIXED (b, r)
    * the expected background bucket is N/2^r, so the candidate join
    * carries O(b·N²/2^(r+1)) pairs — quadratic in N at any fixed r. The
    * sf3 sweep measured the consequence: 60k uniform-random vectors at
    * the legacy (16, 8) put ~10⁸ array-carrying candidates through the
    * verify join (57 GB of sort spill, ~13 min/run, vs 5 s at sf1 —
    * the quadratic term crossing the linear ones). Scale-safe banding
    * instead keeps two invariants as N grows:
    *
    *   r(N) = max(8, ceil(log₂(N / 32)))  — expected background bucket
    *          stays ≤ 32, so candidates are O(b·16·N): linear;
    *   b(r) = min b with (1 − p₉₀^r)^b ≤ 0.005, p₉₀ = 1 − acos(0.9)/π
    *          ≈ 0.856 — the miss probability at the design-point dup
    *          similarity (cos 0.9) stays ≤ 0.5% as r deepens.
    *
    * At every gate/spec scale (N ≤ 8192 — sf0.01's 200 and sf0.1's 2000
    * vectors) this derives EXACTLY the legacy (16, 8), so the unrolled
    * deterministic-hyperplane oracle (OpQueries.dkLshOracle) and every
    * pinned recall assertion are unchanged; the deeper codes engage only
    * at the scales the fixed ones break (sf1 → (23, 10), sf3 → (27, 11)).
    */
  private[graft] def adaptiveBanding(n: Long): (Int, Int) = {
    // r = max(8, ceil(log2(n / 32))) computed INTEGER-exactly (smallest r
    // with n ≤ 32·2^r) rather than via double log division: at n = 32·2^k
    // exactly, log(n/32)/log(2) lands 1 ulp either side of k and the ceil
    // flips — and the DuckDB oracle (ADVICE r16) re-derives r with ITS
    // libm, so the two engines could disagree at exactly those boundary
    // sizes. The integer form is the same value everywhere else and is
    // reproducible in plain SQL (a bounded range scan) with no
    // floating-point step at all.
    var r = 8
    while (r < 57 && n > (32L << r)) r += 1 // 32·2^57 = 2^62: no Long overflow
    // b is the smallest band count with design-point miss ≤ 0.5%:
    // (1 − p₉₀^r)^b ≤ 0.005. Transcendental, so the oracle's libm may
    // differ from the JVM's by ulps — but the ceil argument sits ≥ 0.01
    // from an integer for every r in [8, 62] (floor at r = 19: 98.0101;
    // pinned in OpsSpec by a boundary-margin sweep), while a few-ulp
    // input disagreement moves it by ≲ 1e-12 — eleven orders of
    // magnitude of headroom, so cross-engine ceil can never flip b.
    val p90 = 1.0 - math.acos(0.9) / math.Pi
    val b = math.ceil(math.log(0.005) /
      math.log(1.0 - math.pow(p90, r))).toInt
    (b, r)
  }

  /** Random-hyperplane candidate pairs: ids whose sign signatures agree on
    * at least one band of `rowsPerBand` consecutive hyperplane signs.
    * One equi-join on the band key — no cartesian; the (id, band_key)
    * projection is persisted so the `bands·rowsPerBand` dot products per
    * vector run once, not once per self-join side.
    */
  /** The (id, band_key) sign-LSH projection shared by [[rhpCandidates]]
    * (self-join near-dup candidates) and [[marginAlignAnn]] (cross-side
    * candidates). The signature is one codegen'd kernel call
    * (`rhp_signature`): the plane table lives as a memoized JVM reference
    * inside the kernel, NOT as inline `array(array(…))` literals — the
    * former literal form put bands·rowsPerBand·dim doubles into one
    * expression string, which at adaptive depth for N≈10⁹ rows is
    * (254, 25)·64 ≈ 406 k literals, past any codegen budget (ADVICE r16).
    * The kernel folds each dot in the identical order, so signatures —
    * and the DuckDB oracle hash — are bit-unchanged (pinned in KernelSpec
    * against [[hyperplanes]]).
    */
  private def bandKeyed(emb: DataFrame, bands: Int, rowsPerBand: Int,
                        dim: Int): DataFrame =
    withNorm(emb, "id", "v")
      .selectExpr("id", s"rhp_signature(v, ${bands * rowsPerBand}, $dim) as sig")
      .selectExpr("id",
        s"""explode(transform(sequence(0, ${bands - 1}), b ->
           |  concat_ws(':', cast(b as string),
           |    concat_ws('', transform(slice(sig, b * $rowsPerBand + 1, $rowsPerBand),
           |                            x -> cast(cast(x as int) as string))))))
           |  as band_key""".stripMargin)

  private[graft] def rhpCandidates(emb: DataFrame, bands: Int, rowsPerBand: Int,
                                 dim: Int): DataFrame = {
    // band keys are LINEAR-sized (N·bands rows, no vectors) and feed both
    // sides of the candidate self-join: localCheckpoint (not persist) so
    // the one signature pass is shared AND the blocks self-release with
    // the returned plan instead of waiting for a harness clearCache()
    // (VERDICT r18 #3; exactly marginAlignAnn's shape and trade)
    val keys = bandKeyed(emb, bands, rowsPerBand, dim).localCheckpoint()
    keys.as("a")
      .join(keys.as("b"), expr("a.band_key = b.band_key and a.id < b.id"))
      .selectExpr("a.id as ida", "b.id as idb")
      .distinct()
  }

  /** Near-dup pairs via sign-LSH candidates + exact cosine verification —
    * the 100 TB path replacing [[cosineNearDup]]'s all-pairs join: cost is
    * O(N·planes·dim) signatures + one band equi-join + O(candidates·dim)
    * verification, vs O(N²·dim). Output = a subset of the exact pair set
    * (verification removes every false positive); per-pair miss probability
    * is (1 − p^r)^b with p = 1 − θ/π. The default banding is N-ADAPTIVE
    * ([[adaptiveBanding]] — candidates stay linear in N and the miss
    * probability at cos 0.9 stays ≤ 0.5%); pass explicit `bands` /
    * `rowsPerBand` to pin a fixed scheme.
    *
    * Fixture caveat, measured at sf0.01: the fixture embeddings are
    * uniform-random 64-dim and the pairs above 0.45 are the TAIL OF THE
    * BACKGROUND distribution (max cosine 0.513 ≈ 3.6σ, no planted
    * high-cosine dups), i.e. θ ≈ 63° where sign-LSH cannot have both
    * recall ≈ 1 and pruning — information-theoretically, not as an
    * implementation artifact. Recall is therefore OpsSpec-asserted on
    * planted near-dups; correctness is HASH-GATED since r15: the
    * hyperplanes are deterministic, so the DuckDB oracle re-derives them
    * and re-computes signatures, band keys, the candidate set and the
    * verified cosines independently (OpQueries.dkLshOracle).
    */
  def cosineNearDupLsh(emb: DataFrame, threshold: Double = 0.45,
                       bands: Int = 0, rowsPerBand: Int = 0,
                       dim: Int = 64): DataFrame = {
    // both-or-neither AND non-negative: mixed-sign inputs like (16, -1)
    // used to slip past the original xor-guard and die later inside
    // slice() with an opaque error (ADVICE r16)
    require(bands >= 0 && rowsPerBand >= 0 &&
        ((bands == 0) == (rowsPerBand == 0)),
      s"pass bands and rowsPerBand together as positive values (or neither, " +
        s"for N-adaptive banding); got bands=$bands, rowsPerBand=$rowsPerBand")
    // bands/rowsPerBand = 0 (the default) → background-bounded banding
    // from one metadata-cheap count (the cosineNearDup-guard precedent);
    // explicit values pin the banding exactly (spec/recall tests)
    val (b, r) =
      if (bands > 0) (bands, rowsPerBand) else adaptiveBanding(emb.count())
    val n = withNorm(emb, "id", "v")
    rhpCandidates(emb, b, r, dim)
      .join(n.selectExpr("id as ida", "v as va", "norm_v as norm_va"), Seq("ida"))
      .join(n.selectExpr("id as idb", "v as vb", "norm_v as norm_vb"), Seq("idb"))
      .selectExpr("ida", "idb", s"${cosExpr("va", "vb", "norm_va", "norm_vb")} as cosine")
      .filter(col("cosine") >= threshold)
      .orderBy("ida", "idb")
  }
}
