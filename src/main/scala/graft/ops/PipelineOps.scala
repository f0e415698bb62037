package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Composed training-data selection — the end-to-end step the individual
  * ops exist for: score quality, drop exact duplicates, take a
  * deterministic sample. Gated as one query (op_pipeline_sample) so the
  * COMPOSITION is oracle-checked, not just each stage.
  */
object PipelineOps {

  /** Defaults for the data-mixing family, shared with the DuckDB oracle
    * mirrors in [[OpQueries]] (ADVICE r19): the oracle SQL interpolates
    * THESE constants instead of re-stating literals, so a default change
    * on either side cannot silently desynchronize the pairing — there is
    * exactly one place the bucket count / target predicate / cap live.
    * `DefaultTargetPred` is deliberately a predicate valid in BOTH
    * dialects (plain column comparison). */
  val DefaultBuckets: Int = 256
  val DefaultTargetPred: String = "lang = 'en'"
  val DefaultSourceCap: Long = 18L

  /** Quality-filter → exact-dedup keep → deterministic hash sample of `n`
    * docs.
    *
    * Scale shape: the quality projection is map-only over the scan; the
    * dedup keeper set is one hash shuffle (DedupOps.exact) consumed
    * through a LEFT SEMI join; the "sample" is an ORDER BY md5(doc_id)
    * LIMIT n — a total-ordered deterministic reservoir that Spark executes
    * as TakeOrderedAndProject (per-partition top-n, then a k-row merge on
    * the driver), never a full global sort. md5 keys make the sample
    * reproducible across runs, partitionings and engines — the property a
    * training-data pipeline needs for auditable subsets.
    */
  def sample(docs: DataFrame, minQuality: Double = 0.3, n: Int = 100): DataFrame = {
    val keep = DedupOps.exact(docs).filter(col("is_dup") === 0).select("doc_id")
    TextOps.textStats(docs)
      .filter(col("quality_score") >= minQuality)
      .join(keep, Seq("doc_id"), "left_semi")
      .selectExpr("doc_id", "quality_score", "md5(cast(doc_id as string)) as h")
      .orderBy("h")
      .limit(n)
      .selectExpr("doc_id", "quality_score")
      .orderBy("doc_id")
  }

  /** End-to-end curation — the full pre-training data path as ONE composed,
    * oracle-gated operator (each stage is individually gated elsewhere;
    * this gates their COMPOSITION, where stage-boundary bugs live):
    *
    *   1. PII scrub ([[TextOps.piiScrub]], map-only);
    *   2. quality filter on the scrubbed text ([[TextOps.textStats]]
    *      composite score ≥ `minQuality`, map-only);
    *   3. benchmark decontamination: candidates (doc_id % `benchMod` ≠ 0)
    *      have every span matching the held-out slice (doc_id % benchMod
    *      = 0, scrubbed but NOT quality-filtered — the eval set is given,
    *      not curated) cut out ([[DedupOps.contaminationCut]]);
    *   4. exact dedup, keep-first: one survivor per final clean text
    *      (min doc_id).
    *
    * Scale shape: stages 1-2 are one fused codegen map stage; stage 3 is
    * the bucketed shingle semi-join (never all-pairs); stage 4 is a
    * text-keyed window — hash-partitioned by content, the same shape as
    * DedupOps.exact. Nothing driver-side anywhere.
    */
  def curate(docs: DataFrame, minQuality: Double = 0.25,
             benchMod: Long = 7, n: Int = 8): DataFrame = {
    // materialize the scrub ONCE (r20 optimization round, guide §1.2):
    // the quality pass, the candidate semi-join and the benchmark-slice
    // filter all consume the scrubbed relation, and the three-pattern
    // regex chain is the expensive per-row work of this stage —
    // un-cut it executed once per consumer. Linear-sized; self-releases
    // through the ContextCleaner. Measured at sf0.1 (same-JVM A/B, two
    // alternations): curate 3.42/4.04 → 3.06/2.78 s.
    val scrubbed = TextOps.piiScrub(docs).selectExpr("doc_id", "clean_text as text")
      .localCheckpoint()
    val q = TextOps.textStats(scrubbed)
      .filter(col("quality_score") >= minQuality).select("doc_id")
    val cands = scrubbed.join(q, Seq("doc_id"), "left_semi")
      .filter(col("doc_id") % benchMod =!= 0)
    val bench = scrubbed.filter(col("doc_id") % benchMod === 0)
    val cut = DedupOps.contaminationCut(cands, bench, n)
    val w = Window.partitionBy(col("clean_text"))
    cut.withColumn("keeper", min(col("doc_id")).over(w))
      .filter(col("doc_id") === col("keeper"))
      .select("doc_id", "clean_text", "n_cut", "n_kept")
      .orderBy("doc_id")
  }

  /** Deterministic stratified sample: `k` docs per stratum (the balanced
    * per-language / per-source subsets a training mix is built from), keyed
    * by md5 of `keyCol` (default `doc_id` — any unique row key works) so
    * the selection is reproducible across runs, partitionings and engines.
    *
    * Scale shape: the `row_number <= k` filter compiles to Spark's
    * WindowGroupLimit pushdown — each map task keeps at most k rows per
    * stratum BEFORE the exchange (Partial mode), so the shuffle carries
    * O(strata · k · tasks) rows rather than the corpus, and the final
    * per-stratum sort ranks only those survivors. PlanSpec pins the
    * WindowGroupLimit node.
    */
  def stratifiedSample(docs: DataFrame, strata: Seq[String], k: Int,
                       keyCol: String = "doc_id"): DataFrame = {
    require(strata.nonEmpty && k > 0, "stratifiedSample needs strata and k > 0")
    // `rn` and `__h` are produced by this operator; a stratum (or key)
    // column with one of those names would silently collide (ADVICE r7)
    val reserved = Set("rn", "__h")
    require(!(strata :+ keyCol).exists(c => reserved.contains(c.toLowerCase)),
      s"stratifiedSample reserves column names ${reserved.mkString(", ")}")
    require(!strata.exists(_.equalsIgnoreCase(keyCol)),
      s"key column $keyCol cannot also be a stratum")
    // backtick-quote every identifier so names with spaces/dots resolve as
    // single columns (names may not themselves contain a backtick)
    require(!(strata :+ keyCol).exists(_.contains("`")),
      "column names must not contain backticks")
    def c(name: String): Column = col(s"`$name`")
    val sc: Seq[Column] = strata.map(c)
    val w = Window.partitionBy(sc: _*).orderBy(col("__h"), c(keyCol))
    docs.select(sc ++ Seq(c(keyCol),
        md5(c(keyCol).cast("string")).as("__h")): _*)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(sc ++ Seq(c(keyCol), col("rn").cast("long").as("rn")): _*)
  }

  /** Epoch materialization under temperature sampling — the step that
    * turns [[langSampleWeights]]' per-language boost into an actual
    * training epoch: each document is emitted `⌊boost⌋` times plus one
    * more with probability `frac(boost)`, decided by the document's own
    * portable hash (u = h60(doc_id) mod 2²⁰ scaled to [0,1)) — so an
    * up-weighted language's docs repeat and a down-weighted one's thin
    * out, with E[copies] = boost exactly and ZERO randomness: the epoch
    * is a pure function of the corpus, reproducible across engines, runs,
    * and cluster layouts (the property that makes training runs
    * repeatable and elastic).
    *
    * Scale shape: the boost table is a per-language aggregate broadcast
    * back onto the corpus; copy counting and the explode are map-only —
    * the epoch never shuffles. Every arithmetic step (integer hash mod,
    * one division, IEEE floor/subtract/compare) is exact cross-engine, so
    * the materialized epoch hash-gates row for row.
    */
  def epochMaterialize(docs: DataFrame): DataFrame = {
    val w = langSampleWeights(docs).select("lang", "boost")
    docs.select("doc_id", "lang")
      .join(broadcast(w), Seq("lang"))
      .selectExpr("doc_id", "lang",
        s"""cast(floor(boost) as bigint)
           |  + cast((${TextOps.h60("cast(doc_id as string)")} % 1048576)
           |           / 1048576.0 < boost - floor(boost) as bigint)
           |  as n_copies""".stripMargin)
      .filter(col("n_copies") > 0)
      .selectExpr("doc_id", "lang",
        "explode(sequence(cast(1 as bigint), n_copies)) as copy")
      .orderBy("doc_id", "copy")
  }

  /** Per-language temperature-sampling weights — the multilingual
    * balancing recipe every large multilingual LM uses (XLM-R, Conneau et
    * al. 2020; mT5: sample language l with probability ∝ (n_l/N)^α, α<1,
    * to up-weight low-resource languages). α is fixed at 1/2 so the only
    * transcendental is `sqrt`, which IEEE 754 requires correctly rounded —
    * the one non-rational function that is bit-identical cross-engine, so
    * the whole output hash-gates.
    *
    * Output per language: document/token counts, the natural token share,
    * the α=1/2 sampling probability `p_sample = √share / Σ_l √share`, and
    * `boost = p_sample / share` (the up/down-sampling multiplier a data
    * loader applies). The Σ over languages is a fold in lexicographic
    * language order (the BM25/fold discipline), so the double sum is
    * order-deterministic in any engine.
    *
    * Scale shape: one (lang)-keyed two-phase aggregation over a map-only
    * token-count projection; the language table (a handful of rows)
    * collapses to ONE packed row for the fold and broadcasts back — the
    * corpus shuffles once on `lang`, and nothing else moves.
    */
  /** Deterministic train/validation/test split assignment — the last step
    * of every dataset build. Each row hashes its key (md5, stable across
    * engines, runs, and cluster layouts) and lands in the split whose
    * cumulative ratio range covers the hash: the first 8 hex chars of the
    * digest, compared as fixed-width strings against thresholds
    * `⌊cum·16⁸⌋` rendered in hex — lexicographic compare of fixed-width
    * lowercase hex IS numeric compare, so both engines can evaluate the
    * identical CASE with no integer-parsing builtin required.
    *
    * Properties a pipeline needs from a splitter, all by construction:
    * disjoint + exhaustive (CASE ranges tile [0,16⁸)); stable under
    * re-runs, repartition, and corpus growth (a doc's split depends only
    * on its own key); ratio-accurate to ~2⁻³² per row. Map-only: no
    * shuffle, no state, embarrassingly parallel at any scale.
    *
    * `splits` maps name → weight (normalized internally); assignment
    * follows the given order.
    */
  def splitAssign(docs: DataFrame, keyCol: String = "doc_id",
                  splits: Seq[(String, Double)] =
                    Seq("train" -> 0.90, "val" -> 0.05, "test" -> 0.05)): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      s"need positive split weights, got $splits")
    val total = splits.map(_._2).sum
    val cums = splits.map(_._2 / total).scanLeft(0.0)(_ + _).tail
    val hexMax = 65536.0 * 65536.0 // 16^8
    val cases = splits.init.zip(cums.init).map { case ((name, _), cum) =>
      f"when h8 < '${math.min(hexMax - 1, cum * hexMax).toLong}%08x' then '$name'"
    }.mkString(" ")
    splitCaseSql(keyCol, cases, splits.last._1, docs)
  }

  private def splitCaseSql(keyCol: String, cases: String, last: String,
                           docs: DataFrame): DataFrame =
    docs.selectExpr(keyCol,
        s"substring(md5(cast($keyCol as string)), 1, 8) as h8")
      .selectExpr(keyCol, s"case $cases else '$last' end as split")
      .orderBy(keyCol)

  /** The `splitAssign` thresholds as a DuckDB CASE, for oracle reuse. */
  def splitAssignOracleCase(splits: Seq[(String, Double)]): String = {
    val total = splits.map(_._2).sum
    val cums = splits.map(_._2 / total).scanLeft(0.0)(_ + _).tail
    val hexMax = 65536.0 * 65536.0
    splits.init.zip(cums.init).map { case ((name, _), cum) =>
      f"WHEN h8 < '${math.min(hexMax - 1, cum * hexMax).toLong}%08x' THEN '$name'"
    }.mkString(" ") + s" ELSE '${splits.last._1}'"
  }

  /** Train/eval split LEAKAGE audit — the question every dataset release
    * must answer before shipping: does identical content cross the split
    * boundary? (A doc whose text also sits in train contaminates val/test
    * exactly like external benchmark leakage — this is decontamination
    * turned inward.) Joins the deterministic splitter with the
    * order-sensitive rolling-hash content fingerprint and reports every
    * fingerprint present in MORE THAN ONE split, with per-split doc
    * counts and the smallest carrying doc_id.
    *
    * Scale shape: two map-only per-row derivations (split CASE,
    * fingerprint fold) joined on doc_id, then ONE fingerprint-keyed
    * partial-aggregated groupBy; the HAVING keeps only boundary-crossing
    * fingerprints, so the output is duplicate-bounded, not corpus-sized.
    * All-integer counts over md5-derived values — full hash gate.
    */
  def splitLeakage(docs: DataFrame, keyCol: String = "doc_id",
                   splits: Seq[(String, Double)] =
                     Seq("train" -> 0.90, "val" -> 0.05, "test" -> 0.05)): DataFrame = {
    val fp = TextOps.fingerprint(docs)
    val sp = splitAssign(docs, keyCol, splits)
    val perSplit = splits.map { case (name, _) =>
      sum(expr(s"case when split = '$name' then 1L else 0L end")).as(s"n_$name")
    }
    val aggs = countDistinct(col("split")).as("n_splits") +:
      perSplit :+ min(col(keyCol)).as("first_doc")
    fp.join(sp, Seq(keyCol))
      .groupBy(col("fingerprint"))
      .agg(count(lit(1)).as("n_docs"), aggs: _*)
      .filter(col("n_splits") >= 2)
      .orderBy("fingerprint")
  }

  /** Corpus snapshot DIFF — the release audit between two dataset
    * versions: per doc_id, whether the doc was ADDED, REMOVED, CHANGED
    * (content fingerprint moved) or UNCHANGED between snapshots — what a
    * dataset changelog is built from, and the pre-publish check that a
    * "metadata-only" release didn't silently rewrite content. Presence
    * is tracked with explicit flags (never by fingerprint nullness — a
    * null-text doc must not masquerade as added), and the changed test
    * is null-safe.
    *
    * Scale shape: two map-only fingerprint passes + ONE doc_id-keyed
    * full-outer join; output is corpus-sized but per-row constant —
    * nothing quadratic, nothing driver-side. */
  def corpusDiff(oldDocs: DataFrame, newDocs: DataFrame): DataFrame = {
    val fo = TextOps.fingerprint(oldDocs)
      .selectExpr("doc_id", "fingerprint as fp_old", "true as in_old")
    val fn = TextOps.fingerprint(newDocs)
      .selectExpr("doc_id", "fingerprint as fp_new", "true as in_new")
    fo.join(fn, Seq("doc_id"), "full_outer")
      .selectExpr("doc_id", "fp_old", "fp_new",
        """case when in_old is null then 'added'
          |     when in_new is null then 'removed'
          |     when fp_old <=> fp_new then 'unchanged'
          |     else 'changed' end as status""".stripMargin)
      .orderBy("doc_id")
  }

  // ---- data mixing: DSIR importance resampling + per-source caps ----

  /** 2⁶⁴ and 2⁻⁶⁴ as shortest-round-trip literals — multiplying a double
    * by either is EXACT (pure exponent shift, no mantissa rounding), which
    * is what keeps the normalized-product fold below bit-deterministic. */
  private val P64 = "1.8446744073709552E19"
  private val M64 = "5.421010862427522E-20"

  /** The overflow-free running product of `rsExpr` (an ARRAY<DOUBLE> of
    * per-feature likelihood ratios, folded in array order): the weight is
    * carried as m·(2⁶⁴)ᵉ with m renormalized by an exact power-of-two
    * shift whenever a multiply leaves [2⁻⁶⁴, 2⁶⁴). Every step is one
    * correctly-rounded multiply plus exact shifts/compares, so the fold
    * is bit-deterministic cross-engine at ANY product magnitude — the
    * log-free answer to DSIR's Σ log-ratio (log is not IEEE-pinned;
    * a raw product overflows past ~300 features). Valid while each ratio
    * sits in (2⁻⁶⁰, 2⁶⁰) — guaranteed by Laplace smoothing for corpora
    * under 2⁶⁰ feature occurrences — so one shift per step suffices. */
  private def weightFoldExpr(rsExpr: String): String =
    s"""aggregate($rsExpr,
       |  named_struct('m', cast(1.0 as double), 'e', cast(0 as bigint)),
       |  (acc, r) -> case
       |    when acc.m * r >= $P64
       |      then named_struct('m', (acc.m * r) * $M64, 'e', acc.e + 1L)
       |    when acc.m * r < $M64
       |      then named_struct('m', (acc.m * r) * $P64, 'e', acc.e - 1L)
       |    else named_struct('m', acc.m * r, 'e', acc.e) end)""".stripMargin

  /** Hashed n-gram feature buckets of a tokenized column `w`, in POSITION
    * order (unigrams then bigrams): the DSIR feature map. Position order
    * is a pure function of the text, so both engines fold the same
    * sequence with no sort anywhere.
    *
    * Bigrams pair each token with its successor via `zip_with` against
    * the 1-shifted array (null-padded, pad filtered out) — NEVER via
    * `element_at($w, i)` inside a lambda: Catalyst's CollapseProject can
    * re-inline the upstream tokenization into `$w`, and an array lookup
    * inside a lambda then re-evaluates the whole split PER ELEMENT —
    * O(L²) re-tokenization per document (measured: the op's sf0.1 cost
    * fell 21.8 → ~1 s across this and the column hoist in
    * [[importanceWeights]]). With zip_with, every `$w` reference sits
    * OUTSIDE a lambda and evaluates once per row no matter how the
    * projection collapses. */
  private def featureBucketsExpr(w: String, buckets: Int): String =
    s"""concat(
       |  transform($w, x -> ${TextOps.h60("x")} % $buckets),
       |  filter(zip_with($w,
       |      concat(slice($w, 2, greatest(size($w) - 1, 0)),
       |             array(cast(null as string))),
       |      (a, b) -> case when b is not null
       |                     then ${TextOps.h60("concat(a, ' ', b)")} % $buckets
       |                end),
       |    x -> x is not null))""".stripMargin

  /** DSIR-style importance-resampling weights (Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling"):
    * score every document by how target-like its hashed-n-gram profile
    * is, then turn the score into a deterministic per-doc copy count so
    * the mixture is APPLIED, not just computed.
    *
    *   1. features: word unigrams + bigrams hashed into `buckets` buckets
    *      (the op_feature_hash machinery) — map-only;
    *   2. bucket marginals: target-slice (`targetPred`) vs raw-corpus
    *      occurrence counts, Laplace-smoothed into per-bucket likelihood
    *      ratios ratio_b = p̂_target(b) / p̂_raw(b) — ONE vocab-bounded
    *      keyed agg (≤ `buckets` keys after map-side combine), collapsed
    *      to a broadcast array;
    *   3. per-doc weight: the position-order product of its feature
    *      ratios, carried overflow-free as (mantissa, exponent) by
    *      [[weightFoldExpr]] and canonicalized to m ∈ [1, 2⁶⁴) so the
    *      (e, m) pair orders by magnitude — map-only over the scan;
    *   4. application: weights are normalized RELATIVE (w_rel = w/w_max;
    *      max of (e, m) is order-independent, unlike a double sum), snapped
    *      to a 2³⁰ integer grid whose corpus sum IS order-independent,
    *      and scaled so Σ boost ≈ n_docs; n_copies materializes boost by
    *      the doc's own hash fraction ([[epochMaterialize]]'s arithmetic
    *      — zero randomness, E[copies] = boost exactly).
    *
    * Scale shape: two text scans (marginals; weights — the slim per-doc
    * weight table is localCheckpointed so the three scalar-normalization
    * consumers never re-read text; self-releasing, the marginScore idiom,
    * same lost-executor/job-retry trade documented there), two scalar
    * aggregates over exact-integer/max values, everything else broadcast
    * or map-only. No pair surface, no corpus-keyed shuffle anywhere.
    * Determinism: md5 bucket hashing, integer marginals, single-division
    * ratios, the exact-shift product fold, and grid/boost arithmetic
    * whose every double op is one correctly-rounded step — the full
    * output hash-gates cross-engine.
    */
  def importanceWeights(docs: DataFrame,
                        targetPred: String = DefaultTargetPred,
                        buckets: Int = DefaultBuckets): DataFrame = {
    require(buckets > 0 && buckets <= (1 << 20),
      s"need 0 < buckets <= 2^20, got $buckets")
    // tokenize ONCE into a column before the feature lambdas: an inline
    // split expression inside transform()/element_at() re-evaluates PER
    // LAMBDA ELEMENT (Catalyst does not hoist common subexpressions out
    // of higher-order functions), turning bigram hashing into O(L²)
    // re-tokenization per document — measured 17.5 s of a 21 s sf0.1
    // runtime before this hoist, 0.8 s after
    // materialize the feature table ONCE (r20 optimization round, guide
    // §1.2/§2.4): it feeds BOTH the marginal aggregation and the scoring
    // fold — un-cut, the tokenize+feature-hash scan (the dominant cost of
    // this op) executes twice, once per consumer. The checkpoint is
    // linear-sized (doc_id, flag, feature array ≈ the text itself) and
    // self-releases through the ContextCleaner. Measured at sf0.1:
    // op_importance_weights 2.96 → 1.95 s (stage profile, min of 3).
    val toks = docs
      .selectExpr("doc_id", s"($targetPred) as __tgt",
        s"${TextOps.wordsExpr("text")} as __w")
      .selectExpr("doc_id", "__tgt",
        s"${featureBucketsExpr("__w", buckets)} as __f")
      .localCheckpoint()
    // one pass computes both marginals: every feature counts toward raw,
    // target-slice features also toward tgt
    val counts = toks
      .selectExpr("__tgt", "explode(__f) as bucket")
      .groupBy(col("bucket"))
      .agg(sum(expr("case when __tgt then 1L else 0L end")).as("c_tgt"),
        count(lit(1)).as("c_raw"))
    importanceFromCounts(toks.select(col("doc_id"), col("__f")), counts, buckets)
  }

  /** [[importanceWeights]] with the target distribution estimated from a
    * SEPARATE relation (VERDICT r19): `target` is a seed corpus — rows
    * with a `text` column, typically NOT part of `docs` at all (the
    * original DSIR shape: raw pool scored against a held-out quality
    * seed like Wikipedia). Target features feed ONLY the target
    * marginals; corpus features feed ONLY the raw marginals and are the
    * docs that get scored. When `target` happens to be exactly
    * `docs.filter(pred)`, this reduces to [[importanceWeights]](docs,
    * pred) row-for-row — OpsSpec pins that special-case identity — since
    * there the in-corpus target slice contributes to both marginals
    * either way.
    *
    * Scale shape: identical to [[importanceWeights]] (the seed adds one
    * map-only feature pass + the same vocab-bounded agg); a seed is
    * normally corpus-dwarfed, so its pass is noise. */
  def importanceWeightsAgainst(docs: DataFrame, target: DataFrame,
                               buckets: Int = DefaultBuckets): DataFrame = {
    require(buckets > 0 && buckets <= (1 << 20),
      s"need 0 < buckets <= 2^20, got $buckets")
    // same single-tokenize cut as importanceWeights (r20): corpus features
    // feed the raw marginals AND the scoring fold
    val corpus = docs
      .selectExpr("doc_id", s"${TextOps.wordsExpr("text")} as __w")
      .selectExpr("doc_id", s"${featureBucketsExpr("__w", buckets)} as __f")
      .localCheckpoint()
    val tgtFeats = target
      .selectExpr(s"${TextOps.wordsExpr("text")} as __w")
      .selectExpr(s"${featureBucketsExpr("__w", buckets)} as __f")
    val counts = corpus.selectExpr("explode(__f) as bucket", "false as __tgt")
      .unionByName(tgtFeats.selectExpr("explode(__f) as bucket", "true as __tgt"))
      .groupBy(col("bucket"))
      .agg(sum(expr("case when __tgt then 1L else 0L end")).as("c_tgt"),
        sum(expr("case when __tgt then 0L else 1L end")).as("c_raw"))
    importanceFromCounts(corpus, counts, buckets)
  }

  /** Shared tail of the DSIR family: per-bucket (c_tgt, c_raw) marginals
    * → Laplace ratio array (one broadcast row) → per-doc overflow-free
    * (m, e) ratio product → relative weight, grid boost, copy count.
    * `feats` carries the docs to SCORE as (doc_id, __f); `counts` the
    * marginal contributions as (bucket, c_tgt, c_raw) — [[importanceWeights]]
    * derives both from one relation, [[importanceWeightsAgainst]] from
    * corpus + seed. */
  private def importanceFromCounts(feats: DataFrame, counts: DataFrame,
                                   buckets: Int): DataFrame = {
    val toks = feats
    // bucket marginals → one broadcast row holding the full ratio array
    // (buckets ≤ 2²⁰ doubles = 8 MB; the gate runs 256). Missing buckets
    // take the smoothed zero-count ratio via the map lookup default.
    val ratioRow = counts
      .agg(sum("c_tgt").as("t_tot"), sum("c_raw").as("r_tot"),
        expr("map_from_entries(collect_list(struct(bucket, struct(c_tgt, c_raw)))) as mc"))
      .selectExpr(
        s"""transform(sequence(0L, ${buckets - 1}L), b ->
           |  (cast(coalesce(mc[b].c_tgt, 0L) + 1 as double)
           |     / cast(t_tot + $buckets as double))
           |  / (cast(coalesce(mc[b].c_raw, 0L) + 1 as double)
           |       / cast(r_tot + $buckets as double))) as ratio_arr""".stripMargin)
    val fold = weightFoldExpr(
      "transform(__f, b -> element_at(ratio_arr, cast(b as int) + 1))")
    // slim per-doc weight table: canonical m ∈ [1, 2⁶⁴) so lexicographic
    // (e, m) compares like the weight itself
    val weights = toks.crossJoin(broadcast(ratioRow))
      .selectExpr("doc_id", "cast(size(__f) as bigint) as n_feats",
        s"$fold as __me")
      .selectExpr("doc_id", "n_feats",
        s"""case when __me.m < 1.0
           |     then named_struct('m', __me.m * $P64, 'e', __me.e - 1L)
           |     else __me end as __c""".stripMargin)
      .selectExpr("doc_id", "n_feats", "__c.m as m", "__c.e as e")
      .localCheckpoint()
    val mx = weights.agg(max(expr("struct(e, m)")).as("mx"))
      .selectExpr("mx.e as e_max", "mx.m as m_max")
    // w_rel = w/w_max ∈ [0,1]: Δe < −1 is already below the 2⁻³⁰ grid
    // (w_rel < 2⁻⁶⁴), so the CASE floors it to exactly 0
    val grid = weights.crossJoin(broadcast(mx))
      .selectExpr("doc_id", "n_feats", "m", "e",
        s"""case when e - e_max = 0L then m / m_max
           |     when e - e_max = -1L then (m / m_max) * $M64
           |     else 0.0 end as w_rel""".stripMargin)
      .selectExpr("doc_id", "n_feats", "m", "e", "w_rel",
        "cast(floor(w_rel * 1073741824.0) as bigint) as w_int")
    val tot = grid.agg(sum("w_int").as("s_w"), count(lit(1)).as("n_docs"))
    grid.crossJoin(broadcast(tot))
      .selectExpr("doc_id", "n_feats", "m", "e", "w_rel",
        "cast(w_int as double) * cast(n_docs as double) / cast(s_w as double) as boost")
      .selectExpr("doc_id", "n_feats", "m", "e", "w_rel", "boost",
        s"""cast(floor(boost) as bigint)
           |  + cast((${TextOps.h60("cast(doc_id as string)")} % 1048576)
           |           / 1048576.0 < boost - floor(boost) as bigint)
           |  as n_copies""".stripMargin)
      .orderBy("doc_id")
  }

  /** [[importanceWeights]] APPLIED: the materialized importance-resampled
    * epoch — every doc emitted `n_copies` times as (doc_id, copy) rows,
    * the exact stream a training-data loader consumes. Map-only explode
    * on top of the weights; Σ copies ≈ n_docs by construction. */
  def importanceResample(docs: DataFrame,
                         targetPred: String = DefaultTargetPred,
                         buckets: Int = DefaultBuckets): DataFrame =
    importanceWeights(docs, targetPred, buckets)
      .filter(col("n_copies") > 0)
      .selectExpr("doc_id",
        "explode(sequence(cast(1 as bigint), n_copies)) as copy")
      .orderBy("doc_id", "copy")

  /** Per-source document cap — the CCNet/RefinedWeb over-represented-
    * domain control: every source keeps at most `cap` documents, survivors
    * chosen by md5 rank within the source (the [[splitAssign]] recipe —
    * deterministic across runs, partitionings, engines and corpus
    * GROWTH for the already-kept docs is NOT promised: adding docs can
    * reshuffle ranks; the cap is a per-snapshot selection).
    *
    * Scale shape: ranks come from [[PercentileOps.rangePrefixN]] — a
    * RANGE partition on (source, md5, key), so a dominant source spreads
    * over many partitions instead of melting one reducer the way a
    * PARTITION BY window would; the keep filter is map-only on the
    * ranked stream. Output is the survivor list (source, doc_id, rk ≤
    * cap); pair nothing, collect nothing.
    */
  def sourceCap(docs: DataFrame, cap: Long, sourceCol: String = "source",
                keyCol: String = "doc_id"): DataFrame = {
    require(cap > 0, s"need cap > 0, got $cap")
    val blocks = docs
      .selectExpr(sourceCol, s"md5(cast($keyCol as string)) as __h", keyCol)
      .withColumn("one", lit(1L))
    PercentileOps.rangePrefixN(blocks, sourceCol, Seq("__h", keyCol), Seq("one"))
      .filter(col("__cum_one") <= cap)
      .selectExpr(sourceCol, keyCol, "__cum_one as rk")
      .orderBy(sourceCol, "rk")
  }

  /** The composed data-MIXING path — per-source cap, then importance
    * resampling over the capped corpus, gated as ONE operator (the
    * [[curate]] precedent: each stage is individually gated elsewhere;
    * this gates their COMPOSITION, where stage-boundary bugs live).
    * Order matters and is part of the declared semantics: the DSIR
    * marginals are computed over the CAPPED corpus — an over-represented
    * source must not dominate the raw-distribution estimate it is being
    * resampled against (the CCNet-then-DSIR recipe).
    *
    * Scale shape: the cap survivor list flows through a LEFT SEMI join
    * (never a row multiplication), and everything downstream is
    * [[importanceWeights]]' two-scan shape over the capped corpus.
    * Output per surviving doc: relative weight, boost, and the applied
    * copy count.
    */
  def pipelineMix(docs: DataFrame, cap: Long = DefaultSourceCap,
                  targetPred: String = DefaultTargetPred,
                  buckets: Int = DefaultBuckets): DataFrame = {
    val keep = sourceCap(docs, cap).select("doc_id")
    val capped = docs.join(keep, Seq("doc_id"), "left_semi")
    importanceWeights(capped, targetPred, buckets)
      .selectExpr("doc_id", "w_rel", "boost", "n_copies")
      .orderBy("doc_id")
  }

  /** The END-TO-END curation-to-mixture pipeline gated as ONE operator
    * (VERDICT r19): [[curate]] (PII scrub → quality floor → benchmark
    * decontamination cut → exact dedup) → [[sourceCap]] over the
    * curated survivors → DSIR importance RESAMPLING over the capped
    * corpus, emitted as the applied (doc_id, copy) epoch a training
    * loader consumes. Each stage is individually gated elsewhere
    * (op_pipeline_curate / op_source_cap / op_importance_resample);
    * this gates the three stage BOUNDARIES at once — where the curated
    * text (not the raw text!) must feed the cap ranks and the DSIR
    * marginals, and the cap survivor set must bound everything
    * downstream.
    *
    * Scale shape: curate's shapes, then a LEFT SEMI survivor join, then
    * [[importanceWeights]]' two scans over the capped corpus — the cap
    * bounds the DSIR cost exactly as in [[pipelineMix]]. */
  def pipelineFull(docs: DataFrame, minQuality: Double = 0.25,
                   benchMod: Long = 7, n: Int = 8,
                   cap: Long = DefaultSourceCap,
                   targetPred: String = DefaultTargetPred,
                   buckets: Int = DefaultBuckets): DataFrame = {
    val curated = curate(docs, minQuality, benchMod, n)
    // persisted: the curated relation feeds the cap rank pass, the
    // left-semi survivor probe AND importanceWeights' two scans — four
    // re-executions of the pipeline's most expensive stage (scrub →
    // contamination cut → window dedup) without a barrier, measured 13 →
    // ~7 s at sf0.1 and a 4× shuffle replay at any scale. Linear-sized
    // (one row per curated doc). LIFETIME: localCheckpoint self-releases
    // through the ContextCleaner once the returned plan is unreachable.
    val enriched = curated
      .join(docs.select(col("doc_id"), col("lang"), col("source")), Seq("doc_id"))
      .selectExpr("doc_id", "clean_text as text", "lang", "source")
      .localCheckpoint()
    val keep = sourceCap(enriched, cap).select("doc_id")
    val capped = enriched.join(keep, Seq("doc_id"), "left_semi")
    importanceWeights(capped, targetPred, buckets)
      .filter(col("n_copies") > 0)
      .selectExpr("doc_id",
        "explode(sequence(cast(1 as bigint), n_copies)) as copy")
      .orderBy("doc_id", "copy")
  }

  /** The dropped-mass report for [[sourceCap]]: per source, how many docs
    * the cap keeps and drops. n_kept = min(n_docs, cap) is exact because
    * the rank filter keeps precisely the cap-smallest md5 ranks — no need
    * to re-rank for the report, ONE source-keyed count suffices. */
  def sourceCapReport(docs: DataFrame, cap: Long,
                      sourceCol: String = "source"): DataFrame = {
    require(cap > 0, s"need cap > 0, got $cap")
    docs.groupBy(col(sourceCol))
      .agg(count(lit(1)).as("n_docs"))
      .selectExpr(sourceCol, "n_docs",
        s"least(n_docs, ${cap}L) as n_kept",
        s"n_docs - least(n_docs, ${cap}L) as n_dropped",
        s"cast(n_docs - least(n_docs, ${cap}L) as double) / cast(n_docs as double) as drop_frac")
      .orderBy(sourceCol)
  }

  def langSampleWeights(docs: DataFrame): DataFrame = {
    val per = docs
      .selectExpr("lang",
        s"cast(size(${TextOps.wordsExpr("text")}) as bigint) as nt")
      .groupBy("lang").agg(count(lit(1)).as("n_docs"), sum("nt").as("n_tokens"))
    val tot = per
      .agg(sum("n_tokens").as("n_total"),
        expr("array_sort(collect_list(struct(lang, n_tokens))) as ls"))
      .selectExpr("n_total",
        """aggregate(ls, cast(0.0 as double),
          |  (a, x) -> a + sqrt(cast(x.n_tokens as double) / n_total)) as sum_w""".stripMargin)
    per.crossJoin(broadcast(tot))
      .selectExpr("lang", "n_docs", "n_tokens",
        "cast(n_tokens as double) / n_total as share",
        "sqrt(cast(n_tokens as double) / n_total) / sum_w as p_sample")
      .selectExpr("lang", "n_docs", "n_tokens", "share", "p_sample",
        "p_sample / share as boost")
      .orderBy("lang")
  }
}
