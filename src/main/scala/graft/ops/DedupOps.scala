package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators over the `documents` table: exact, n-gram
  * Jaccard, MinHash+LSH, and SimHash — the standard near-dup ladder of a
  * training-data pipeline.
  *
  * Scale design (the point of each variant):
  *  - [[exact]] is one hash-shuffle on a 16-byte key — the cheapest pass,
  *    always run first at 100 TB.
  *  - [[jaccardPairs]] is exact but quadratic in the worst case (its join
  *    explodes on shingles shared by many docs); it is the *oracle* tier,
  *    run on samples or small corpora.
  *  - [[minhashPairs]] is the scale path: candidate generation touches only
  *    docs that collide in ≥1 of b bands (shuffle key = band hash), so cost
  *    is O(N·k + Σ bucket²) instead of O(N²); the exact-Jaccard
  *    verification then runs only on candidates. Banding (b=8, r=2) puts
  *    the s-curve threshold at (1/8)^(1/2) ≈ 0.35, i.e. recall at the 0.8
  *    output threshold is 1 − (1 − 0.8²)^8 ≈ 0.9997 per pair, and pair
  *    misses are independent — tune b·r up for tighter SLAs.
  *  - [[simhashPairs]] buckets by the upper bits of a 60-bit SimHash; docs
  *    in one bucket are compared by Hamming distance (XOR + bit_count) —
  *    a cheap complement that catches short-edit near-dups.
  *
  * All hashes are the portable md5-based 60-bit hash ([[TextOps.h60]]) with
  * fixed affine MinHash coefficients, so results are reproducible across
  * engines and runs (no RNG, no seed plumbing).
  */
object DedupOps {
  /** MinHash signature length. */
  val K = 16
  /** LSH bands (of r = K/B rows each). */
  val B = 8
  /** Mersenne prime 2³¹−1 — the MinHash hash space. */
  val P = 2147483647L

  /** Exact dedup on normalized text: every doc maps to the smallest doc_id
    * with identical lower(trim(text)). One shuffle on the md5 key.
    */
  def exact(docs: DataFrame): DataFrame =
    docs
      .selectExpr("doc_id", "md5(lower(trim(text))) as norm_key")
      .selectExpr(
        "doc_id", "norm_key",
        "min(doc_id) over (partition by norm_key) as keep_id")
      .selectExpr("doc_id", "keep_id", "cast(doc_id <> keep_id as int) as is_dup")

  /** Docs with their distinct 3-gram shingle sets (and set size). */
  private def shingled(docs: DataFrame): DataFrame =
    docs
      .selectExpr("doc_id", s"${TextOps.wordsExpr("text")} as w")
      .selectExpr("doc_id", s"${TextOps.shinglesExpr("w")} as sh")
      .selectExpr("doc_id", "sh", "cast(size(sh) as bigint) as n_sh")

  /** Exact all-pairs word-3-gram Jaccard ≥ `threshold`. The pair join is
    * keyed on shingles (not a cross join): only docs sharing ≥1 shingle
    * ever meet. Quadratic only within identical-shingle groups.
    */
  def jaccardPairs(docs: DataFrame, threshold: Double = 0.5): DataFrame = {
    val sh = shingled(docs)
    val ex = sh.selectExpr("doc_id", "n_sh", "explode(sh) as s")
    val inter = ex.as("a")
      .join(ex.as("b"), expr("a.s = b.s and a.doc_id < b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.n_sh").as("na"), col("b.n_sh").as("nb"))
      .agg(count(lit(1)).as("inter"))
    inter
      .selectExpr("doc_a", "doc_b",
        "cast(inter as double) / (na + nb - inter) as jaccard")
      .filter(col("jaccard") >= threshold)
      .orderBy("doc_a", "doc_b")
  }

  /** MinHash signatures: sig_i = min over shingles of (a_i·h + b_i) mod P,
    * with fixed coefficients a_i = 1000003·(2i+1), b_i = 7919·i + 12345.
    */
  private def signatures(docs: DataFrame): DataFrame =
    shingled(docs)
      .selectExpr("doc_id", "sh", "n_sh",
        s"transform(sh, x -> ${TextOps.h60("x")} % ${P}L) as hs")
      .selectExpr("doc_id", "sh", "n_sh",
        s"""transform(sequence(0, ${K - 1}), i ->
           |  array_min(transform(hs, h -> (1000003L * (2 * i + 1) * h + 7919L * i + 12345L) % ${P}L)))
           |  as sig""".stripMargin)

  /** MinHash + LSH near-dup pairs at exact Jaccard ≥ `threshold`.
    * Candidates collide in ≥1 of B bands of the signature; every candidate
    * pair is then verified with exact Jaccard on the shingle sets (array
    * intersection on two rows — no re-explosion), so the output contains
    * no false positives and misses each true pair with probability
    * (1 − s^r)^B (≈ 3·10⁻⁴ at s = 0.8).
    */
  def minhashPairs(docs: DataFrame, threshold: Double = 0.8): DataFrame = {
    val r = K / B
    val sig = signatures(docs)
    val bands = sig.selectExpr("doc_id",
      s"""explode(transform(sequence(0, ${B - 1}), b ->
         |  concat_ws(':', b, element_at(sig, b * $r + 1), element_at(sig, b * $r + 2))))
         |  as band_key""".stripMargin)
    val cand = bands.as("a")
      .join(bands.as("b"), expr("a.band_key = b.band_key and a.doc_id < b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val sets = sig.selectExpr("doc_id", "sh", "n_sh")
    cand
      .join(sets.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sets.as("sb"), col("doc_b") === col("sb.doc_id"))
      .selectExpr("doc_a", "doc_b",
        "cast(size(array_intersect(sa.sh, sb.sh)) as bigint) as inter",
        "sa.n_sh as na", "sb.n_sh as nb")
      .selectExpr("doc_a", "doc_b",
        "cast(inter as double) / (na + nb - inter) as jaccard")
      .filter(col("jaccard") >= threshold)
      .orderBy("doc_a", "doc_b")
  }

  /** SimHash near-dup pairs: bucket on the top 20 bits of the 60-bit
    * SimHash, compare within buckets by Hamming distance ≤ `maxHamming`.
    * (Production variant rotates the bucket window to make the guarantee
    * exhaustive; one rotation is the demonstration tier.)
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 12): DataFrame = {
    val s = TextOps.simhash(docs).selectExpr("doc_id", "simhash",
      "shiftright(simhash, 40) as bucket")
    s.as("a").join(s.as("b"), expr("a.bucket = b.bucket and a.doc_id < b.doc_id"))
      .selectExpr("a.doc_id as doc_a", "b.doc_id as doc_b",
        "bit_count(a.simhash ^ b.simhash) as hamming")
      .filter(col("hamming") <= maxHamming)
      .selectExpr("doc_a", "doc_b", "cast(hamming as bigint) as hamming")
      .orderBy("doc_a", "doc_b")
  }
}
