package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}

/** Scale-factor multiplier for the driver-generated fixture tables
  * (VERDICT r13 #3 — the sf1 scale checkpoint).
  *
  * `/root/testdata` is read-only and capped at sf0.1, so the 10× tier is
  * derived: union `copies` key-shifted replicas of every sf0.1 table into
  * `<dst>` (default `testdata-sf1/`, gitignored). Key shifts preserve
  * referential integrity (copy c adds c·|table| to every join key, the
  * same shift on both sides of each FK), so per-key cardinalities, join
  * fan-outs and group sizes all match the source distribution at 10× the
  * row count — exactly what a sf0.1 → sf1 growth-factor measurement needs.
  *
  * Two tables get per-copy perturbation so the DERIVED content
  * distributions scale honestly too:
  *  - `documents.text` (copies c > 0): a fresh HIGH-ENTROPY token stream
  *    per document (VERDICT r17 #4). The former scheme — suffix every
  *    base token with `_c` — kept each copy on the base fixture's
  *    31-word vocabulary, whose concentrated signature distribution
  *    collapses SimHash/CDC buckets: the sf3 text band's growth then
  *    measured birthday collisions of concentrated block-key masses,
  *    not real work, so a genuine signature-skew bug in that band was
  *    unfalsifiable. Now token i of doc D in copy c is drawn
  *    md5-deterministically from a 4096-word per-copy vocabulary
  *    (word identity = a 3-hex index; word surface = `w<8 md5 hex>` of
  *    (copy, index) — per-copy vocabularies are DISJOINT, so total
  *    vocabulary grows ~linearly with corpus size, the Heaps-law shape
  *    vocab-sensitive ops should see at scale, and surfaces are
  *    edit-distance-sparse like a real vocabulary's),
  *    docs are pairwise near-orthogonal, and near-dups are PLANTED at
  *    a fixed linear rate: each doc with base id ≡ 1 (mod 50) re-emits
  *    its predecessor's stream with every 29th token rewritten (~3.4%
  *    edits → shingle-Jaccard ≈ 0.9, SimHash Hamming well inside every
  *    production radius). Pair counts therefore grow linearly in
  *    copies BY CONSTRUCTION, and bucket occupancy stays uniform —
  *    growth at sf1/sf3 is explained by output volume. The base copy
  *    (c = 0) replicates verbatim, so sf0.01/sf0.1 oracle gates are
  *    untouched.
  *  - `embeddings.embedding`: a small deterministic per-copy, per-dim
  *    offset (±3e-3·c) breaks exact vector ties so ANN top-k neighbor
  *    sets stay non-degenerate; cell/bucket occupancy distributions are
  *    unchanged at this magnitude.
  *
  * The dims (`region`, `nation`) replicate verbatim — they are fixed
  * 5/25-row catalogs at every TPC-H scale, and the FK columns that point
  * at them are left unshifted.
  */
object GenScale {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = if (args.length > 1) args(1) else "testdata-sf1"
    val copies = if (args.length > 2) args(2).toInt else 10
    val spark = GraftSession.get("graft-genscale")

    def stacked(name: String)(shift: (DataFrame, Int) => DataFrame): Unit = {
      val base = Tables.load(spark, src, name)
      val out = (0 until copies).map(c => shift(base, c)).reduce(_ unionAll _)
      // 10× sf0.1 is still small (~200 MB); 8 files per table keeps scans
      // parallel without tiny-file overhead
      out.repartition(8).write.mode("overwrite")
        .parquet(s"$dst/$name.parquet")
      System.err.println(s"[gen-scale] $name x$copies -> $dst")
    }

    def keyShift(df: DataFrame, keys: Map[String, Long], c: Int): DataFrame =
      df.select(df.columns.map { col =>
        keys.get(col) match {
          case Some(n) => expr(s"$col + ${c * n}L").as(col)
          case None => df.col(col)
        }
      }.toIndexedSeq: _*)

    // fixed dims: ONE copy (5/25-row catalogs at every TPC-H scale)
    Seq("region", "nation").foreach { name =>
      Tables.load(spark, src, name).coalesce(1).write.mode("overwrite")
        .parquet(s"$dst/$name.parquet")
      System.err.println(s"[gen-scale] $name verbatim -> $dst")
    }
    stacked("customer")(keyShift(_, Map("c_custkey" -> 15000L), _))
    stacked("supplier")(keyShift(_, Map("s_suppkey" -> 1000L), _))
    stacked("part")(keyShift(_, Map("p_partkey" -> 20000L), _))
    stacked("orders")(keyShift(_,
      Map("o_orderkey" -> 150000L, "o_custkey" -> 15000L), _))
    stacked("lineitem")(keyShift(_,
      Map("l_orderkey" -> 150000L, "l_partkey" -> 20000L,
        "l_suppkey" -> 1000L), _))
    stacked("events")(keyShift(_,
      Map("event_id" -> 100000L, "user_id" -> 1500L), _))
    stacked("documents") { (df, c) =>
      val shifted = keyShift(df, Map("doc_id" -> 5000L), c)
      if (c == 0) shifted
      else shifted
        // high-entropy per-copy stream (see scaladoc): content AND length
        // are re-drawn md5-deterministically per (copy, source doc) — a
        // 4096-word vocabulary, 10–100 tokens (the base length range).
        // Docs with base id ≡ 1 (mod 50) draw content and length from
        // their PREDECESSOR's stream (src = doc_id − 1) with every 29th
        // token rewritten — planted near-dup pairs of identical length,
        // one per 50 docs, linear in copies by construction.
        .withColumn("src", expr(
          "doc_id - cast(doc_id % 5000 % 50 = 1 as int)"))
        .withColumn("n_tok", expr(
          s"10 + cast(conv(substring(md5(concat('L$c:', src)), 1, 4), 16, 10) as int) % 91"))
        // token surface = 'w' + 8 md5 hex chars of (copy, 4096-index):
        // word IDENTITY is the 3-hex index (4096-word per-copy vocab),
        // word SURFACE is a second md5 — so per-copy vocabularies are
        // disjoint AND edit-distance-sparse (random 8-hex strings have
        // ~no Levenshtein-1 neighbors), like a real vocabulary. A
        // structural surface ('t<copy>x<3 hex>') was measured to
        // manufacture ~45 edit-distance-1 neighbors PER WORD plus
        // copy-digit substitution pairs — op_fuzzy_words then benched
        // the artifact, not the operator.
        .withColumn("text", expr(
          s"""concat_ws(' ', transform(sequence(0, n_tok - 1), i ->
             |  concat('w', substring(md5(concat('$c:v:',
             |    case when doc_id % 5000 % 50 = 1 and i % 29 = 0
             |      then substring(md5(concat('$c:', doc_id, ':', i, ':edit')), 1, 3)
             |      else substring(md5(concat('$c:', src, ':', i)), 1, 3)
             |    end)), 1, 8))))""".stripMargin))
        .withColumn("n_chars", length(col("text")))
        .drop("src", "n_tok")
    }
    stacked("embeddings") { (df, c) =>
      val shifted = keyShift(df, Map("vec_id" -> 2000L), c)
      if (c == 0) shifted
      else shifted.withColumn("embedding",
        expr(s"transform(embedding, (x, i) -> " +
          s"cast(x + $c * 1e-3 * ((i % 7) - 3) as float))"))
    }
    spark.stop()
  }
}
