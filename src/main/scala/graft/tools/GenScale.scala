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
  *  - `documents.text`: every token of copy c > 0 gets a `_c` suffix
  *    (cross-copy Jaccard/minhash/simhash similarity → 0). Without it
  *    every doc would gain 9 near-identical twins and the dedup-family
  *    pair counts would grow ~quadratically instead of linearly — a
  *    distribution sf1 data would NOT have. Within-copy duplicate
  *    structure (what the ops measure) is preserved verbatim.
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
        .withColumn("text", regexp_replace(col("text"), "(\\S+)", s"$$1_$c"))
        .withColumn("n_chars", length(col("text")))
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
