package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Stage-level decomposition of the expensive bench families (guide §1:
  * measure first, isolate with the noop sink, label jobs). Each stage is
  * timed like Bench times a query — noop write, clearCache between — so
  * the numbers are directly comparable to bench floors.
  *
  * Usage: runMain graft.tools.ProfileStages <family>[,family...]
  * Families: jaccard, importance, textrank, ivfpq, bpe, containment
  * Reads SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
  */
object ProfileStages {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val fams = args.headOption.map(_.split(",").toSet)
      .getOrElse(Set("jaccard", "importance", "textrank", "ivfpq"))
    val spark = graft.GraftSession.get("graft-profile")
    val runs = sys.env.getOrElse("SPARK_GRAFT_PROFILE_RUNS", "3").toInt

    def time(label: String)(mk: => DataFrame): Unit = {
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        spark.sparkContext.setJobDescription(label)
        mk.write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROFILE $label%-40s min=${ts.min}%7.3f med=${ts.sorted.apply(ts.size / 2)}%7.3f")
    }

    import org.apache.spark.sql.functions._
    def docs = graft.Tables.load(spark, sfDir, "documents")
    def emb = graft.Tables.load(spark, sfDir, "embeddings")

    if (fams("jaccard")) {
      import graft.ops.{DedupOps, TextOps}
      def shingled(d: DataFrame) = d
        .selectExpr("doc_id", s"${TextOps.wordsExpr("text")} as w")
        .selectExpr("doc_id", s"${TextOps.shinglesExpr("w")} as sh_txt")
        .selectExpr("doc_id", s"transform(sh_txt, x -> ${TextOps.h60("x")}) as sh")
        .selectExpr("doc_id", "sh", "cast(size(sh) as bigint) as n_sh")
      time("jac/1_shingled")(shingled(docs))
      time("jac/2_freq")(
        shingled(docs).selectExpr("doc_id", "n_sh", "explode(sh) as s")
          .groupBy("s").agg(count(lit(1)).as("df")))
      time("jac/3_prefix") {
        val sets = shingled(docs)
        val ex = sets.selectExpr("doc_id", "n_sh", "explode(sh) as s")
        val freq = ex.groupBy("s").agg(count(lit(1)).as("df"))
        ex.join(freq, "s")
          .groupBy(col("doc_id"), col("n_sh"))
          .agg(expr("sort_array(collect_list(struct(df, s)))").as("os"))
      }
      time("jac/4_full")(DedupOps.jaccardPairs(docs, 0.5))
      time("jac/5_groups")(DedupOps.dedupGroups(docs, DedupOps.jaccardPairs(docs, 0.5)))
      // window-based prefix variant (A/B against jac/3): df by a window
      // count over s, per-doc prefix by row_number over (df, s)
      val threshold = 0.5
      def prefixWin(sets: DataFrame) = {
        val ex = sets.selectExpr("doc_id", "n_sh", "explode(sh) as s")
        val cmin =
          s"""greatest(1L, case
             |  when cast(c0 - 1 as double) / n_sh >= cast($threshold as double) then c0 - 1
             |  when cast(c0 as double) / n_sh >= cast($threshold as double) then c0
             |  else c0 + 1 end)""".stripMargin
        ex.withColumn("df", count(lit(1)).over(
            org.apache.spark.sql.expressions.Window.partitionBy("s")))
          .withColumn("rn", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
              .orderBy(col("df"), col("s"))))
          .withColumn("c0", expr(s"cast(ceil($threshold * n_sh) as bigint)"))
          .filter(col("rn") <= expr(s"n_sh - ($cmin) + 1"))
          .select("doc_id", "s")
      }
      def shingledP(d: DataFrame) = shingled(d)
      time("jac/6_prefix_win")(prefixWin(shingledP(docs)))
      time("jac/7_prefix_agg") {
        val sets = shingledP(docs)
        val ex = sets.selectExpr("doc_id", "n_sh", "explode(sh) as s")
        val freq = ex.groupBy("s").agg(count(lit(1)).as("df"))
        val cmin =
          s"""greatest(1L, case
             |  when cast(c0 - 1 as double) / n_sh >= cast($threshold as double) then c0 - 1
             |  when cast(c0 as double) / n_sh >= cast($threshold as double) then c0
             |  else c0 + 1 end)""".stripMargin
        ex.join(freq, "s")
          .groupBy(col("doc_id"), col("n_sh"))
          .agg(expr("sort_array(collect_list(struct(df, s)))").as("os"))
          .withColumn("c0", expr(s"cast(ceil($threshold * n_sh) as bigint)"))
          .selectExpr("doc_id", "os", "n_sh", s"$cmin as cmin")
          .selectExpr("doc_id",
            "transform(slice(os, 1, cast(n_sh - cmin + 1 as int)), x -> x.s) as ps")
          .selectExpr("doc_id", "explode(ps) as s")
      }
      time("jac/8_prefix_win2")(prefixWin(shingledP(docs)))
      // FULL-op A/B: old aggregate-prefix jaccardPairs rebuilt inline vs
      // the current DedupOps (window prefix) — alternating, same JVM
      def fullAgg() = {
        val sets = shingledP(docs).persist()
        val ex = sets.selectExpr("doc_id", "n_sh", "explode(sh) as s")
        val freq = ex.groupBy("s").agg(count(lit(1)).as("df"))
        val cmin =
          s"""greatest(1L, case
             |  when cast(c0 - 1 as double) / n_sh >= cast($threshold as double) then c0 - 1
             |  when cast(c0 as double) / n_sh >= cast($threshold as double) then c0
             |  else c0 + 1 end)""".stripMargin
        val prefix = ex.join(freq, "s")
          .groupBy(col("doc_id"), col("n_sh"))
          .agg(expr("sort_array(collect_list(struct(df, s)))").as("os"))
          .withColumn("c0", expr(s"cast(ceil($threshold * n_sh) as bigint)"))
          .selectExpr("doc_id", "os", "n_sh", s"$cmin as cmin")
          .selectExpr("doc_id",
            "transform(slice(os, 1, cast(n_sh - cmin + 1 as int)), x -> x.s) as ps")
          .selectExpr("doc_id", "explode(ps) as s")
        val cand = prefix.as("a")
          .join(prefix.as("b"), expr("a.s = b.s and a.doc_id < b.doc_id"))
          .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
          .distinct()
        cand
          .join(sets.selectExpr("doc_id as doc_a", "sh as sha", "n_sh as na"), Seq("doc_a"))
          .join(sets.selectExpr("doc_id as doc_b", "sh as shb", "n_sh as nb"), Seq("doc_b"))
          .selectExpr("doc_a", "doc_b",
            "cast(size(array_intersect(sha, shb)) as bigint) as inter", "na", "nb")
          .selectExpr("doc_a", "doc_b",
            "cast(inter as double) / (na + nb - inter) as jaccard")
          .filter(col("jaccard") >= threshold)
          .orderBy("doc_a", "doc_b")
      }
      time("jac/9_full_agg")(fullAgg())
      time("jac/10_full_win")(DedupOps.jaccardPairs(docs, 0.5))
      time("jac/11_full_agg2")(fullAgg())
      time("jac/12_full_win2")(DedupOps.jaccardPairs(docs, 0.5))
      time("jac/13_groups_win")(DedupOps.dedupGroups(docs, DedupOps.jaccardPairs(docs, 0.5)))
    }

    if (fams("importance")) {
      import graft.ops.PipelineOps
      time("imp/1_weights")(PipelineOps.importanceWeights(docs))
      time("imp/2_resample")(PipelineOps.importanceResample(docs))
      time("imp/3_full")(PipelineOps.pipelineFull(docs))
      time("imp/4_curate")(PipelineOps.curate(docs))
      // A/B: curate with the scrubbed relation materialized once (the
      // pii regex chain is consumed by textStats, the semi-join and the
      // bench filter)
      def curateCk(minQuality: Double = 0.25, benchMod: Long = 7, n: Int = 8) = {
        val scrubbed = graft.ops.TextOps.piiScrub(docs)
          .selectExpr("doc_id", "clean_text as text").localCheckpoint()
        val q = graft.ops.TextOps.textStats(scrubbed)
          .filter(col("quality_score") >= minQuality).select("doc_id")
        val cands = scrubbed.join(q, Seq("doc_id"), "left_semi")
          .filter(col("doc_id") % benchMod =!= 0)
        val bench = scrubbed.filter(col("doc_id") % benchMod === 0)
        val cut = graft.ops.DedupOps.contaminationCut(cands, bench, n)
        val w = org.apache.spark.sql.expressions.Window.partitionBy(col("clean_text"))
        cut.withColumn("keeper", min(col("doc_id")).over(w))
          .filter(col("doc_id") === col("keeper"))
          .select("doc_id", "clean_text", "n_cut", "n_kept")
          .orderBy("doc_id")
      }
      time("imp/5_curate_ck")(curateCk())
      time("imp/6_curate2")(PipelineOps.curate(docs))
      time("imp/7_curate_ck2")(curateCk())
    }

    if (fams("textrank")) {
      import graft.ops.{GraphOps, TextOps}
      time("tr/1_edges") {
        val words = docs.selectExpr(s"${TextOps.wordsExpr("text")} as w")
        val adj = words
          .selectExpr(
            """explode(case when size(w) >= 2
              |  then transform(sequence(0, size(w) - 2),
              |                 i -> struct(w[i] as a, w[i + 1] as b))
              |  else array() end) as p""".stripMargin)
          .selectExpr("p.a as a", "p.b as b")
          .filter("a <> '' and b <> '' and a <> b")
        adj.selectExpr("a as src", "b as dst")
          .union(adj.selectExpr("b as src", "a as dst"))
          .groupBy("src", "dst").agg(count(lit(1)).as("w"))
      }
      time("tr/2_full")(GraphOps.textRank(docs))
      def edges = {
        val words = docs.selectExpr(s"${TextOps.wordsExpr("text")} as w")
        val adj = words
          .selectExpr(
            """explode(case when size(w) >= 2
              |  then transform(sequence(0, size(w) - 2),
              |                 i -> struct(w[i] as a, w[i + 1] as b))
              |  else array() end) as p""".stripMargin)
          .selectExpr("p.a as a", "p.b as b")
          .filter("a <> '' and b <> '' and a <> b")
        adj.selectExpr("a as src", "b as dst")
          .union(adj.selectExpr("b as src", "a as dst"))
          .groupBy("src", "dst").agg(count(lit(1)).as("w"))
      }
      time("tr/3_pr_shuffle")(GraphOps.pageRank(edges, 10, broadcastMaxNodes = 0L))
      time("tr/4_pr_bcast")(GraphOps.pageRank(edges, 10))
      time("tr/5_pr_shuffle2")(GraphOps.pageRank(edges, 10, broadcastMaxNodes = 0L))
      time("tr/6_pr_bcast2")(GraphOps.pageRank(edges, 10))
    }

    if (fams("ivfpq")) {
      import graft.ops.ClusterOps
      time("pq/1_kmeansAssign")(ClusterOps.kmeansAssign(emb, k = 8, iters = 2))
      time("pq/2_pqcodes")(ClusterOps.pqCodes(emb, dim = 64, m = 4, ksub = 8, iters = 2))
      time("pq/3_pqTopK")(ClusterOps.pqTopK(emb, 64, 4, 8, 2, 5, 20))
      time("pq/4_pqTopKIvf")(ClusterOps.pqTopKIvf(emb, 64, 4, 8, 8, 2, 2, 5, 20))
      time("pq/5_pqTopKIvfRes")(ClusterOps.pqTopKIvfRes(emb, 64, 4, 8, 8, 2, 2, 5, 20))
      time("pq/6_semantic")(ClusterOps.semanticPairs(emb, k = 8, iters = 2,
        threshold = 0.95, maxClusterSize = 4096))
    }

    if (fams("bpe")) {
      import graft.ops.TextOps
      time("bpe/1_train")(TextOps.bpeTrain(docs))
      time("bpe/2_token_count")(TextOps.bpeTokenCount(docs))
      time("bpe/3_word_counts")(
        docs.selectExpr(s"explode(${TextOps.wordsExpr("text")}) as word")
          .where("word <> ''")
          .groupBy("word").agg(count(lit(1)).as("c")))
    }

    if (fams("containment")) {
      import graft.ops.DedupOps
      time("cont/1_full")(DedupOps.containmentPairs(docs, 0.7))
    }

    if (fams("misc")) {
      import graft.ops.{TextOps, ProfileOps}
      def events = graft.Tables.load(spark, sfDir, "events")
      time("misc/1_cdc_dedup")(TextOps.cdcDedup(docs))
      time("misc/2_session_stats")(ProfileOps.sessionStats(events))
      time("misc/3_pmi")(TextOps.pmiCollocations(docs))
      time("misc/4_cdc_chunks")(TextOps.cdcChunks(docs))
      def lineitem = graft.Tables.load(spark, sfDir, "lineitem")
      def basketEdges = {
        val l = lineitem.select("l_orderkey", "l_partkey").distinct()
        l.toDF("o", "pa").join(l.toDF("o", "pb"), Seq("o"))
          .filter(col("pa") < col("pb"))
          .groupBy("pa", "pb").agg(count(lit(1)).as("sup"))
          .filter(col("sup") >= 2)
          .selectExpr("pa as a", "pb as b")
      }
      time("misc/5_triangles")(graft.ops.GraphOps.triangles(basketEdges))
      time("misc/6_triangles_epersist") {
        val e = basketEdges
          .selectExpr("cast(a as bigint) as a", "cast(b as bigint) as b")
          .persist()
        val deg = e.selectExpr("a as v").union(e.selectExpr("b as v"))
          .groupBy("v").agg(count(lit(1)).as("d"))
        val oriented = e
          .join(deg.selectExpr("v as a", "d as da"), "a")
          .join(deg.selectExpr("v as b", "d as db"), "b")
          .selectExpr(
            "case when da < db or (da = db and a < b) then a else b end as src",
            "case when da < db or (da = db and a < b) then b else a end as dst",
            "case when da < db or (da = db and a < b) then da else db end as dsrc",
            "case when da < db or (da = db and a < b) then db else da end as ddst")
          .persist()
        val tri = oriented.as("e1")
          .join(oriented.as("e2"),
            expr("""e1.src = e2.src and
                    |(e1.ddst < e2.ddst or (e1.ddst = e2.ddst and e1.dst < e2.dst))""".stripMargin))
          .selectExpr("e1.src as u", "e1.dst as x", "e2.dst as y")
          .join(oriented.as("e3"), expr("x = e3.src and y = e3.dst"), "leftsemi")
          .selectExpr("array_sort(array(u, x, y)) as t")
          .selectExpr("t[0] as v1", "t[1] as v2", "t[2] as v3")
          .orderBy("v1", "v2", "v3")
          .localCheckpoint()
        oriented.unpersist(); e.unpersist()
        tri
      }
      time("misc/7_triangles2")(graft.ops.GraphOps.triangles(basketEdges))
    }

    spark.stop()
  }
}
