package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.Tables

/** Measures the IVF family's k-scaling law (SCALE.md's "raise k ∝ √n to
  * hold probe work flat" claim): for each requested cell count k, times
  * the three registered IVF consumers — x143's cell-blocked near-dup
  * pair generation, x137's clustering lists (nprobe=2, topK=3) and
  * x138's hubness lists (nprobe=2, topK=5) — and scores recall against
  * the exact baselines (all-pairs cosine ≥ 0.4 for pairs; exact top-5
  * lists for search) computed ONCE per run. Prints one JSON line per
  * (k, metric) so `tools/scaling_report.py`-style tooling can diff runs
  * across SF directories.
  *
  * Usage: `tools/run_main.sh graft.KScale <sfDir> <k1,k2,...> [--no-exact]`
  * (`--no-exact` skips the quadratic baselines — for very large dirs
  * where only the cost curve is wanted).
  */
object KScale {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val ks = args(1).split(",").map(_.trim.toInt).toSeq
    val withExact = !args.contains("--no-exact")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-kscale")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorExpressions.ensureRegistered(spark)
    val emb = Tables(spark, dir).embeddings

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // exact baselines, computed once; localCheckpoint so each recall
    // join reads materialized rows instead of re-running the O(n²) scan
    val exact: Option[(DataFrame, Long, Double, DataFrame, Long, Double)] =
      if (!withExact) None
      else {
        val (pairs, tPairs) = timed {
          val p = Dedup.embeddingNearDups(emb, "vec_id", "embedding", 0.4)
            .select("vec_a", "vec_b").transform(graft.plans.Pin.pin)
          (p, p.count())
        }
        val (lists, tLists) = timed {
          val l = Dedup.annTopK(emb, "vec_id", "embedding", lit(true), k = 5)
            .select("query_id", "neighbor_id").transform(graft.plans.Pin.pin)
          (l, l.count())
        }
        Some((pairs._1, pairs._2, tPairs, lists._1, lists._2, tLists))
      }
    exact.foreach { case (_, nPairs, tPairs, _, nLists, tLists) =>
      println(s"""{"k":"exact","op":"pairs_0.4","sec":$tPairs,"rows":$nPairs}""")
      println(s"""{"k":"exact","op":"top5_lists","sec":$tLists,"rows":$nLists}""")
    }

    for (k <- ks) {
      val (ivfPairs, tPair) = timed {
        val p = Dedup.embeddingNearDupsIvf(emb, "vec_id", "embedding", 0.4, k)
          .select("vec_a", "vec_b").transform(graft.plans.Pin.pin)
        (p, p.count())
      }
      val pairRecall = exact.map { case (ep, nEp, _, _, _, _) =>
        if (nEp == 0) 1.0
        else ivfPairs._1.join(ep, Seq("vec_a", "vec_b"), "left_semi").count().toDouble / nEp
      }
      println(s"""{"k":$k,"op":"x143_pairs","sec":$tPair,"rows":${ivfPairs._2},""" +
        s""""recall":${pairRecall.map(_.toString).getOrElse("null")}}""")

      val (ivfPairs2, tPair2) = timed {
        val p = Dedup.embeddingNearDupsIvf(emb, "vec_id", "embedding", 0.4, k,
          nassign = 2)
          .select("vec_a", "vec_b").transform(graft.plans.Pin.pin)
        (p, p.count())
      }
      val pairRecall2 = exact.map { case (ep, nEp, _, _, _, _) =>
        if (nEp == 0) 1.0
        else ivfPairs2._1.join(ep, Seq("vec_a", "vec_b"), "left_semi").count().toDouble / nEp
      }
      println(s"""{"k":$k,"op":"x143_pairs_nassign2","sec":$tPair2,"rows":${ivfPairs2._2},""" +
        s""""recall":${pairRecall2.map(_.toString).getOrElse("null")}}""")

      val kc = math.max(2, math.sqrt(k.toDouble).round.toInt)
      val (ivfPairs2L, tPair2L) = timed {
        val p = Dedup.embeddingNearDupsIvfTwoLevel(emb, "vec_id", "embedding",
          0.4, k, kc)
          .select("vec_a", "vec_b").transform(graft.plans.Pin.pin)
        (p, p.count())
      }
      val pairRecall2L = exact.map { case (ep, nEp, _, _, _, _) =>
        if (nEp == 0) 1.0
        else ivfPairs2L._1.join(ep, Seq("vec_a", "vec_b"), "left_semi").count().toDouble / nEp
      }
      println(s"""{"k":$k,"kc":$kc,"op":"x148_pairs_2level","sec":$tPair2L,""" +
        s""""rows":${ivfPairs2L._2},""" +
        s""""recall":${pairRecall2L.map(_.toString).getOrElse("null")}}""")

      val (lists5, tLists5) = timed {
        val l = Dedup.ivfSearch(emb, "vec_id", "embedding", lit(true),
          k = k, nprobe = 2, topK = 5)
          .select("query_id", "neighbor_id").transform(graft.plans.Pin.pin)
        (l, l.count())
      }
      val listRecall = exact.map { case (_, _, _, el, nEl, _) =>
        if (nEl == 0) 1.0
        else lists5._1.join(el, Seq("query_id", "neighbor_id"), "left_semi")
          .count().toDouble / nEl
      }
      println(s"""{"k":$k,"op":"x138_lists_top5","sec":$tLists5,"rows":${lists5._2},""" +
        s""""recall":${listRecall.map(_.toString).getOrElse("null")}}""")

      // x137's full pipeline (lists → mutual edges → CC) at this k —
      // the end-to-end cost the clustering consumer actually pays
      val (nCc, tCc) = timed {
        val lists = Dedup.ivfSearch(emb, "vec_id", "embedding", lit(true),
          k = k, nprobe = 2, topK = 3)
        val edges = Dedup.mutualEdgesFromTopK(lists)
        val cc = Dedup.connectedComponents(edges, "u", "v", maxIter = 256)
        val n = cc.count()
        n
      }
      println(s"""{"k":$k,"op":"x137_full","sec":$tCc,"rows":$nCc}""")
    }
    spark.stop()
  }
}
