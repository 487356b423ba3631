package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.Tables

/** Measures the PQ family's parameter laws (SCALE.md "Product
  * quantization"): for each (m, ks, shortlist) configuration, times
  * [[Dedup.pqSearchRerank]] end-to-end (encode + ADC + re-rank) and
  * scores top-5 recall against the exact quantized-metric baseline
  * computed ONCE per run (the full 64-dim distance is independent of
  * the subspace split, so one baseline serves every configuration).
  * The trades being measured: ks raises per-vector encode cost
  * (n·m·ks) and table size but refines cells; m trades code size
  * (m·log₂ks bits) against subspace resolution; shortlist trades the
  * exact-scored candidate count against capture. Prints one JSON line
  * per configuration.
  *
  * Usage: `tools/run_main.sh graft.PqLab <sfDir>`
  */
object PqLab {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-pqlab")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorExpressions.ensureRegistered(spark)
    val emb = Tables(spark, dir).embeddings
    val pred = col("vec_id") < 10

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def sets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (q, rs) => q -> rs.map(_._2).toSet }

    val (exact, tExact) = timed(
      sets(Dedup.pqQuantizedExactTopK(emb, "vec_id", "embedding", pred, topK = 5)))
    println(s"""{"metric":"pq_exact_topk","sec":$tExact,"sf":"$dir"}""")

    // (m, ks, shortlist); m·subDim = 64 throughout
    val configs = Seq(
      (8, 16, 20), (8, 16, 50), (8, 16, 100),
      (8, 64, 50), (16, 16, 50), (4, 16, 50))
    for ((m, ks, sl) <- configs) {
      val subDim = 64 / m
      val (got, t) = timed(sets(Dedup.pqSearchRerank(
        emb, "vec_id", "embedding", pred, topK = 5, shortlist = sl,
        m = m, subDim = subDim, ks = ks)))
      val recall = exact.keys.toSeq
        .map(q => got.getOrElse(q, Set.empty).intersect(exact(q)).size).sum.toDouble /
        (exact.size * 5)
      val bits = m * (math.log(ks) / math.log(2)).round
      println(s"""{"metric":"pq_rerank","m":$m,"ks":$ks,"shortlist":$sl,""" +
        s""""code_bits":$bits,"sec":$t,"recall":$recall,"sf":"$dir"}""")
    }

    // codebook-source comparison (seed vs Lloyd-trained) at the default
    // 8×16 shape: ADC-only top-5 recall is the sharpest codebook-quality
    // readout (re-rank recall is shortlist-dominated — the round-9
    // finding); total encode distortion is the quantity Lloyd provably
    // never increases. Run against a `GenSf --clustered` directory for
    // the realistic-corpus numbers; the driver's near-uniform vectors
    // are the quantizer's pinned worst case.
    def recallOf(got: Map[Long, Set[Long]]): Double =
      exact.keys.toSeq
        .map(q => got.getOrElse(q, Set.empty).intersect(exact(q)).size).sum.toDouble /
        (exact.size * 5)
    def adcRecall(book: Option[org.apache.spark.sql.DataFrame]): (Double, Double) = {
      val (got, t) = timed(sets(
        Dedup.pqSearch(emb, "vec_id", "embedding", pred, topK = 5, book = book)))
      (recallOf(got), t)
    }
    // re-rank recall is the PRODUCTION metric — on clustered corpora
    // ADC-only top-5 is tie-limited within a cluster (all members share
    // codes), so shortlist capture + exact re-rank is where codebook
    // quality actually lands
    def rerankRecall(book: Option[org.apache.spark.sql.DataFrame]): Double =
      recallOf(sets(Dedup.pqSearchRerank(
        emb, "vec_id", "embedding", pred, topK = 5, shortlist = 50, book = book)))
    def distortion(book: org.apache.spark.sql.DataFrame): Long =
      Dedup.pqEncode(emb, "vec_id", "embedding", book)
        .join(book.select(col("cent_id").as("code"), col("ce")), "code")
        .join(emb.select(col("vec_id"), col("embedding")), "vec_id")
        .select(expr("pq_subdist(embedding, ce, sub, 8)").as("d"))
        .agg(sum("d")).head().getLong(0)
    // ks ∈ {16, 64}: on tight clusters ks is the RESOLUTION lever (a
    // 16-entry book can't subdivide 32 clusters, and the subspace
    // count m can't either — splitting dimensions splits every cluster
    // the same way), so the trained-vs-seed comparison runs at both
    // the default and the resolving codebook size
    for (ks <- Seq(16, 64)) {
      def row(source: String, iters: Int, tTrain: Double,
          book: org.apache.spark.sql.DataFrame): Unit = {
        val (r, t) = adcRecall(Some(book))
        println(s"""{"metric":"pq_codebook","source":"$source","ks":$ks,""" +
          s""""iters":$iters,"train_sec":$tTrain,"sec":$t,"adc_recall":$r,""" +
          s""""rerank_recall":${rerankRecall(Some(book))},""" +
          s""""distortion":${distortion(book)},"sf":"$dir"}""")
      }
      row("seed", 0, 0.0,
        Dedup.pqCodebook(emb, "vec_id", "embedding", ks).transform(graft.plans.Pin.pin))
      for (iters <- Seq(1, 2)) {
        val (book, tTrain) = timed(
          Dedup.pqCodebookLloyd(emb, "vec_id", "embedding", iters, ks = ks)
            .transform(graft.plans.Pin.pin))
        row("lloyd", iters, tTrain, book)
      }
    }

    // SQ8's point on the same recall/time axes — the 8×-compression
    // scalar quantizer (512-bit codes vs PQ's 32): flat decode-scan
    // (the x160 shape, expected ~exact recall at ~n·d scan cost) and
    // IVF-routed (the x163 shape, where cell capture is the only loss).
    val (sqGot, tSq) = timed(sets(
      Dedup.sqSearch(emb, "vec_id", "embedding", pred, topK = 5)))
    println(s"""{"metric":"sq8_flat","code_bits":512,"sec":$tSq,""" +
      s""""recall":${recallOf(sqGot)},"sf":"$dir"}""")
    val n = emb.count()
    val k = math.max(16, math.sqrt(n.toDouble).toInt)
    val kc = math.max(4, math.sqrt(k.toDouble).toInt)
    val (ivfGot, tIvf) = timed(sets(Dedup.ivfSqSearch(
      emb, "vec_id", "embedding", pred, k = k, nprobe = 4, topK = 5, kc = kc)))
    println(s"""{"metric":"sq8_ivf","k":$k,"nprobe":4,"sec":$tIvf,""" +
      s""""recall":${recallOf(ivfGot)},"sf":"$dir"}""")
    val (rrGot, tRr) = timed(sets(Dedup.sqSearchRerank(
      emb, "vec_id", "embedding", pred, topK = 5, shortlist = 50)))
    println(s"""{"metric":"sq8_rerank","shortlist":50,"sec":$tRr,""" +
      s""""recall":${recallOf(rrGot)},"sf":"$dir"}""")

    // binary quantization's point — the 64-bit sign-code rung (256×
    // under float32): flat Hamming (the x169 shape, tie-band-limited
    // by 65 distance values) and Hamming shortlist + exact re-rank
    // (the x170 shape) at the family's shared shortlist sizes, so the
    // three quantizers land on one comparable (code_bits, sec, recall)
    // table.
    val (bqGot, tBq) = timed(sets(
      Dedup.bqSearch(emb, "vec_id", "embedding", pred, topK = 5)))
    println(s"""{"metric":"bq_flat","code_bits":64,"sec":$tBq,""" +
      s""""recall":${recallOf(bqGot)},"sf":"$dir"}""")
    for (sl <- Seq(20, 50, 100)) {
      val (got, t) = timed(sets(Dedup.bqSearchRerank(
        emb, "vec_id", "embedding", pred, topK = 5, shortlist = sl)))
      println(s"""{"metric":"bq_rerank","shortlist":$sl,"sec":$t,""" +
        s""""recall":${recallOf(got)},"sf":"$dir"}""")
    }
    spark.stop()
  }
}
