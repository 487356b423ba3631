package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scratch micro-bench for aggregation strategies (not part of the driver
  * contract; used to pick implementations with data, not guesses). */
object BenchLab {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val builder = SparkSession.builder()
      .master("local[32]")
      .appName("graft-benchlab")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("LAB_PARTS", "32"))
      .config("spark.sql.adaptive.enabled",
        if (sys.env.get("LAB_AQE").contains("0")) "false" else "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // LAB_EXTENSIONS=1 reproduces the Bench/Verify session shape
    // (GraftExtensions active) so rule effects can be A/B-timed
    val spark = (if (sys.env.get("LAB_EXTENSIONS").contains("1"))
      builder.config("spark.sql.extensions", "graft.GraftExtensions")
    else builder).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.sources.Tables
    val t = Tables(spark, sfDir)
    val li = t.lineitem

    def time(name: String)(f: => DataFrame): Unit = {
      f.write.format("noop").mode("overwrite").save() // warm
      val runs = (1 to sys.env.getOrElse("LAB_RUNS", "3").toInt).map { _ =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[lab] $name%-28s min=${runs.min}%.3f  runs=${runs.map(r => f"$r%.3f").mkString(",")}")
    }

    // generic single-query timing: LAB_MODE=q LAB_QUERY=<registered name>
    if (sys.env.get("LAB_MODE").contains("q")) {
      val name = sys.env("LAB_QUERY")
      val fn = SparkEntry.queries(name)
      time(name) { fn(spark, sfDir) }
      spark.stop(); return
    }

    // deterministic fixed-cost profile: LAB_MODE=jobs LAB_QUERY=<names,>
    // counts Spark jobs/stages/tasks per execution — the scheduling
    // overhead that dominates sub-second queries, measured without
    // wall-clock noise
    if (sys.env.get("LAB_MODE").contains("jobs")) {
      import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
      val jobs = new java.util.concurrent.atomic.AtomicInteger
      val stages = new java.util.concurrent.atomic.AtomicInteger
      val tasks = new java.util.concurrent.atomic.AtomicInteger
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
        override def onStageCompleted(s: SparkListenerStageCompleted): Unit = stages.incrementAndGet()
        override def onTaskEnd(t: SparkListenerTaskEnd): Unit = tasks.incrementAndGet()
      })
      sys.env("LAB_QUERY").split(",").foreach { name =>
        val fn = SparkEntry.queries(name)
        fn(spark, sfDir).write.format("noop").mode("overwrite").save() // warm
        Thread.sleep(300) // let the listener bus drain
        jobs.set(0); stages.set(0); tasks.set(0)
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        Thread.sleep(300)
        println(s"[lab] $name jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get}")
      }
      spark.stop(); return
    }

    if (sys.env.get("LAB_MODE").contains("x17")) {
      val fn = SparkEntry.queries("x17_pivot_conditional")
      time("x17 pivot") { fn(spark, sfDir) }
      val types = Seq("click", "view", "purchase", "signup", "error")
      val ev = t.events
      time("x17 scan+count floor") {
        ev.groupBy(col("user_id")).agg(count(lit(1)).as("n"))
      }
      time("x17 plain double sums") {
        val aggs = types.flatMap { ty =>
          Seq(
            sum(when(col("event_type") === ty, lit(1)).otherwise(lit(0))).as(s"n_$ty"),
            sum(when(col("event_type") === ty, col("value"))).as(s"sum_$ty"))
        }
        ev.groupBy(col("user_id")).agg(aggs.head, aggs.tail: _*)
      }
      time("x17 decimal sums") {
        val aggs = types.flatMap { ty =>
          Seq(
            sum(when(col("event_type") === ty, lit(1)).otherwise(lit(0))).as(s"n_$ty"),
            sum(when(col("event_type") === ty, col("value").cast("decimal(18,4)")))
              .cast("double").as(s"sum_$ty"))
        }
        ev.groupBy(col("user_id")).agg(aggs.head, aggs.tail: _*)
      }
      time("x17 limb sums") {
        import graft.functions.Exact
        val aggs = types.flatMap { ty =>
          val u = when(col("event_type") === ty, Exact.unscaledLong(col("value"), 4))
          Exact.countIf(col("event_type") === ty).as(s"n_$ty") +: Exact.limbAggs(s"s_$ty", u)
        }
        ev.groupBy(col("user_id")).agg(aggs.head, aggs.tail: _*)
          .select(col("user_id") +: types.flatMap { ty =>
            Seq(col(s"n_$ty"), Exact.limbSumDouble(s"s_$ty").as(s"sum_$ty"))
          }: _*)
      }
      spark.stop(); return
    }

    if (sys.env.get("LAB_MODE").contains("x35")) {
      graft.functions.PolyHashFunctions.ensureRegistered(spark)
      import graft.operators.Dedup
      time("x35 as-is") {
        Dedup.minhashCandidatePairs(t.documents, "doc_id", "text", 0.5)
      }
      time("x35 checkpointed shingles") {
        val sh = Dedup.shingles(t.documents, "doc_id", "text", 3).transform(graft.plans.Pin.pin)
        val sigs = Dedup.minhashSignaturesFromShingles(sh, "doc_id").transform(graft.plans.Pin.pin)
        val bandStructs = (0 until 4).map { k =>
          struct(lit(k).as("band"), col(s"band$k").as("key"))
        }
        val keys = sigs
          .select(col("doc_id"), explode(array(bandStructs: _*)).as("bk"))
          .select(col("doc_id"), col("bk.band"), col("bk.key"))
        val a = keys.select(col("doc_id").as("doc_a"), col("band"), col("key"))
        val b = keys.select(col("doc_id").as("doc_b"), col("band"), col("key"))
        val cand = a.join(b, Seq("band", "key"))
          .filter(col("doc_a") < col("doc_b"))
          .select("doc_a", "doc_b")
          .distinct()
        val counts = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
        val common = cand
          .join(sh.select(col("doc_id").as("doc_a"), col("sh")), Seq("doc_a"))
          .join(sh.select(col("doc_id").as("doc_b"), col("sh")), Seq("doc_b", "sh"))
          .groupBy(col("doc_a"), col("doc_b"))
          .agg(count(lit(1)).as("common"))
        common
          .join(counts.select(col("doc_id").as("doc_a"), col("n").as("na")), Seq("doc_a"))
          .join(counts.select(col("doc_id").as("doc_b"), col("n").as("nb")), Seq("doc_b"))
          .withColumn("jaccard",
            col("common").cast("double") / (col("na") + col("nb") - col("common")))
          .filter(col("jaccard") >= 0.5)
          .select("doc_a", "doc_b", "common", "jaccard")
      }
      spark.stop(); return
    }

    if (sys.env.get("LAB_MODE").contains("g06")) {
      import graft.operators.GoldAnalogs
      val fn = SparkEntry.queries("g06_recommendations")
      time("g06 full") { fn(spark, sfDir) }
      time("g06 weak side") {
        GoldAnalogs.weaknesses(t)
          .filter(col("resultado") === "Debilidad")
          .select("season2", "weakness_type")
      }
      time("g06 targets side") { GoldAnalogs.recTargets(t) }
      time("g06 bcast targets") {
        GoldAnalogs.weaknesses(t)
          .filter(col("resultado") === "Debilidad")
          .select("season2", "weakness_type")
          .join(broadcast(GoldAnalogs.recTargets(t)), "weakness_type")
      }
      time("g03 reference") { SparkEntry.queries("g03_team_weakness_unpivot")(spark, sfDir) }
      time("g06 full (late)") { fn(spark, sfDir) }
      spark.stop(); return
    }

    if (sys.env.get("LAB_MODE").contains("x33")) {
      time("x33 cc clusters") {
        val pairs = graft.operators.Dedup.ngramJaccardPairs(t.documents, "doc_id", "text", 0.5)
        graft.operators.Dedup.connectedComponents(pairs, "doc_a", "doc_b")
      }
      time("pairs naive t=0.5") {
        graft.operators.Dedup.ngramJaccardPairs(t.documents, "doc_id", "text", 0.5)
      }
      time("pairs prefix t=0.5") {
        graft.operators.Dedup.ngramJaccardPairsPrefix(t.documents, "doc_id", "text", 0.5)
      }
      spark.stop(); return
    }

    if (sys.env.get("LAB_MODE").contains("x02reuse")) {
      val df = graft.operators.Dedup.ngramJaccardPairs(t.documents, "doc_id", "text", 0.05)
      df.write.format("noop").mode("overwrite").save()
      time("x02 as-is") {
        graft.operators.Dedup.ngramJaccardPairs(t.documents, "doc_id", "text", 0.05)
      }
      // variant: materialize the distinct shingle set once
      def pairsCached(): DataFrame = {
        val sh = graft.operators.Dedup.shingles(t.documents, "doc_id", "text", 3)
          .transform(graft.plans.Pin.pin)
        val counts = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
        val a = sh.select(col("doc_id").as("doc_a"), col("sh"))
        val b = sh.select(col("doc_id").as("doc_b"), col("sh"))
        val pairs = a.join(b, a("sh") === b("sh") && col("doc_a") < col("doc_b"))
          .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("common"))
        val ca = counts.select(col("doc_id").as("ca_id"), col("n").as("na"))
        val cb = counts.select(col("doc_id").as("cb_id"), col("n").as("nb"))
        pairs.join(ca, col("doc_a") === col("ca_id"))
          .join(cb, col("doc_b") === col("cb_id"))
          .withColumn("jaccard",
            col("common").cast("double") / (col("na") + col("nb") - col("common")))
          .filter(col("jaccard") >= 0.05)
          .select("doc_a", "doc_b", "common", "jaccard")
      }
      time("x02 checkpointed sh") { pairsCached() }
      spark.stop(); return
    }

    if (sys.env.get("LAB_MODE").contains("topk")) {
      import org.apache.spark.sql.expressions.Window
      val keys = Seq("l_suppkey")
      val orders = Seq(("l_extendedprice", false), ("l_orderkey", true), ("l_linenumber", true))
      time("topk window form") {
        val w = Window.partitionBy(keys.map(col): _*)
          .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc, col("l_linenumber").asc)
        li.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= 5).drop("__rn")
      }
      time("topk pruned form") {
        graft.operators.Ranks.topKPerGroup(li, keys, orders, 5)
      }
      spark.stop(); return
    }

    // round-18 registry accounting (verdict items 3 + 5): one row per
    // BATCH registry — build+pin wall on first access (derived layouts
    // measured INCREMENTALLY, after their base stands), pinned rows,
    // and pinned bytes (block-manager storage delta around the build —
    // the honest localCheckpoint footprint, not an estimator) — then
    // the per-consumer steady-state wall against the standing
    // registries. Run at sf0.1 and at a GenSf sf1 dir to check the
    // sub-corpus-bounded rule an order of magnitude up: co-purchase
    // pairs must grow ~linearly (Σ c(k,2), k ≤ 7 per order), near-dup
    // pairs with the near-duplicate edge count, never corpus².
    if (sys.env.get("LAB_MODE").contains("registries")) {
      import graft.operators.TrainingData
      def storedBytes: Long =
        spark.sparkContext.getRDDStorageInfo.map(i => i.memSize + i.diskSize).sum
      val regs: Seq[(String, () => DataFrame)] = Seq(
        ("copurchase_pairs_w", () => TrainingData.coPurchasePairs(t)),
        ("copurchase_pairs_min2", () => TrainingData.coPurchasePairsMin2(t)),
        ("copurchase_und_by_other", () => TrainingData.coPurchaseUndByOther(t)),
        ("copurchase_und_w_by_pk", () => TrainingData.coPurchaseUndWByPk(t)),
        ("copurchase_bipartite_cp", () => TrainingData.coPurchaseBipartite(t)),
        ("neardup_pairs_ngram_t0.5", () => TrainingData.nearDupPairs(t)))
      regs.foreach { case (name, build) =>
        val b0 = storedBytes
        val t0 = System.nanoTime()
        val df = build()
        val buildS = (System.nanoTime() - t0) / 1e9
        val rows = df.count() // served from the pin
        val mib = (storedBytes - b0) / 1048576.0
        println(f"[lab] registry $name%-26s build=$buildS%7.2f s  rows=$rows%10d  pinned=$mib%8.1f MiB")
      }
      Seq("x136_copurchase_degree", "x152_copurchase_pagerank",
        "x156_label_propagation", "x157_weighted_pagerank",
        "x162_hits_authority", "x165_triangle_count",
        "x33_dedup_clusters", "x56_priority_canonical",
        "x90_cluster_size_histogram", "x91_split_leakage_audit",
        "x104_cluster_cohesion", "x107_clean_eval_sample",
        "x52_leakage_safe_split")
        .foreach(n => time(s"consumer $n") { SparkEntry.queries(n)(spark, sfDir) })
      spark.stop(); return
    }

    // round-17 compaction law across ALL SIX standing-registry streams
    // (verdict item 7): same twin-run shape as LAB_MODE=compact below,
    // one row per registry, at whatever SF dir is given (sf1 via GenSf
    // for the order-of-magnitude-up confirmation). LAB_BATCHES batches,
    // LAB_COMPACT cadence vs uncompacted; reports total wall,
    // last-quarter wall (where layouts have diverged most), and end
    // partition count for each registry.
    if (sys.env.get("LAB_MODE").contains("compact6")) {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import org.apache.spark.sql.streaming.StreamingQuery
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val nBatches = sys.env.getOrElse("LAB_BATCHES", "20").toInt
      val cadence = sys.env.getOrElse("LAB_COMPACT", "8").toInt
      val docs = t.documents.select("doc_id", "source", "text")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .sortBy(_._1)
      val docBatches = docs.grouped(math.max(docs.length / nBatches, 1))
        .map(_.toSeq).toSeq
      val textBatches = docBatches.map(_.map(d => (d._1, d._3)))
      val vecs = t.embeddings.select("vec_id", "embedding")
        .collect().map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1)
      val vecBatches = vecs.grouped(math.max(vecs.length / nBatches, 1))
        .map(_.toSeq).toSeq
      val cents = graft.operators.Dedup.ivfCentroids(
        t.embeddings, "vec_id", "embedding", k = 16)

      /** twin-run one stream; prints its compacted-vs-not row */
      def lab[T](name: String, registrySub: String,
          start: (String, Int) => (MemoryStream[T], StreamingQuery),
          batches: Seq[Seq[T]]): Unit = {
        def run(ce: Int): (Double, Double, Int) = {
          val root = java.nio.file.Files
            .createTempDirectory(s"lab6-$name-$ce").toString
          val (src, q) = start(root, ce)
          val t0 = System.nanoTime()
          var lastQuarter = 0.0
          try batches.zipWithIndex.foreach { case (b, i) =>
            val b0 = System.nanoTime()
            src.addData(b: _*); q.processAllAvailable()
            if (i >= batches.length * 3 / 4)
              lastQuarter += (System.nanoTime() - b0) / 1e9
          } finally q.stop()
          val total = (System.nanoTime() - t0) / 1e9
          val nParts = new java.io.File(s"$root/$registrySub").listFiles()
            .count(_.getName.startsWith("batch_id="))
          (total, lastQuarter, nParts)
        }
        val (tOff, qOff, pOff) = run(0)
        val (tOn, qOn, pOn) = run(cadence)
        println(s"""{"metric":"compact6","registry":"$name","batches":$nBatches,""" +
          s""""cadence":$cadence,"total_off":$tOff,"total_on":$tOn,""" +
          s""""lastq_off":$qOff,"lastq_on":$qOn,""" +
          s""""parts_off":$pOff,"parts_on":$pOn,"sf":"$sfDir"}""")
      }

      lab[(Long, String, String)]("segment", "registry",
        (root, ce) => {
          Seq.empty[(Long, Long)].toDF("h", "k")
            .write.parquet(s"$root/registry/batch_id=-1")
          val src = MemoryStream[(Long, String, String)]
          (src, graft.streaming.SegmentDedupStream.startSegmentDedup(
            src.toDF().toDF("doc_id", "source", "text"),
            s"$root/registry", s"$root/stats", s"$root/ckpt",
            compactEvery = ce))
        }, docBatches)
      lab[(Long, String)]("span", "registry",
        (root, ce) => {
          Seq.empty[(Long, Long)].toDF("h", "kk")
            .write.parquet(s"$root/registry/batch_id=-1")
          val src = MemoryStream[(Long, String)]
          (src, graft.streaming.SpanDedupStream.startSpanDedup(
            src.toDF().toDF("doc_id", "text"),
            s"$root/registry", s"$root/kept", s"$root/metrics", s"$root/ckpt",
            compactEvery = ce))
        }, textBatches)
      lab[(Long, String)]("chunk", "chunks",
        (root, ce) => {
          graft.streaming.ChunkStream.seedChunks(
            Seq.empty[(Long, String)].toDF("doc_id", "text"),
            s"$root/chunks", "doc_id", "text")
          val src = MemoryStream[(Long, String)]
          (src, graft.streaming.ChunkStream.startChunkRewrite(
            src.toDF().toDF("doc_id", "text"),
            s"$root/chunks", s"$root/rewrites", s"$root/ckpt",
            "doc_id", "text", compactEvery = ce))
        }, textBatches)
      lab[(Long, String)]("gram", "grams",
        (root, ce) => {
          graft.streaming.NoveltyStream.seedGrams(
            Seq.empty[(Long, String)].toDF("doc_id", "text"),
            s"$root/grams", "doc_id", "text")
          val src = MemoryStream[(Long, String)]
          (src, graft.streaming.NoveltyStream.startNoveltyScoring(
            src.toDF().toDF("doc_id", "text"),
            s"$root/grams", s"$root/verdicts", s"$root/ckpt",
            "doc_id", "text", compactEvery = ce))
        }, textBatches)
      lab[(Long, String)]("corpus", "corpus",
        (root, ce) => {
          Seq((1000000001L, "alpha beta gamma delta epsilon zeta"))
            .toDF("doc_id", "text").write.parquet(s"$root/corpus/batch_id=-1")
          val src = MemoryStream[(Long, String)]
          (src, graft.streaming.DedupStream.startIncrementalDedup(
            src.toDF().toDF("doc_id", "text"),
            s"$root/corpus", s"$root/verdicts", s"$root/ckpt",
            "doc_id", "text", threshold = 0.5, compactEvery = ce))
        }, textBatches)
      lab[(Long, Seq[Float])]("embedding", "registry",
        (root, ce) => {
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            org.apache.spark.sql.types.StructType.fromDDL(
              "vec_id BIGINT, cell BIGINT, embedding ARRAY<FLOAT>, nrm DOUBLE"))
            .write.parquet(s"$root/registry/batch_id=-1")
          val src = MemoryStream[(Long, Seq[Float])]
          (src, graft.streaming.EmbeddingDedupStream.startEmbeddingNearDup(
            src.toDF().toDF("vec_id", "embedding")
              .withColumn("embedding", col("embedding").cast("array<float>")),
            cents, s"$root/registry", s"$root/pairs", s"$root/ckpt",
            threshold = 0.4, compactEvery = ce))
        }, vecBatches)
      spark.stop(); return
    }

    // round-15 registry compaction: per-batch cost with/without the
    // fold over a long stream (LAB_BATCHES micro-batches, LAB_COMPACT
    // cadence vs uncompacted), timing the LAST batches where the
    // registry layouts have diverged most, plus the end file count
    if (sys.env.get("LAB_MODE").contains("compact")) {
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      import spark.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
      val nBatches = sys.env.getOrElse("LAB_BATCHES", "40").toInt
      val cadence = sys.env.getOrElse("LAB_COMPACT", "8").toInt
      val docs = t.documents.select("doc_id", "source", "text")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .sortBy(_._1)
      val batches = docs.grouped(math.max(docs.length / nBatches, 1)).toSeq
      def run(compactEvery: Int, compactMaxParts: Int = 0): (Double, Double, Int) = {
        val root = java.nio.file.Files.createTempDirectory("lab-compact").toString
        val (reg, stats, ckpt) = (s"$root/registry", s"$root/stats", s"$root/ckpt")
        Seq.empty[(Long, Long)].toDF("h", "k").write.parquet(s"$reg/batch_id=-1")
        val src = MemoryStream[(Long, String, String)]
        val q = graft.streaming.SegmentDedupStream.startSegmentDedup(
          src.toDF().toDF("doc_id", "source", "text"), reg, stats, ckpt,
          compactEvery = compactEvery, compactMaxParts = compactMaxParts)
        val t0 = System.nanoTime()
        var lastQuarter = 0.0
        try {
          batches.zipWithIndex.foreach { case (b, i) =>
            val b0 = System.nanoTime()
            src.addData(b: _*); q.processAllAvailable()
            if (i >= batches.length * 3 / 4)
              lastQuarter += (System.nanoTime() - b0) / 1e9
          }
        } finally q.stop()
        val total = (System.nanoTime() - t0) / 1e9
        val nParts = new java.io.File(reg).listFiles()
          .count(_.getName.startsWith("batch_id="))
        (total, lastQuarter, nParts)
      }
      val (tOff, qOff, pOff) = run(0)
      val (tOn, qOn, pOn) = run(cadence)
      println(f"[lab] compact off: total=$tOff%.1f last-quarter=$qOff%.1f partitions=$pOff")
      println(f"[lab] compact every $cadence: total=$tOn%.1f last-quarter=$qOn%.1f partitions=$pOn")
      // LAB_TIER=<maxParts>: third arm — the geometric size-tiered fold
      sys.env.get("LAB_TIER").map(_.toInt).filter(_ > 0).foreach { mp =>
        val (tT, qT, pT) = run(0, mp)
        println(f"[lab] compact tiered maxParts=$mp: total=$tT%.1f last-quarter=$qT%.1f partitions=$pT")
      }
      spark.stop(); return
    }

    // round-15 Multimodal promotions: HOF/expression forms (registered)
    // vs their pre-round-15 mapPartitions twins, same corpus
    if (sys.env.get("LAB_MODE").contains("mm")) {
      import spark.implicits._
      import graft.operators.Multimodal
      import graft.operators.Multimodal.{Frame, MediaFeatures, MediaRecord}
      implicit val s: SparkSession = spark
      val media = Multimodal.packMedia(t.documents)
      // registered = index-explode-then-substr (the form that won)
      time("frameSample registered (explode idx + substr)") {
        Multimodal.frameSample(media, everyN = 2).toDF()
      }
      time("frameSample mapPartitions (pre-r15)") {
        media.mapPartitions { records =>
          records.flatMap { r =>
            val n = math.max(r.meta.nFrames, 1)
            val size = math.max(r.content.length / n, 1)
            (0 until n by 2).iterator.map { i =>
              val from = i * size
              val until = math.min(from + size, r.content.length)
              Frame(r.doc_id, i, r.content.slice(from, math.max(from, until)))
            }
          }
        }.toDF()
      }
      // the rejected draft: slice every frame into a struct array, then
      // explode — materializes all frames per row before the Generate
      time("frameSample struct-array HOF (rejected draft)") {
        val n = greatest(col("meta.nFrames"), lit(1))
        val size = greatest(floor(length(col("content")) / n).cast("int"), lit(1))
        media.toDF()
          .select(col("doc_id"), col("content"), n.as("nf"), size.as("sz"))
          .select(col("doc_id"),
            explode(transform(
              sequence(lit(0), col("nf") - 1, lit(2)),
              i => struct(i.as("frame_idx"),
                col("content").substr(i * col("sz") + 1, col("sz")).as("frame"))))
              .as("f"))
          .select(col("doc_id"), col("f.frame_idx"), col("f.frame"))
      }
      time("extractFeatures exprs (registered)") {
        Multimodal.extractFeatures(media).toDF()
      }
      time("extractFeatures mapPartitions (old)") {
        media.mapPartitions { records =>
          records.map { r =>
            val (hist, emb) = (graft.functions.MediaFeatureUtil.hist16(r.content),
              graft.functions.MediaFeatureUtil.embed8(r.content))
            MediaFeatures(r.doc_id, r.content.length.toLong, hist, emb)
          }
        }.toDF()
      }
      spark.stop(); return
    }

    // splitter-shape stress at HIGH chunk counts (the fixture maxes at
    // 2 chunks/doc where the forms tie): LAB_SPLIT_DOCS docs of
    // LAB_SPLIT_TOKENS tokens each, W=64 — hundreds of chunks per doc.
    // MEASURED VERDICT (512×50k, SCALE.md "x205 splitter shape"):
    // explode-then-slice 0.4 s vs transform-then-explode 56 s (140×) —
    // codegen fuses Generate+Project so the word array is a reference,
    // while transform()'s lambda body (slice+array_join per chunk)
    // evaluates INTERPRETED. The library keeps explode-then-slice;
    // this lab re-measures the decision on demand.
    if (sys.env.get("LAB_MODE").contains("split")) {
      val nDocs = sys.env.getOrElse("LAB_SPLIT_DOCS", "512").toInt
      val nTok = sys.env.getOrElse("LAB_SPLIT_TOKENS", "50000").toInt
      val W = 64
      val docs = spark.range(nDocs).selectExpr(
        "id AS doc_id",
        s"array_join(transform(sequence(1, $nTok), i -> substr('abcdefgh', 1 + pmod(i + id, 7), 2)), ' ') AS text")
        .transform(graft.plans.Pin.pin)
      time("splitOversize library (explode-then-slice + small-path union)") {
        graft.operators.Corpus.splitOversize(docs, "doc_id", "text", W)
          .select(col("doc_id"), col("chunk_idx"),
            length(col("chunk")).as("len"))
      }
      time("explode-then-slice inline (no union)") {
        docs
          .withColumn("__words", split(col("text"), " "))
          .withColumn("__n", size(col("__words")).cast("long"))
          .withColumn("chunk_idx",
            explode(sequence(lit(0L), expr(s"(__n - 1) div $W"))))
          .select(col("doc_id"), col("chunk_idx"),
            length(array_join(
              slice(col("__words"),
                (col("chunk_idx") * W + 1).cast("int"), lit(W)),
              " ")).as("len"))
      }
      // same question for the CDC chunker: its chunk strings are built
      // inside a zip_with lambda (interpreted) — vs exploding the
      // (start, end) pairs (int-only lambda) and slicing in the fused
      // codegen projection
      graft.functions.PolyHashFunctions.ensureRegistered(spark)
      graft.functions.CdcFunctions.ensureRegistered(spark)
      time("cdcChunks library (explode-bounds since r16; was 21x slower as a string lambda)") {
        graft.operators.Corpus.cdcChunks(docs, "doc_id", "text")
          .select(col("doc_id"), col("chunk_idx"),
            length(col("chunk")).as("len"))
      }
      time("cdcChunks explode-bounds-then-slice") {
        docs
          .withColumn("words", split(col("text"), " "))
          .withColumn("n", size(col("words")).cast("long"))
          .withColumn("cuts", expr("cdc_cuts(words, 4, 16)"))
          .withColumn("b", explode(expr(
            "zip_with(concat(array(0L), transform(cuts, c -> c + 1)), " +
              "concat(cuts, array(n - 1)), (s, e) -> struct(s, e))")))
          .select(col("doc_id"),
            length(array_join(
              slice(col("words"), expr("cast(b.s as int) + 1"),
                expr("cast(b.e - b.s as int) + 1")), " ")).as("len"))
      }
      // and for word n-grams (trigram shape, the x02/blocklist currency):
      // gram strings inside the transform() lambda vs positions exploded
      // and concat_ws in the fused projection
      time("wordNgrams library (transform lambda) n=3") {
        docs.select(col("doc_id"), split(col("text"), " ").as("w"))
          .select(col("doc_id"),
            explode(graft.functions.Text.wordNgrams("w", 3)).as("sh"))
          .select(col("doc_id"), length(col("sh")).as("len"))
      }
      time("wordNgrams position-explode n=3") {
        docs.select(col("doc_id"), split(col("text"), " ").as("w"))
          .select(col("doc_id"), col("w"),
            explode(expr("CASE WHEN size(w) >= 3 THEN sequence(1, size(w) - 2) ELSE array() END")).as("i"))
          .select(col("doc_id"),
            length(expr("concat_ws(' ', element_at(w, i), element_at(w, i + 1), element_at(w, i + 2))")).as("len"))
      }
      spark.stop(); return
    }

    if (sys.env.get("LAB_MODE").contains("x02")) {
      val docs = t.documents
      time("x02 hashed shingles") {
        graft.operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.05)
      }
      time("x02 string shingles") {
        graft.operators.Dedup.ngramJaccardPairs(docs, "doc_id", "text", 0.05,
          hashShingles = false)
      }
      spark.stop(); return
    }

    val dec184 = "decimal(18,4)"
    // A: plain double sums (the inexact lower bound)
    time("double-sum x5") {
      li.groupBy(col("l_suppkey")).agg(
        sum(col("l_quantity")), sum(col("l_extendedprice")),
        sum(col("l_discount")), sum(col("l_tax")),
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
    }
    // B: decimal(18,4) sums (current Exact path)
    time("decimal-sum x4 + product") {
      li.groupBy(col("l_suppkey")).agg(
        sum(col("l_quantity").cast(dec184)), sum(col("l_extendedprice").cast(dec184)),
        sum(col("l_discount").cast(dec184)), sum(col("l_tax").cast(dec184)),
        sum(col("l_extendedprice").cast("decimal(12,4)") *
          (lit(1).cast("decimal(5,4)") - col("l_discount").cast("decimal(12,4)"))))
    }
    // C: long-limb sums: unscaled scale-4 value split into 6-digit limbs
    def limbs(c: org.apache.spark.sql.Column, scale: Int): Seq[org.apache.spark.sql.Column] = {
      val u = (c.cast(s"decimal(18,$scale)") * pow(lit(10), lit(scale)).cast("decimal(18,0)")).cast("long")
      Seq(u % 1000000L, (u / 1000000L) % 1000000L, u / 1000000000000L)
    }
    time("long-limb x4 + dec product") {
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax").zipWithIndex.flatMap {
        case (c, i) => limbs(col(c), 4).zipWithIndex.map { case (l, j) => sum(l).as(s"s${i}_$j") }
      } :+ sum(col("l_extendedprice").cast("decimal(12,4)") *
        (lit(1).cast("decimal(5,4)") - col("l_discount").cast("decimal(12,4)"))).as("prod")
      li.groupBy(col("l_suppkey")).agg(cols.head, cols.tail: _*)
    }
    // D: long-limb for everything incl. product via long math
    time("long-limb x5 (prod long)") {
      val prodU = ((col("l_extendedprice").cast("decimal(12,4)") *
        (lit(1).cast("decimal(5,4)") - col("l_discount").cast("decimal(12,4)"))) *
        lit(100000000L).cast("decimal(18,0)")).cast("long")
      val prodLimbs = Seq(prodU % 1000000L, (prodU / 1000000L) % 1000000L, prodU / 1000000000000L)
      val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax").zipWithIndex.flatMap {
        case (c, i) => limbs(col(c), 4).zipWithIndex.map { case (l, j) => sum(l).as(s"s${i}_$j") }
      } ++ prodLimbs.zipWithIndex.map { case (l, j) => sum(l).as(s"p_$j") }
      li.groupBy(col("l_suppkey")).agg(cols.head, cols.tail: _*)
    }
    spark.stop()
  }
}
