package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.{Sinks, Tables}
import graft.streaming.{IvfPqServeStream, PqStream}

/** Measures the query-time SERVING path — the deployment mode the
  * IVFADC work exists for (reference E3 analog): micro-batches of
  * external queries answered against a standing persisted index.
  * Reports, as one JSON line each:
  *   - index build time at the registered auto-k policy
  *     (k = max(16, ⌊√n⌋) — the x146/x137/x138 default);
  *   - per-batch serve wall time (mean/min over timed batches after one
  *     warm batch) and queries/sec for [[IvfPqServeStream]];
  *   - [[PqStream]]'s ingest encode rate (vectors/sec per micro-batch);
  *   - the answers-registry small-files story: file count before/after
  *     [[Sinks.compactPartitioned]] and the full-registry scan wall
  *     time at both layouts.
  *
  * Usage: `tools/run_main.sh graft.ServeLab <sfDir> [nBatches] [qPerBatch]`
  * (defaults 20×50). Timing-only — correctness of the serving answers
  * is IvfPqServeStreamSpec's stream≡batch pin; the numbers land in
  * SCALE.md's serving table.
  */
object ServeLab {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nBatches = args.lift(1).map(_.toInt).getOrElse(20)
    val qPerBatch = args.lift(2).map(_.toInt).getOrElse(50)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-servelab")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.VectorExpressions.ensureRegistered(spark)
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val root = Files.createTempDirectory("servelab").toString
    val emb = Tables(spark, dir).embeddings
    val n = emb.count()
    val k = math.max(16, math.sqrt(n.toDouble).toInt)

    val (_, tBuild) = timed(
      IvfPqServeStream.buildIndex(emb, "vec_id", "embedding", s"$root/index", k))
    println(s"""{"metric":"serve_index_build","n":$n,"k":$k,"sec":$tBuild,"sf":"$dir"}""")

    // external query ids (disjoint from corpus vids — the serving
    // contract); vectors cycle through the corpus
    val queries = emb
      .select((col("vec_id") + 10000000L).as("query_id"), col("embedding"))
      .limit(nBatches * qPerBatch + qPerBatch).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))

    val src = MemoryStream[(Long, Seq[Float])]
    val serve = IvfPqServeStream.startServe(
      src.toDF().toDF("query_id", "qvec")
        .select(col("query_id"), col("qvec").cast("array<float>")),
      s"$root/index", s"$root/answers", s"$root/ckpt",
      nprobe = 4, topK = 5)
    val batchTimes =
      try {
        // warm batch (codegen + index file footers)
        src.addData(queries.take(qPerBatch).toSeq: _*)
        serve.processAllAvailable()
        (0 until nBatches).map { b =>
          val batch = queries.slice((b + 1) * qPerBatch, (b + 2) * qPerBatch)
          val (_, dt) = timed {
            src.addData(batch.toSeq: _*)
            serve.processAllAvailable()
          }
          dt
        }
      } finally serve.stop()
    val mean = batchTimes.sum / batchTimes.size
    println(s"""{"metric":"serve_batch","n_batches":$nBatches,"q_per_batch":$qPerBatch,""" +
      s""""mean_sec":$mean,"min_sec":${batchTimes.min},"max_sec":${batchTimes.max},""" +
      s""""qps":${qPerBatch / mean},"k":$k,"nprobe":4,"sf":"$dir"}""")

    // answers-registry maintenance: many tiny per-batch directories vs
    // the compacted layout — file counts and full-scan wall time
    val (_, scanBefore) = timed(
      spark.read.parquet(s"$root/answers")
        .write.format("noop").mode("overwrite").save())
    val ((filesBefore, filesAfter), tCompact) = timed(
      Sinks.compactPartitioned(spark, s"$root/answers", Seq("batch_id")))
    val (_, scanAfter) = timed(
      spark.read.parquet(s"$root/answers")
        .write.format("noop").mode("overwrite").save())
    println(s"""{"metric":"serve_compaction","files_before":$filesBefore,""" +
      s""""files_after":$filesAfter,"compact_sec":$tCompact,""" +
      s""""scan_before_sec":$scanBefore,"scan_after_sec":$scanAfter,"sf":"$dir"}""")

    // ingest-side twin: PqStream encode rate over corpus-sized batches
    val book = Dedup.pqCodebook(emb, "vec_id", "embedding")
    val vecs = emb.select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    val encBatches = 5
    val per = math.max(1, vecs.length / encBatches)
    val src2 = MemoryStream[(Long, Seq[Float])]
    val enc = PqStream.startPqEncode(
      src2.toDF().toDF("vec_id", "embedding")
        .select(col("vec_id"), col("embedding").cast("array<float>")),
      book, s"$root/codes", s"$root/ckpt2", "vec_id", "embedding")
    val encTimes =
      try {
        src2.addData(vecs.take(per).toSeq: _*) // warm
        enc.processAllAvailable()
        (1 until encBatches).map { b =>
          val batch = vecs.slice(b * per, (b + 1) * per)
          val (_, dt) = timed {
            src2.addData(batch.toSeq: _*)
            enc.processAllAvailable()
          }
          (batch.length, dt)
        }
      } finally enc.stop()
    val encRows = encTimes.map(_._1).sum
    val encSec = encTimes.map(_._2).sum
    println(s"""{"metric":"pq_encode_stream","rows":$encRows,"sec":$encSec,""" +
      s""""rows_per_sec":${encRows / encSec},"sf":"$dir"}""")

    // SQ8 serving tier ([[IvfSqServeStream]]) on the same query
    // workload — both modes: the rerank-free decode-scan and the
    // full-recall shortlist+rerank (x164's configuration)
    val (_, tBuildSq) = timed(graft.streaming.IvfSqServeStream.buildIndex(
      emb, "vec_id", "embedding", s"$root/sqindex", k))
    println(s"""{"metric":"serve_index_build_sq8","n":$n,"k":$k,""" +
      s""""sec":$tBuildSq,"sf":"$dir"}""")
    for (sl <- Seq(0, 50)) {
      val srcS = MemoryStream[(Long, Seq[Float])]
      val serveS = graft.streaming.IvfSqServeStream.startServe(
        srcS.toDF().toDF("query_id", "qvec")
          .select(col("query_id"), col("qvec").cast("array<float>")),
        s"$root/sqindex", s"$root/sqanswers$sl", s"$root/sqckpt$sl",
        nprobe = 4, topK = 5, shortlist = sl)
      val times =
        try {
          srcS.addData(queries.take(qPerBatch).toSeq: _*)
          serveS.processAllAvailable()
          (0 until nBatches).map { b =>
            val batch = queries.slice((b + 1) * qPerBatch, (b + 2) * qPerBatch)
            val (_, dt) = timed {
              srcS.addData(batch.toSeq: _*)
              serveS.processAllAvailable()
            }
            dt
          }
        } finally serveS.stop()
      val meanS = times.sum / times.size
      println(s"""{"metric":"serve_batch_sq8","shortlist":$sl,""" +
        s""""n_batches":$nBatches,"q_per_batch":$qPerBatch,""" +
        s""""mean_sec":$meanS,"min_sec":${times.min},"max_sec":${times.max},""" +
        s""""qps":${qPerBatch / meanS},"k":$k,"nprobe":4,"sf":"$dir"}""")
    }

    spark.stop()
  }
}
