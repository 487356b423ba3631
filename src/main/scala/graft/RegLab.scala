package graft

import org.apache.spark.sql.SparkSession

import graft.operators.TrainingData
import graft.sources.Tables

/** Registry memory accounting (round-19 instrumentation): builds every
  * round-19 session registry for one SF dir and prints each pinned
  * frame's rows + bytes from the BlockManager's own storage info —
  * the measurement SCALE.md's "Registry memory accounting" rows are
  * made of (a per-RDD storage read, not a global delta — the r18
  * verdict item 6 lesson).
  *
  * `runMain graft.RegLab [sfDir]`
  */
object RegLab {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-reg-lab")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t = Tables(spark, sfDir)

    def sizeOf(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val before = spark.sparkContext.getRDDStorageInfo
        .map(i => i.id -> i).toMap
      val frame = df
      val n = frame.count()
      val fresh = spark.sparkContext.getRDDStorageInfo
        .filterNot(i => before.contains(i.id))
      val bytes = fresh.map(i => i.memSize + i.diskSize).sum
      println(f"[reglab] $name%-28s rows=$n%9d pinned=${bytes / 1024.0 / 1024.0}%9.2f MiB (${fresh.length} new RDDs)")
    }

    sizeOf("ngram_pairs_t0.05")(TrainingData.ngramPairsLoose(t))
    sizeOf("neardup_pairs_t0.5")(TrainingData.nearDupPairs(t))
    sizeOf("mh_band_audit")(TrainingData.mhBandAudit(t))
    sizeOf("fuzzy_pairs")(TrainingData.fuzzyPairs(t))
    sizeOf("bpe_artifact_r8")(TrainingData.bpeArtifact(t))
    sizeOf("emb_neardup_exact")(TrainingData.embNearDupExact(t))
    sizeOf("emb_lsh_cands")(TrainingData.embBandCands(t))
    sizeOf("exact_topk5")(TrainingData.exactTopK5(t))
    sizeOf("ivf2_index")(TrainingData.ivf2AutoIndex(t)._3)
    sizeOf("ivf2_lists_top5")(TrainingData.ivf2ListsTop5(t))
    sizeOf("ivf2_mutual_cc")(TrainingData.ivfMutualCcAuto(t))
    sizeOf("ivf_flat_k16")(TrainingData.ivfFlatIndex(t, 16)._2)
    sizeOf("pq_codes_seed")(TrainingData.pqCodesSeed(t))
    sizeOf("pq_book_lloyd1")(TrainingData.pqBookLloyd1(t))
    sizeOf("pq_codes_lloyd1")(TrainingData.pqCodesLloyd1(t))
    sizeOf("sq8_codes")(TrainingData.sq8Codes(t))
    sizeOf("bq_codes")(TrainingData.bqCodes(t))
    sizeOf("rvq_seed_index")(TrainingData.rvqSeedIndex(t)._1)
    sizeOf("quality_gate")(TrainingData.qualityGateReg(t))
    sizeOf("blocklist_gate")(TrainingData.blocklistGateReg(t))
    sizeOf("doc_word_stats")(TrainingData.docWordStats(t))
    sizeOf("copurchase_deg")(TrainingData.coPurchaseDeg(t))
    sizeOf("copurchase_wdeg")(TrainingData.coPurchaseWdeg(t))
    val total = spark.sparkContext.getRDDStorageInfo
      .map(i => i.memSize + i.diskSize).sum
    println(f"[reglab] TOTAL pinned after all builds: ${total / 1024.0 / 1024.0}%9.2f MiB")
    spark.stop()
  }
}
