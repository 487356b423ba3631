package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contract of the small-files compaction pass: rows and the partition
  * column survive byte-identically, the file count collapses to one per
  * partition directory, and the layout stays compatible with the
  * streaming writers' per-batch overwrite (idempotent replay works the
  * same after compaction as before). */
class CompactionSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("compaction-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def canon(df: org.apache.spark.sql.DataFrame) = df
    .select("batch_id", "k", "v").collect()
    .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet

  test("compaction preserves rows, collapses files, keeps replay semantics") {
    import spark.implicits._
    val root = Files.createTempDirectory("compact").toString + "/registry"

    // simulate a stream: 3 micro-batches, 4 files each (12 data files)
    for (b <- 0L until 3L)
      (0L until 40L).map(i => (b * 100 + i, i % 7)).toDF("k", "v")
        .repartition(4)
        .write.mode("overwrite").parquet(s"$root/batch_id=$b")
    val beforeRows = canon(spark.read.parquet(root))

    val (before, after) = Sinks.compactPartitioned(spark, root, Seq("batch_id"))
    assert(before === 12L)
    assert(after === 3L) // one file per batch_id directory
    assert(canon(spark.read.parquet(root)) === beforeRows)

    // a replayed batch still owns exactly its directory after compaction
    (0L until 40L).map(i => (100 + i, 99L)).toDF("k", "v")
      .repartition(2)
      .write.mode("overwrite").parquet(s"$root/batch_id=1")
    val replayed = spark.read.parquet(root)
    assert(replayed.filter(col("batch_id") === 1 && col("v") =!= 99).count() === 0L)
    assert(replayed.filter(col("batch_id") =!= 1).count() === 80L)
    assert(replayed.count() === 120L)
  }
}
