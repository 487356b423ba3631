package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SinksSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("sinks-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val t = Tables(spark, "/root/testdata/sf0.001")

  test("JSON round-trip preserves rows and values (S8/S9)") {
    val dir = Files.createTempDirectory("json-sink").toString
    val src = t.customer
    Sinks.writeJson(src, s"$dir/customer")
    val back = Sinks.readJson(spark, s"$dir/customer", src.schema)
    assert(back.count() === src.count())
    val a = src.orderBy("c_custkey").collect().map(_.toSeq)
    val b = back.orderBy("c_custkey").collect().map(_.toSeq)
    assert(a === b)
  }

  test("CSV round-trip with explicit schema") {
    val dir = Files.createTempDirectory("csv-sink").toString
    val src = t.nation
    Sinks.writeCsv(src, s"$dir/nation")
    val back = Sinks.readCsv(spark, s"$dir/nation", src.schema)
    assert(back.orderBy("n_nationkey").collect().map(_.toSeq) ===
      src.orderBy("n_nationkey").collect().map(_.toSeq))
  }

  test("ORC round-trip preserves schema and values") {
    val dir = Files.createTempDirectory("orc-sink").toString
    val src = t.supplier
    Sinks.writeOrc(src, s"$dir/supplier")
    val back = Sinks.readOrc(spark, s"$dir/supplier")
    assert(back.schema === src.schema)
    assert(back.orderBy("s_suppkey").collect().map(_.toSeq) ===
      src.orderBy("s_suppkey").collect().map(_.toSeq))
  }

  test("partitioned layout round-trip keeps data + enables pruning") {
    val dir = Files.createTempDirectory("part-sink").toString
    Sinks.writePartitioned(t.orders, s"$dir/orders", "o_orderstatus")
    val back = spark.read.parquet(s"$dir/orders")
    assert(back.count() === t.orders.count())
    assert(new java.io.File(s"$dir/orders").listFiles()
      .exists(_.getName.startsWith("o_orderstatus=")))
  }

  test("robust JSON read quarantines malformed lines instead of failing") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("json-robust").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/in.json"),
      """{"id": 1, "name": "ok"}
        |{"id": "NOT A NUMBER", "name": "bad type"}
        |this is not json at all
        |{"id": 3, "name": "fine"}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val df = Sinks.readJsonRobust(spark, dir, schema).cache()
    assert(df.count() === 4) // no rows lost, no job failure
    val good = df.filter(col("_corrupt").isNull)
    val bad = df.filter(col("_corrupt").isNotNull)
    assert(good.count() === 2)
    assert(bad.count() === 2)
    assert(good.select("id").collect().map(_.getLong(0)).toSet === Set(1L, 3L))
  }
}
