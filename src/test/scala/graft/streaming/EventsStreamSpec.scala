package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

class EventsStreamSpec extends AnyFunSuite {

  implicit lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("streaming-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val events = Tables(spark, "/root/testdata/sf0.001").events

  test("windowedCounts incremental == batch") {
    import spark.implicits._
    // stage the (nanos-converted) events as a clean parquet stream source
    val dir = Files.createTempDirectory("events-stream").toString
    events.write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = EventsStream.windowedCounts(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("win_counts").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.sql(
      "SELECT window.start AS ws, event_type, n_events FROM win_counts")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val batch = EventsStream.windowedCounts(events)
      .select(col("window.start").as("ws"), col("event_type"), col("n_events"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("stream-stream interval join == batch interval join") {
    val dir = Files.createTempDirectory("events-ssj").toString
    events.write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = EventsStream.attributedPurchases(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("attributed").start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.sql("SELECT purchase_id, click_id FROM attributed")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val batch = EventsStream.attributedPurchases(events)
      .select("purchase_id", "click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed === batch)
    assert(streamed.nonEmpty)
  }

  test("streaming dedup drops replayed events") {
    val dir = Files.createTempDirectory("events-dedup").toString
    // stage the same events twice: a replayed source
    events.write.mode("overwrite").parquet(s"$dir/a")
    events.write.mode("overwrite").parquet(s"$dir/b")
    val schema = spark.read.parquet(s"$dir/a").schema
    val stream = spark.readStream.schema(schema).parquet(s"$dir/{a,b}")
    val q = EventsStream.dedupedEvents(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_events").start()
    q.processAllAvailable()
    q.stop()
    val n = spark.sql("SELECT COUNT(*) FROM dedup_events").collect()(0).getLong(0)
    assert(n === events.count()) // each event_id exactly once despite replay
  }

  test("stateful sessionization matches the batch window formulation") {
    import spark.implicits._
    val evs = events
      .select(col("user_id"), col("event_id"), col("ts"))
      .as[EventsStream.Ev]
    val sessions = EventsStream.sessionizeStateful(evs, gapMinutes = 30).cache()
    // same session inventory as the batch lag/running-sum query (x13)
    val batch = graft.operators.TrainingData.all
      .find(_.name == "x13_sessionize").get
      .fn(Tables(spark, "/root/testdata/sf0.001"))
      .cache()
    assert(sessions.count() === batch.count())
    val statefulPerUser = sessions.groupByKey(_.user_id).count().collect().toMap
    val batchPerUser = batch.groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(statefulPerUser === batchPerUser)
    // total events across sessions == total events
    val totalEvents = sessions.collect().map(_.n_events.toLong).sum
    assert(totalEvents === events.count())
  }
}
