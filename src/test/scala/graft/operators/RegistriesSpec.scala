package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Contracts of the shared-frame registry ([[Registries]]) and its two
  * registered frames:
  *  - memoization: the same (session, dir, key) returns the SAME pinned
  *    frame instance — the "built once per session" claim the graph and
  *    near-dup families now rest on;
  *  - isolation: a different session gets its own build (no cross-JVM
  *    or cross-session sharing surprises);
  *  - determinism: the frames themselves are bit-identical across
  *    shuffle partitionings (DeterminismSpec's x33/x152 runs now serve
  *    from one cached build, so the registry build step needs its OWN
  *    cross-partitioning pin — done here via two sibling sessions with
  *    different shuffle.partitions).
  */
class RegistriesSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("registries-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.01"

  private def image(df: org.apache.spark.sql.DataFrame): Seq[String] = df
    .collect()
    .map(_.toSeq.map {
      case d: Double => java.lang.Double.doubleToLongBits(d).toString
      case other => String.valueOf(other)
    }.mkString("|"))
    .sorted.toSeq

  test("frame() memoizes per (session, dir, key) and isolates sessions") {
    val t = graft.sources.Tables(spark, sf)
    val a = TrainingData.coPurchasePairs(t)
    val b = TrainingData.coPurchasePairs(t)
    assert(a eq b, "same session+dir must serve the same pinned instance")

    val s2 = spark.newSession()
    s2.conf.set("spark.sql.shuffle.partitions", "4")
    val c = TrainingData.coPurchasePairs(graft.sources.Tables(s2, sf))
    assert(!(a eq c), "a different session must build its own frame")
    assert(image(a) === image(c), "sibling-session builds must agree")
  }

  test("registry frames are bit-identical across shuffle partitionings") {
    val s7 = spark.newSession()
    s7.conf.set("spark.sql.shuffle.partitions", "7")
    val t4 = graft.sources.Tables(spark, sf)
    val t7 = graft.sources.Tables(s7, sf)

    assert(image(TrainingData.coPurchasePairs(t4)) ===
      image(TrainingData.coPurchasePairs(t7)),
      "co-purchase pair registry differs across partitionings")
    assert(image(TrainingData.nearDupPairs(t4)) ===
      image(TrainingData.nearDupPairs(t7)),
      "near-dup pair registry differs across partitionings")
  }

  test("registered frames carry the documented schemas and are non-empty") {
    val t = graft.sources.Tables(spark, sf)
    val cp = TrainingData.coPurchasePairs(t)
    assert(cp.columns.toSeq === Seq("pa", "pb", "w"))
    assert(cp.filter(org.apache.spark.sql.functions.col("pa") >=
      org.apache.spark.sql.functions.col("pb")).count() === 0L,
      "pairs must be strictly ordered pa < pb")
    assert(cp.count() > 0L)

    val nd = TrainingData.nearDupPairs(t)
    assert(nd.columns.toSeq === Seq("doc_a", "doc_b", "common", "jaccard"))
    assert(nd.count() > 0L)
  }

  test("derived registries build through nested frame() calls in a fresh session") {
    // Round-17 advice (high): the old computeIfAbsent form ran builds
    // under the CHM bin lock, and a DERIVED registry's build calls
    // frame() again for its base — CHM's "Recursive update"
    // IllegalStateException whenever the two keys landed in one bin.
    // The crash was nondeterministic (key includes session identity
    // hash); the get/putIfAbsent + lazy-holder form can't hit it.
    // Repro condition: a serving layout requested FIRST in a fresh
    // session (bench subsets, single-query verify), so the nested base
    // build runs inside the outer build.
    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "4")
    val t = graft.sources.Tables(s, sf)
    // derived-before-base, all four derived layouts
    val byOther = TrainingData.coPurchaseUndByOther(t)
    val byPk = TrainingData.coPurchaseUndWByPk(t)
    val min2 = TrainingData.coPurchasePairsMin2(t)
    assert(byOther.count() > 0L && byPk.count() > 0L && min2.count() >= 0L)
    // the nested call memoized the base too: same instance afterwards
    val base = TrainingData.coPurchasePairs(t)
    assert(base eq TrainingData.coPurchasePairs(t))
  }

  test("purgeWhere evicts a session's entries and leaves others intact") {
    // The driver-path sweep (purgeStopped) drops entries whose context
    // is stopped; a local-mode suite cannot stop the shared context, so
    // the sweep is driven here by predicate (same code path).
    Registries.clear()
    val s1 = spark.newSession()
    val s2 = spark.newSession()
    Seq(s1, s2).foreach(_.conf.set("spark.sql.shuffle.partitions", "4"))
    TrainingData.coPurchasePairs(graft.sources.Tables(s1, sf))
    TrainingData.coPurchasePairs(graft.sources.Tables(s2, sf))
    assert(Registries.size === 2)
    Registries.purgeWhere(_ eq s1)
    assert(Registries.size === 1)
    // s2's entry survived and still serves the same instance
    val kept = TrainingData.coPurchasePairs(graft.sources.Tables(s2, sf))
    assert(Registries.size === 1)
    assert(kept eq TrainingData.coPurchasePairs(graft.sources.Tables(s2, sf)))
    Registries.clear()
  }
}
