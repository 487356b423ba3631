package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Tables

class VectorExpressionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("vector-expr-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private val hofDot =
    "aggregate(zip_with(ea, eb, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), " +
      "CAST(0 AS DOUBLE), (acc, v) -> acc + v)"

  test("float_vec_dot is bit-identical to the portable HOF form") {
    VectorExpressions.ensureRegistered(spark)
    val e = Tables(spark, "/root/testdata/sf0.001").embeddings
    val a = e.select(col("vec_id").as("ida"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("idb"), col("embedding").as("eb"))
    val pairs = a.filter(col("ida") < 20).join(b, col("ida") < col("idb"))
    val both = pairs.select(
      expr(hofDot).as("hof"),
      VectorExpressions.vecDot("ea", "eb").as("native")
    ).collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      // exact bit equality — same IEEE accumulation order
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("float_vec_dot property: matches scalar fold on random vectors") {
    val genVec = Gen.listOfN(64, Gen.chooseNum(-1.0f, 1.0f))
    val seed = org.scalacheck.rng.Seed(42L)
    var s = seed
    (1 to 25).foreach { _ =>
      val a = genVec.apply(Gen.Parameters.default, s).get.toArray
      s = s.next
      val b = genVec.apply(Gen.Parameters.default, s).get.toArray
      s = s.next
      val expected = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) =>
        acc + x.toDouble * y.toDouble
      }
      val got = FloatVecDot(
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          a, org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType)),
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          b, org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType))
      ).eval(null).asInstanceOf[Double]
      assert(java.lang.Double.doubleToLongBits(got) ===
        java.lang.Double.doubleToLongBits(expected))
    }
  }

  test("hyperplane_bands is bit-identical to the per-plane HOF folds") {
    VectorExpressions.ensureRegistered(spark)
    val e = Tables(spark, "/root/testdata/sf0.001").embeddings
    val dims = 64
    // the oracle-twin fold for plane j (Dedup.planeDot's shape)
    def hofPlane(j: Int): String =
      s"aggregate(sequence(0, ${dims - 1}), CAST(0 AS DOUBLE), " +
        s"(acc, i) -> acc + CAST(element_at(embedding, i + 1) AS DOUBLE) * " +
        s"(CAST((($j * $dims + i) * 2654435761) % 2147483647 AS DOUBLE) / 2147483647.0 - 0.5))"
    val (bands, planes) = (4, 4)
    val hofKeys = (0 until bands).map { k =>
      (0 until planes).map { p =>
        when(expr(hofPlane(k * planes + p)) >= 0, lit(1L << p)).otherwise(lit(0L))
      }.reduce(_ + _).cast("long").as(s"hof_$k")
    }
    val rows = e.select(
      (expr(s"hyperplane_bands(embedding, $bands, $planes, $dims)").as("native") +:
        hofKeys): _*
    ).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val native = r.getSeq[Long](0)
      val hof = (1 to bands).map(r.getLong)
      assert(native === hof)
    }
  }
}
