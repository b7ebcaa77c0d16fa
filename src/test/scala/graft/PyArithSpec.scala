package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.PyArith

/** Python arithmetic semantics (SURVEY §7.2 step 2): the composed Catalyst
  * expressions must agree with the JVM's floor-division model
  * (Math.floorDiv / Math.floorMod match Python's `//` and `%` exactly).
  * Samples are evaluated in ONE Spark batch per test — the property is
  * checked per-row on the collected result.
  */
class PyArithSpec extends AnyFunSuite with SparkFixture {

  private def evalPairs(pairs: Seq[(Long, Long)]): Seq[(Long, Long, Long, Long, Double)] = {
    val s = spark
    import s.implicits._
    pairs.toDF("a", "b")
      .select(col("a"), col("b"),
        PyArith.pyFloorDiv(col("a"), col("b")).as("fd"),
        PyArith.pyMod(col("a"), col("b")).cast("long").as("md"),
        PyArith.pyDiv(col("a"), col("b")).as("td"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSeq
  }

  test("floor-div and mod match Python semantics on a mixed-sign grid") {
    val pairs = for {
      a <- (-60L to 60L); b <- Seq(-7L, -3L, -1L, 1L, 3L, 7L)
    } yield (a, b)
    evalPairs(pairs).foreach { case (a, b, fd, md, td) =>
      assert(fd == Math.floorDiv(a, b), s"floorDiv($a, $b)")
      assert(md == Math.floorMod(a, b), s"mod($a, $b)")
      assert(td == a.toDouble / b.toDouble, s"truediv($a, $b)")
    }
  }

  test("property: fd*b + md == a and 0 <= |md| < |b| (300 random pairs)") {
    val gen = for {
      a <- Gen.chooseNum(-1000000L, 1000000L)
      b <- Gen.chooseNum(-10000L, 10000L).suchThat(_ != 0L)
    } yield (a, b)
    val seed = rng.Seed(42L)
    val pairs = Gen.listOfN(300, gen).apply(Gen.Parameters.default, seed).get
    evalPairs(pairs).foreach { case (a, b, fd, md, _) =>
      assert(fd * b + md == a, s"law fd*b+md==a for ($a, $b)")
      assert(if (b > 0) md >= 0 && md < b else md <= 0 && md > b,
        s"mod sign follows divisor for ($a, $b): got $md")
    }
  }

  test("power, bitwise and invert semantics") {
    val s = spark
    import s.implicits._
    val r = Seq((12L, 10L)).toDF("a", "b")
      .select(
        PyArith.pyPow(col("a"), lit(2)).as("pw"),
        PyArith.bitAnd(col("a"), col("b")).as("ba"),
        PyArith.bitOr(col("a"), col("b")).as("bo"),
        PyArith.bitXor(col("a"), col("b")).as("bx"),
        PyArith.inv(col("a")).as("inv"))
      .head()
    assert(r.getDouble(0) == 144.0)
    assert(r.getLong(1) == (12L & 10L))
    assert(r.getLong(2) == (12L | 10L))
    assert(r.getLong(3) == (12L ^ 10L))
    assert(r.getLong(4) == ~12L) // Python ~x == -x-1
  }
}
