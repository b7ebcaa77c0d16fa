package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** The differential sweep's canonical hash must separate both fields
  * and rows — a collision here would silently mask a config mismatch. */
class DiffConfigSpec extends AnyFunSuite with SparkFixture {

  private def frameOf(rows: Seq[Seq[String]], cols: String*): org.apache.spark.sql.DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r: _*))),
      StructType(cols.map(c => StructField(c, StringType))))

  test("row-boundary shifts change the hash") {
    val a = frameOf(Seq(Seq("ab"), Seq("c")), "s")
    val b = frameOf(Seq(Seq("a"), Seq("bc")), "s")
    assert(DiffConfig.canonicalHash(a) != DiffConfig.canonicalHash(b))
  }

  test("field-boundary shifts change the hash") {
    val a = frameOf(Seq(Seq("ab", "c")), "x", "y")
    val b = frameOf(Seq(Seq("a", "bc")), "x", "y")
    assert(DiffConfig.canonicalHash(a) != DiffConfig.canonicalHash(b))
  }

  test("row order does not change the hash; values do") {
    val a = frameOf(Seq(Seq("p"), Seq("q")), "s")
    val b = frameOf(Seq(Seq("q"), Seq("p")), "s")
    val c = frameOf(Seq(Seq("p"), Seq("r")), "s")
    assert(DiffConfig.canonicalHash(a) == DiffConfig.canonicalHash(b))
    assert(DiffConfig.canonicalHash(a) != DiffConfig.canonicalHash(c))
  }
}
