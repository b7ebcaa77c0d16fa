package graft

import org.apache.spark.sql.functions._

/** Scratch parity probe — delete before committing. */
object ScratchProf {
  def main(args: Array[String]): Unit = {
    val spark = Session.local(8)
    val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
    val r = li.groupBy("l_returnflag").agg(
      stddev_samp(col("l_quantity")).as("sd"),
      var_samp(col("l_quantity")).as("vr"),
      median(col("l_quantity")).as("med"),
      percentile(col("l_quantity"), lit(0.25)).as("q25"),
      avg(col("l_quantity")).as("mean"))
      .orderBy("l_returnflag")
    r.collect().foreach { row =>
      println(s"[parity] ${row.getString(0)} sd=${java.lang.Double.doubleToLongBits(row.getDouble(1))} " +
        s"vr=${java.lang.Double.doubleToLongBits(row.getDouble(2))} " +
        s"med=${java.lang.Double.doubleToLongBits(row.getDouble(3))} " +
        s"q25=${java.lang.Double.doubleToLongBits(row.getDouble(4))} " +
        s"mean=${java.lang.Double.doubleToLongBits(row.getDouble(5))}")
    }
    spark.stop()
  }
}
