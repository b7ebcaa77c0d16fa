package graft

import org.apache.spark.sql.SparkSession

/** Local smoke runner: mirrors the driver's t1 check (entry() rows > 0 on
  * sf0.001) and prints the result + plan so a human can eyeball it. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = Session.local(cores = 8, appName = "graft-smoke")
    val df = SparkEntry.entry(spark)
    df.explain("formatted")
    df.show(truncate = false)
    val n = df.count()
    println(s"[smoke] entry() rows=$n ${if (n > 0) "PASS" else "FAIL"}")
    spark.stop()
  }
}
