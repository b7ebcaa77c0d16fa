package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole forked test JVM. */
object TestSpark {
  lazy val spark: SparkSession = Session.local(cores = 4, appName = "graft-test")
}

trait SparkFixture {
  def spark: SparkSession = TestSpark.spark
}
