package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Components, Dedup}

/** Connected-components scale probe (SCALEPROBE.md round-7 section):
  * (1) the real path — minhash pairs on the ×`dup` duplicated corpus →
  * cluster labels, lazy vs eager face, pair co-labeling checked; (2) a
  * synthetic random graph at ×1 / ×10 edge count to show per-round cost
  * scales with E and the eager face's convergence round count stays at
  * the component diameter, not |V|.
  *
  * {{{ sbt "runMain graft.ComponentsProbe [sfDir] [dup]" }}}
  */
object ComponentsProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dup = if (args.length > 1) args(1).toInt else 10
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(thunk: => T): T = {
      val t0 = System.nanoTime()
      val r = thunk
      println(f"[cprobe] $label%-32s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    // ---- real path: duplicated corpus -> pairs -> clusters -------------
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text")
    val docs = (0 until dup).map { i =>
      base.select((col("doc_id") * dup + i).as("doc_id"), col("text"))
    }.reduce(_ union _).cache()
    println(s"[cprobe] corpus: ${docs.count()} docs")
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text").cache()
    println(s"[cprobe] minhash pairs: ${pairs.count()}")

    val lazyLabels = time("clusterLabels lazy r=6") {
      val l = Components.clusterLabels(pairs).cache(); l.count(); l
    }
    val eagerLabels = time("connectedComponents eager") {
      Components.connectedComponents(pairs)
    }
    val nClusters = lazyLabels.select("label").distinct().count()
    val agree = lazyLabels.withColumnRenamed("label", "l1")
      .join(eagerLabels.withColumnRenamed("label", "l2"), "node")
      .filter(col("l1") =!= col("l2")).count()
    // every pair co-labeled = the dedup-correctness property
    val split = pairs.select(col("a_id").as("node"), col("b_id"))
      .join(lazyLabels, "node").withColumnRenamed("label", "la")
      .select(col("b_id").as("node"), col("la"))
      .join(lazyLabels, "node")
      .filter(col("la") =!= col("label")).count()
    println(s"[cprobe] clusters=$nClusters lazy-vs-eager disagreements=$agree " +
      s"split pairs=$split")

    // ---- synthetic graph: per-round cost vs edge count -----------------
    // E random edges over V nodes (E = 2V): supercritical regime — one
    // giant component with O(log V) diameter, the worst realistic shape
    // for label propagation (dup clusters are far shallower)
    def randomGraph(v: Long) = spark.range(2 * v).select(
      pmod(xxhash64(col("id"), lit(1)), lit(v)).as("a_id"),
      pmod(xxhash64(col("id"), lit(2)), lit(v)).as("b_id"))
      .filter(col("a_id") =!= col("b_id"))
      .localCheckpoint()
    for (v <- Seq(100000L, 1000000L)) {
      val g = randomGraph(v)
      println(s"[cprobe] synthetic graph: V=$v E=${g.count()}")
      time(s"eager components V=$v") {
        val labels = Components.connectedComponents(g)
        val comps = labels.select("label").distinct().count()
        println(s"[cprobe]   components=$comps")
      }
    }
    spark.stop()
  }
}
