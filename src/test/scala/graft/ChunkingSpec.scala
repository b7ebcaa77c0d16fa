package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Chunking

class ChunkingSpec extends AnyFunSuite with SparkFixture {

  test("chunkDocs: overlap, short final chunk, short doc -> one chunk") {
    val s = spark
    import s.implicits._
    // 10 tokens, chunk 4, overlap 1 -> step 3 -> chunks at 0,3,6
    val d = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" ")), (2L, "a b"))
      .toDF("doc_id", "text")
    val got = Chunking.chunkDocs(d, "doc_id", "text", chunkTokens = 4, overlap = 1)
      .orderBy("id", "chunk_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
    assert(got.toSeq == Seq(
      (1L, 0, "t1 t2 t3 t4", 4),
      (1L, 1, "t4 t5 t6 t7", 4),
      (1L, 2, "t7 t8 t9 t10", 4),
      (2L, 0, "a b", 2)))
    // consecutive chunks share exactly `overlap` boundary tokens and the
    // union covers every token
    val cover = got.filter(_._1 == 1L).flatMap(_._3.split(" ")).toSet
    assert(cover == (1 to 10).map(i => s"t$i").toSet)
  }

  test("chunkDocs plans no shuffle (per-row explode)") {
    val s = spark
    import s.implicits._
    val d = Seq((1L, "a b c")).toDF("doc_id", "text")
    val plan = Chunking.chunkDocs(d, "doc_id", "text", 2, 0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan.take(400))
  }

  test("packSequences: packs close when the running budget passes ctx") {
    val s = spark
    import s.implicits._
    val d = Seq((1L, 300), (2L, 300), (3L, 300), (4L, 50))
      .toDF("doc_id", "n_tok")
    // one shard so the sequence is deterministic by doc_id
    val got = Chunking.packSequences(d, "doc_id", col("n_tok"),
        ctxTokens = 512, nShards = 1)
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(r.fieldIndex("pack_id"))).toSeq
    // start offsets 0, 300, 600, 900 -> packs 0, 0, 1, 1
    assert(got == Seq(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L))
  }

  test("chunkDocs survives an input __toks column; output-name idCol rejected") {
    val s = spark
    import s.implicits._
    // an input column literally named __toks0 must not be shadowed by the
    // internal token-array alias (the free-name probe skips past it)
    val d = Seq((1L, "a b c", "junk")).toDF("doc_id", "text", "__toks0")
    val got = Chunking.chunkDocs(d, "doc_id", "text", 2, 0)
      .orderBy("chunk_id").collect().map(_.getString(2)).toSeq
    assert(got == Seq("a b", "c"))
    // idCol colliding with a fixed output name fails fast, not silently
    val bad = Seq(("x", "a b")).toDF("chunk_id", "text")
    val e = intercept[IllegalArgumentException](
      Chunking.chunkDocs(bad, "chunk_id", "text", 2, 0))
    assert(e.getMessage.contains("collides"))
  }

  test("packSequences rejects input shard/pack_id instead of clobbering") {
    val s = spark
    import s.implicits._
    val d = Seq((1L, 10, 99L)).toDF("doc_id", "n_tok", "pack_id")
    val e = intercept[IllegalArgumentException](
      Chunking.packSequences(d, "doc_id", col("n_tok"), 512, 1))
    assert(e.getMessage.contains("pack_id"))
  }

  test("packSequences is deterministic across re-runs and shard-stable") {
    val s = spark
    import s.implicits._
    val d = (1L to 200L).map(i => (i, 100 + (i % 7).toInt)).toDF("doc_id", "n_tok")
    def run() = Chunking.packSequences(d, "doc_id", col("n_tok"), 1000, 4)
      .select("doc_id", "shard", "pack_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(run() == run())
    // every shard's packs fill to the budget: max one pack gap per shard
    val packs = run().groupBy(_._2).view.mapValues(_.map(_._3).max).toMap
    assert(packs.values.forall(_ >= 1), s"shards too empty to test: $packs")
  }
}
