package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Context-window preparation for training pipelines: split long
  * documents into overlapping token chunks, and assign documents to
  * fixed-budget packs (the "sequence packing" step before batching).
  *
  * Both operators are fully declarative — chunking is a per-row
  * `sequence`/`slice` explode (codegen'd, shuffle-free), packing is one
  * running-sum window per shard — and both are deterministic, so re-runs
  * and engine migrations produce identical chunk/pack assignments.
  */
object Chunking {

  /** Split each document into whitespace-token chunks of `chunkTokens`
    * tokens, consecutive chunks overlapping by `overlap` tokens (the
    * standard sliding context window). A document shorter than one chunk
    * yields exactly one (short) chunk; the final chunk may be short.
    *
    * Per-row explode, no shuffle: chunk count rides the `sequence`
    * expression (integer arithmetic; `(n-overlap+step-1)/step` floored is
    * exact in doubles far past any real token count, so the DuckDB oracle
    * reproduces it bit-for-bit). Output: (id, chunk_id, chunk_text,
    * n_tokens) — n_tokens is the chunk's actual token count.
    */
  def chunkDocs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      chunkTokens: Int,
      overlap: Int): DataFrame = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      "chunkDocs needs 0 <= overlap < chunkTokens")
    // the output face is fixed (id, chunk_id, chunk_text, n_tokens); an
    // id column already carrying one of those names would alias-collide
    // inside the projection — fail fast instead of silently shadowing
    require(!Seq("chunk_id", "chunk_text", "n_tokens").contains(idCol),
      s"chunkDocs: idCol '$idCol' collides with an output column name")
    // intermediate token-array alias: probe for a free name (same pattern
    // as interpolate/mergeIndicator) so an input column named __toks can
    // never be shadowed
    val tokName = Iterator.from(0).map(i => s"__toks$i")
      .find(n => !docs.columns.contains(n)).get
    val step = chunkTokens - overlap
    val toks = split(col(textCol), " ")
    val n = size(toks)
    // ceil((n - overlap) / step) chunks, at least 1
    val nChunks = greatest(lit(1),
      floor((n - lit(overlap) + lit(step - 1)) / lit(step.toDouble)).cast("int"))
    docs.select(
        col(idCol).as("id"), toks.as(tokName),
        explode(sequence(lit(0), nChunks - 1)).as("chunk_id"))
      .select(
        col("id"), col("chunk_id"),
        array_join(slice(col(tokName), col("chunk_id") * step + 1, lit(chunkTokens)), " ")
          .as("chunk_text"),
        size(slice(col(tokName), col("chunk_id") * step + 1, lit(chunkTokens)))
          .as("n_tokens"))
  }

  /** Reassemble chunked documents — the inverse of [[chunkDocs]], the
    * "stitch back" step after per-chunk processing (embedding, scoring,
    * PII redaction) so downstream stages see whole documents again.
    *
    * Each non-first chunk drops its leading `overlap` tokens (the tokens
    * repeated from the previous chunk) BEFORE aggregation — a per-row
    * codegen'd split/slice, so the shuffle carries deduplicated text
    * only. Then one groupBy(id) with an order-insensitive
    * `sort_array(collect_list(struct(chunk_id, body)))` restores chunk
    * order without a global sort: chunk_id is unique per id, so the
    * struct sort is total regardless of arrival order. With chunking's
    * invariant that every chunk's stripped body is non-empty (the final
    * chunk always exceeds the overlap — see chunkDocs), the round trip
    * chunk -> unchunk reproduces the source text byte-for-byte.
    *
    * One hash shuffle on id; at 100 TB chunk stores written bucketed by
    * id (PsIO.writeBucketed) make this reassembly shuffle-free.
    * Output: (id, text).
    */
  def unchunkDocs(
      chunks: DataFrame,
      idCol: String,
      chunkIdCol: String,
      chunkTextCol: String,
      overlap: Int): DataFrame = {
    require(overlap >= 0, "unchunkDocs needs overlap >= 0")
    val toks = split(col(chunkTextCol), " ")
    val body = when(col(chunkIdCol) === 0, col(chunkTextCol))
      .otherwise(array_join(
        slice(toks, lit(overlap + 1), greatest(size(toks) - overlap, lit(0))), " "))
    chunks
      .select(col(idCol).as("id"), struct(col(chunkIdCol).as("cid"), body.as("body")).as("cb"))
      .groupBy("id")
      .agg(array_join(transform(sort_array(collect_list(col("cb"))),
        c => c.getField("body")), " ").as("text"))
  }

  /** Assign each document to a fixed-token-budget pack: documents are
    * hash-sharded (`nShards` independent streams — the parallelism unit),
    * ordered by id within their shard, and a pack closes when the running
    * token total passes `ctxTokens`. pack = floor(start_offset / budget):
    * the standard contiguous-fill approximation — a document may straddle
    * its pack boundary and is counted into the pack where it starts.
    *
    * One unordered-input window per shard (hash shuffle on shard, sort by
    * id within partition); at 100 TB the shard count bounds every
    * partition's size and keeps pack assignment embarrassingly parallel.
    * Output: input columns + (shard, pack_id).
    */
  /** Within-pack start offsets for a [[packSequences]] output — the
    * metadata a packed training batch needs to build block-diagonal
    * attention masks (each document attends only to itself; the mask
    * boundary is its [offset, offset + n_tokens) span). One more window
    * over the SAME (shard, sort-by-id) partitioning the packer used, so
    * AQE reuses the exchange — no extra shuffle. Output: input columns +
    * pack_offset (token start within the pack). */
  def packOffsets(
      packed: DataFrame,
      idCol: String,
      tokenCountCol: Column): DataFrame = {
    require(packed.columns.contains("shard") && packed.columns.contains("pack_id"),
      "packOffsets expects a packSequences output (shard, pack_id)")
    require(!packed.columns.contains("pack_offset"),
      "packOffsets: input already has a 'pack_offset' column")
    val w = Window.partitionBy(col("shard"), col("pack_id")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    packed.withColumn("pack_offset",
      (sum(tokenCountCol.cast("long")).over(w) - tokenCountCol.cast("long")))
  }

  def packSequences(
      docs: DataFrame,
      idCol: String,
      tokenCountCol: Column,
      ctxTokens: Long,
      nShards: Int): DataFrame = {
    require(ctxTokens > 0 && nShards > 0, "packSequences needs positive budget/shards")
    // output appends (shard, pack_id) to the input schema — withColumn
    // would silently OVERWRITE same-named input columns, so reject them
    require(!docs.columns.contains("shard") && !docs.columns.contains("pack_id"),
      "packSequences: input already has a 'shard' or 'pack_id' column")
    val shard = pmod(Dedup.hash60(col(idCol).cast("string")), lit(nShards.toLong))
    val withShard = docs.withColumn("shard", shard)
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = sum(tokenCountCol.cast("long")).over(w)
    withShard.withColumn("pack_id",
      floor((cum - tokenCountCol.cast("long")) / lit(ctxTokens.toDouble)).cast("long"))
  }
}
