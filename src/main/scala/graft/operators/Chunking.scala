package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Context-length preparation: split documents into overlapping
 * token-window chunks (the RAG / pretraining "max sequence length"
 * pre-pass) — every chunk except possibly the last holds exactly
 * `maxTokens` tokens, consecutive chunks share `overlap`, and no token is
 * lost ([[graft.core.text.TextOps.chunks]] semantics).
 *
 * Purely row-local: one codegen'd chunking expression + posexplode — no
 * shuffle, no state, trivially scalable; the chunk multiplicity is the
 * only data growth. Output keeps every input column, replaces `textCol`
 * with the chunk text, and adds `chunk_id` (0-based within the doc).
 * Documents with no tokens produce no rows, by contract (there is nothing
 * to train on).
 */
object Chunking {

  def splitByTokens(docs: DataFrame, maxTokens: Int, overlap: Int = 0,
                    textCol: String = "text"): DataFrame = {
    // re-chunking already-chunked output would silently create a duplicate
    // chunk_id column and ambiguous downstream references — make it explicit
    require(!docs.columns.contains("chunk_id"),
      "splitByTokens input already has a chunk_id column — rename or drop " +
        "it before re-chunking")
    val chunks = graft.functions.GraftFunctions.chunk_text(
      col(textCol), maxTokens, overlap)
    docs.select(col("*"), posexplode(chunks).as(Seq("chunk_id", "__chunk")))
      .withColumn(textCol, col("__chunk"))
      .drop("__chunk")
  }
}
