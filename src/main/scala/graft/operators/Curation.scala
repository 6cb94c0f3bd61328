package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Corpus-curation operators a large-scale training-data pipeline needs
  * beyond dedup/similarity: chunking, deterministic sampling, PII
  * scrubbing. All pure column expressions or a single explode — scan
  * speed, no shuffle, codegen'd, and every one has a DuckDB oracle.
  */
object Curation {

  /** Split documents into fixed-size word chunks with overlap — the
    * standard pre-tokenization step for long documents. One
    * `posexplode` per doc; stride = chunkWords - overlapWords. Chunk
    * boundaries are word-aligned and deterministic, so chunking is
    * reproducible across runs/engines (required when chunk ids feed
    * dedup or curriculum sampling downstream).
    */
  def chunk(
      df: DataFrame,
      idCol: String,
      textCol: String,
      chunkWords: Int = 64,
      overlapWords: Int = 8
  ): DataFrame = {
    require(overlapWords < chunkWords, "overlap must be smaller than the chunk")
    val stride = chunkWords - overlapWords
    df.withColumn("__toks", split(col(textCol), " "))
      .select(
        col(idCol),
        posexplode(
          expr(
            s"transform(sequence(0, greatest(cast(ceil((size(__toks) - $overlapWords) / " +
              s"cast($stride as double)) as int) - 1, 0)), " +
              s"i -> concat_ws(' ', slice(__toks, i * $stride + 1, $chunkWords)))"
          )
        ).as(Seq("chunk_idx", "chunk_text"))
      )
      .withColumn("chunk_words", size(split(col("chunk_text"), " ")))
  }

  /** Deterministic fraction sampling keyed on the document id: keep the
    * row when the first 8 hex digits of md5(id) land under the
    * threshold. Unlike `df.sample`, the decision is a pure function of
    * the id — stable across runs, engines, partitionings, and
    * re-executions (a lineage re-run samples the SAME rows), which is
    * what makes held-out splits reproducible. Narrow map, no shuffle.
    */
  def sampleByHash(df: DataFrame, idCol: String, percent: Int): Column = {
    require(percent >= 0 && percent <= 100, "percent in [0,100]")
    conv(substring(md5(col(idCol).cast("string").cast("binary")), 1, 8), 16, 10)
      .cast("long") % 100 < percent
  }

  /** PII scrubbing: replace emails / international phone numbers / IPv4
    * addresses with typed placeholder tags. Pure regexp_replace chain
    * (codegen'd, scan-speed); patterns are RE2-class so the DuckDB
    * oracle applies the identical regexes.
    */
  def scrubPii(text: Column): Column = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phone = "\\+[0-9]{1,3}[- ][0-9]{3,4}[- ][0-9]{3,4}[- ]?[0-9]{0,4}"
    val ipv4 = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
    regexp_replace(
      regexp_replace(
        regexp_replace(text, email, "<EMAIL>"),
        phone,
        "<PHONE>"
      ),
      ipv4,
      "<IP>"
    )
  }
}
