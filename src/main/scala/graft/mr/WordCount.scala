package graft.mr

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables

/** The reference's one shipped workload (SURVEY.md §2.1 O9): tokenize with
  * the exact mapper regex (/root/reference/client/scripts/mapper.py:13,
  * `[a-z](?:[a-z'‘’]*[a-z])?` over the lowercased line) and count per word.
  *
  * Spark-first shape: `regexp_extract_all` + `explode` + two-phase hash
  * aggregation. Versus the reference's combiner-less hash shuffle of one
  * `word\t1` line per token (cmd/azure/azure_util.go:234-246), Spark's
  * partial aggregation shrinks the shuffle from O(tokens) to
  * O(distinct words × partitions) — the difference between shuffling
  * ~100 TB and ~GBs at corpus scale.
  */
object WordCount {
  /** Tokenizer regex, byte-identical semantics to the reference mapper. */
  val TokenPattern = "[a-z](?:[a-z'‘’]*[a-z])?"

  def countTokens(lines: DataFrame, textCol: String): DataFrame = {
    val spark = lines.sparkSession
    import spark.implicits._
    lines
      .select(explode(regexp_extract_all(lower(col(textCol)), lit(TokenPattern), lit(0))).as("word"))
      .groupBy($"word")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Word count over the documents fixture (driver-visible query). */
  def onDocuments(s: SparkSession, d: String): DataFrame =
    countTokens(Tables.documents(s, d), "text")

  /** Word count over raw text files — the reference's actual input shape
    * (byte-range sharded text scan ≈ FileSourceScanExec splits). */
  def onTextFiles(s: SparkSession, paths: String*): DataFrame =
    countTokens(s.read.textFile(paths: _*).toDF("value"), "value")

  val oracle: Map[String, String] = Map(
    "wordcount" -> """
      SELECT w AS word, count(*) AS cnt FROM (
        SELECT unnest(regexp_extract_all(lower(text), '[a-z](?:[a-z''‘’]*[a-z])?')) AS w
        FROM documents
      ) t GROUP BY w"""
  )
}
