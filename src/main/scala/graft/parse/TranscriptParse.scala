package graft.parse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grok-style parse stage over the transcript table's `text` column: a
  * compiled-pattern dispatch table that extracts structured fields
  * (tool invocations, error markers, role tags) as pure Catalyst
  * `rlike`/`regexp_extract` expressions — whole-stage-codegen friendly,
  * no UDFs.
  *
  * Reference analog: the ingest parse/normalize projection + the
  * summarizer's dimension derivation
  * (reference: internal/ingestors/ingestion_service.go:175-247,
  * internal/ingestors/batch_summarizer.go:51-57).
  */
object TranscriptParse {

  /** Compiled-pattern dispatch table: (field, regex, group). Each entry
    * yields one extracted column; empty match → null.
    */
  val grokTable: Seq[(String, String, Int)] = Seq(
    ("tool_invoked", "<tool:([a-zA-Z0-9_-]+)[ >]", 1),
    ("tool_arg", "<tool:[a-zA-Z0-9_-]+ arg=([^>]*)>", 1),
    ("error_code", "ERROR\\[([A-Za-z0-9_-]+)\\]", 1),
    ("role_tag", "\\[\\[role:([a-z]+)\\]\\]", 1)
  )

  val validRoles: Seq[String] = Seq("user", "assistant", "system", "tool")

  private def extracted(field: String, src: Column): Column = {
    val (_, pat, grp) = grokTable.find(_._1 == field).get
    val e = regexp_extract(src, pat, grp)
    when(e =!= "", e).otherwise(lit(null).cast("string"))
  }

  /** Error-code classification of raw transcript rows; null = valid.
    * ING_1000 = missing required field; ING_1001 = invalid value
    * (taxonomy per reference: internal/ingestors/errors.go:9-35).
    */
  def errorCode(maxTextLen: Int): Column =
    when(col("conv_id").isNull || col("turn_idx").isNull ||
      col("text").isNull || col("ts").isNull, lit("ING_1000"))
      .when(col("turn_idx") < 0, lit("ING_1001"))
      .when(length(col("text")) > maxTextLen, lit("ING_1001"))
      .when(!lower(trim(col("role"))).isin(validRoles: _*), lit("ING_1001"))
      .otherwise(lit(null).cast("string"))

  /** Split raw transcript rows into (parsed-valid, quarantine).
    *
    * The parsed side drops the wide `text` column after extraction so no
    * downstream shuffle carries it (SURVEY.md §7.4 risk 4); callers that
    * need per-turn text (routing to bronze, text-equality checks) use
    * `parseKeepText`.
    */
  def parse(raw: DataFrame, maxTextLen: Int = 8192): (DataFrame, DataFrame) = {
    val (valid, quarantine) = parseKeepText(raw, maxTextLen)
    (valid.drop("text"), quarantine)
  }

  def parseKeepText(raw: DataFrame, maxTextLen: Int = 8192): (DataFrame, DataFrame) = {
    val (valid, quarantine) = classify(raw, maxTextLen)
    (extract(valid), quarantine)
  }

  /** Stage 1 of the parse: the validation SPLIT only, no extraction. Kept
    * separate so the pipeline can quarantine invalid rows BEFORE dedup —
    * invalid rows may have null key fields and would otherwise collapse
    * under the dedup key instead of being quarantined verbatim.
    */
  def classify(raw: DataFrame, maxTextLen: Int = 8192): (DataFrame, DataFrame) = {
    val classified = raw.withColumn("error_code_v", errorCode(maxTextLen))
    val quarantine = classified.filter(col("error_code_v").isNotNull)
      .withColumnRenamed("error_code_v", "error_code")
    val valid = classified.filter(col("error_code_v").isNull).drop("error_code_v")
    (valid, quarantine)
  }

  /** Stage 2: grok extraction + normalization over validated rows
    * (row-preserving — never filters).
    */
  def extract(valid: DataFrame): DataFrame =
    valid
      .withColumn("role", lower(trim(col("role"))))
      .withColumn("tool_invoked", extracted("tool_invoked", col("text")))
      .withColumn("tool_arg", extracted("tool_arg", col("text")))
      .withColumn("error_code", extracted("error_code", col("text")))
      .withColumn("has_error", extracted("error_code", col("text")).isNotNull)
      .withColumn("word_count", size(split(trim(col("text")), "\\s+")))
      .withColumn("char_count", length(col("text")))
}
