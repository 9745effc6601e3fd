package graft.parse

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Parse/normalize/validate stage for log-shaped rows — the Spark
  * re-expression of the reference's ingest validation + normalization
  * (reference: internal/ingestors/ingestion_service.go:100-265).
  *
  * All stateless → pure Catalyst expressions; invalid rows are routed to a
  * quarantine sink with an error-code column instead of failing the job
  * (the batch-engine analog of the reference's per-batch HTTP 400,
  * reference: internal/ingestors/errors.go:9-35).
  */
object LogParse {

  /** Validation caps (reference: internal/ingestors/ingestion_service.go:20-24). */
  val MaxPathLen = 2048
  val MaxUserAgentLen = 1024

  /** Two-format timestamp parse: ISO-8601 with milliseconds, then RFC3339
    * fallback (reference: internal/ingestors/ingestion_service.go:250-265).
    */
  def parseTimestamp(c: Column): Column =
    coalesce(
      try_to_timestamp(c, lit("yyyy-MM-dd'T'HH:mm:ss.SSSXXX")),
      try_to_timestamp(c, lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
      try_to_timestamp(c))

  /** Normalization (reference: internal/ingestors/ingestion_service.go:233-237):
    * method upper+trim, path trim, userAgent trim.
    */
  def normalized(df: DataFrame): DataFrame = df
    .withColumn("method", upper(trim(col("method"))))
    .withColumn("path", trim(col("path")))
    .withColumn("userAgent", trim(col("userAgent")))

  /** Normalized path key: UPPER(method) + " " + path
    * (reference: internal/ingestors/batch_summarizer.go:51-53).
    */
  def pathKey(method: Column, path: Column): Column =
    concat_ws(" ", upper(method), path)

  /** Error-code classification of raw rows; null = valid.
    * Codes mirror the reference taxonomy (ING_1000 = missing field,
    * ING_1001 = invalid value; reference: internal/ingestors/errors.go:9-35).
    */
  def errorCode(df: DataFrame): Column = {
    val tsOk = parseTimestamp(col("receivedAt")).isNotNull
    when(col("receivedAt").isNull || col("method").isNull ||
      col("path").isNull || col("userAgent").isNull, lit("ING_1000"))
      .when(!tsOk, lit("ING_1001"))
      .when(length(col("path")) > MaxPathLen, lit("ING_1001"))
      .when(length(col("userAgent")) > MaxUserAgentLen, lit("ING_1001"))
      .otherwise(lit(null).cast("string"))
  }

  /** Split a raw log DataFrame with a string `receivedAt` into
    * (valid-normalized, quarantine). Valid rows gain a parsed `ts` column.
    */
  def parse(raw: DataFrame): (DataFrame, DataFrame) = {
    val classified = raw.withColumn("error_code", errorCode(raw))
    val quarantine = classified.filter(col("error_code").isNotNull)
    val valid = normalized(classified.filter(col("error_code").isNull))
      .withColumn("ts", parseTimestamp(col("receivedAt")))
      .drop("error_code")
    (valid, quarantine)
  }
}
