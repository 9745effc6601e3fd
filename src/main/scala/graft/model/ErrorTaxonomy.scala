package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Service-error taxonomy: stable code → (category, HTTP status, message),
  * the batch-engine analog of the reference's ServiceError surface
  * (reference: internal/shared/svcerrors/service_error.go:8-101 — categories
  * invalid_argument/400, resource_conflict/409, internal/500; code tables in
  * internal/ingestors/errors.go:9-15, internal/aggregators/errors.go:9-12).
  *
  * Code alignment note: the reference reuses ING_1001 for "batch already
  * processed" (a 409 conflict). This engine keeps the whole ING_1xxx block
  * as fine-grained validation codes (round-1 oracle compatibility) and gives
  * the conflict its own code, ING_1409 — same category/status surface,
  * strictly more precise codes.
  */
object ErrorTaxonomy {

  val CategoryInvalidArgument = "invalid_argument"
  val CategoryResourceConflict = "resource_conflict"
  val CategoryInternal = "internal"

  final case class SvcError(code: String, category: String, httpStatus: Int, message: String)

  val all: Seq[SvcError] = Seq(
    SvcError("ING_1000", CategoryInvalidArgument, 400, "validation failed: missing required field"),
    SvcError("ING_1001", CategoryInvalidArgument, 400, "validation failed: invalid value"),
    SvcError("ING_1002", CategoryInvalidArgument, 400, "validation failed: size limit exceeded"),
    SvcError("ING_1409", CategoryResourceConflict, 409, "log batch already processed"),
    SvcError("ING_9000", CategoryInternal, 500, "log batch store failed"),
    SvcError("ING_9001", CategoryInternal, 500, "partial insight publisher failed"),
    SvcError("AGG_9000", CategoryInternal, 500, "aggregate rollup failed"),
    SvcError("AGG_9001", CategoryInternal, 500, "aggregate result store failed"),
    SvcError("SYS_9000", CategoryInternal, 500, "internal panic"),
    SvcError("SYS_9001", CategoryInternal, 500, "internal undefined")
  )

  /** Category of a code column; unknown codes default to internal — the
    * reference's NewInternalErrorUndefined fallback.
    */
  def category(code: Column): Column =
    all.foldRight(lit(CategoryInternal)) { (e, acc) =>
      when(code === e.code, lit(e.category)).otherwise(acc)
    }

  def httpStatus(code: Column): Column =
    all.foldRight(lit(500)) { (e, acc) =>
      when(code === e.code, lit(e.httpStatus)).otherwise(acc)
    }

  def message(code: Column): Column =
    all.foldRight(lit("internal server error")) { (e, acc) =>
      when(code === e.code, lit(e.message)).otherwise(acc)
    }

  // --- DuckDB mirrors, generated from the same table ---

  def categorySqlDuck(codeExpr: String): String =
    all.map(e => s"WHEN $codeExpr = '${e.code}' THEN '${e.category}'")
      .mkString("CASE ", " ", s" ELSE '$CategoryInternal' END")

  def httpStatusSqlDuck(codeExpr: String): String =
    all.map(e => s"WHEN $codeExpr = '${e.code}' THEN ${e.httpStatus}")
      .mkString("CASE ", " ", " ELSE 500 END")
}
