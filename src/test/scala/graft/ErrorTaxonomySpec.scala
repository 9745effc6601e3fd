package graft

import org.apache.spark.sql.functions._
import graft.model.ErrorTaxonomy

/** Code → (category, http, message) surface: table completeness, the
  * unknown-code internal fallback, and Spark/DuckDB-SQL mirror agreement.
  */
class ErrorTaxonomySpec extends SparkSpecBase {
  import spark.implicits._

  test("every code maps to its category and status; unknown falls back to internal/500") {
    val codes = (ErrorTaxonomy.all.map(_.code) :+ "NOPE_1234").toDF("code")
    val out = codes.select(col("code"),
        ErrorTaxonomy.category(col("code")).as("cat"),
        ErrorTaxonomy.httpStatus(col("code")).as("http"))
      .collect().map(r => r.getString(0) -> ((r.getString(1), r.getInt(2)))).toMap
    for (e <- ErrorTaxonomy.all)
      out(e.code) shouldBe ((e.category, e.httpStatus))
    out("NOPE_1234") shouldBe (("internal", 500))
  }

  test("categories carry the reference's status mapping (400/409/500)") {
    ErrorTaxonomy.all.foreach { e =>
      e.category match {
        case ErrorTaxonomy.CategoryInvalidArgument => e.httpStatus shouldBe 400
        case ErrorTaxonomy.CategoryResourceConflict => e.httpStatus shouldBe 409
        case ErrorTaxonomy.CategoryInternal => e.httpStatus shouldBe 500
      }
    }
    ErrorTaxonomy.all.map(_.code).distinct.size shouldBe ErrorTaxonomy.all.size
  }

  test("generated SQL mirror has one branch per code") {
    val sql = ErrorTaxonomy.categorySqlDuck("c")
    ErrorTaxonomy.all.foreach(e => sql should include(e.code))
    sql should include("ELSE 'internal'")
  }
}
