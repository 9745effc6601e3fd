package graft.parse

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** User-agent family normalization as an ordered compiled-pattern dispatch
  * table — pure Catalyst `when/rlike/regexp_extract` chain (codegen'd; no UDF).
  *
  * Reference semantics (reference: internal/ingestors/batch_summarizer.go:88-96,
  * behavior pinned by batch_summarizer_test.go:94-135 and the e2e goldens):
  * parse the UA into a product family (Chrome, Firefox, Googlebot, curl, ...);
  * if the parser yields nothing, fall back to the token before the first '/',
  * and finally to the original string.
  *
  * Order matters: bots before browsers (Googlebot UA contains "Mozilla"),
  * Edge/Opera before Chrome, Chrome before Safari (Chrome UA contains
  * "Safari/").
  */
object UserAgentFamily {

  /** Ordered (pattern → family) dispatch table. */
  val dispatch: Seq[(String, String)] = Seq(
    "Googlebot" -> "Googlebot",
    "bingbot" -> "Bingbot",
    "DuckDuckBot" -> "DuckDuckBot",
    "YandexBot" -> "YandexBot",
    "Edg(e|A|iOS)?/" -> "Edge",
    "OPR/|Opera/" -> "Opera",
    "Firefox/" -> "Firefox",
    "CriOS/" -> "Chrome",
    "Chrome/" -> "Chrome",
    "FxiOS/" -> "Firefox",
    "Version/.*Safari/" -> "Safari",
    "MSIE |Trident/" -> "Internet Explorer",
    "^curl/" -> "curl",
    "^Wget/" -> "Wget",
    "^python-requests/" -> "python-requests"
  )

  /** family(ua): ordered rlike dispatch, then token-before-'/' fallback,
    * then the original string.
    */
  def family(ua: Column): Column = {
    val fallback = {
      val tok = regexp_extract(ua, "^([^/ ]+)/", 1)
      when(tok =!= "", tok).otherwise(ua)
    }
    dispatch.foldRight(fallback) { case ((pat, fam), acc) =>
      when(ua.rlike(pat), lit(fam)).otherwise(acc)
    }
  }
}
