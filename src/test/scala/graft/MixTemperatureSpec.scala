package graft

import org.apache.spark.sql.functions._

/** Temperature-based language mixing (tx_mix_temperature): budgets follow
  * the size^0.5 share of corpus tokens (low-resource languages get MORE
  * than their proportional share), budgets never exceed the global
  * budget, and the kept set is exactly the per-language doc_id-order
  * prefix under the budget.
  */
class MixTemperatureSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  test("budgets are the integer sqrt-share of the global budget") {
    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("lang"), org.apache.spark.sql.functions.size(split(lower(col("text")), " ")).as("tokens"))
      .groupBy("lang").agg(sum("tokens").as("tot"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val sqi = toks.map { case (l, t) => l -> math.floor(math.sqrt(t.toDouble) * 1000).toLong }
    val denom = sqi.values.sum
    val expected = sqi.map { case (l, s) => l -> (12000L * s) / denom }

    val out = SparkEntry.queries("tx_mix_temperature")(spark, dir)
    val budgets = out.select("lang", "budget").distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // every language that kept at least one doc carries exactly the
    // integer-domain sqrt-share budget
    budgets.foreach { case (l, b) => b shouldBe expected(l) }
    // the global budget is never exceeded (integer division rounds down)
    expected.values.sum should be <= 12000L
  }

  test("temperature up-weights low-resource languages vs proportional share") {
    val toks = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("lang"), org.apache.spark.sql.functions.size(split(lower(col("text")), " ")).as("tokens"))
      .groupBy("lang").agg(sum("tokens").as("tot"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = toks.values.sum
    val sqi = toks.map { case (l, t) => l -> math.floor(math.sqrt(t.toDouble) * 1000).toLong }
    val denom = sqi.values.sum
    val smallest = toks.minBy(_._2)._1
    val largest = toks.maxBy(_._2)._1
    assume(toks(smallest) < toks(largest), "corpus has skewed languages")
    val tempShare = sqi(smallest).toDouble / denom
    val propShare = toks(smallest).toDouble / total
    tempShare should be > propShare
    val tempShareL = sqi(largest).toDouble / denom
    val propShareL = toks(largest).toDouble / total
    tempShareL should be < propShareL
  }

  test("the kept set is the exact per-language prefix under the budget") {
    val out = SparkEntry.queries("tx_mix_temperature")(spark, dir).collect()
    out.foreach { r =>
      val cum = r.getAs[Long]("lang_cum")
      val budget = r.getAs[Long]("budget")
      assert(cum < budget, s"doc ${r.getAs[Long]("doc_id")} kept at cum=$cum >= budget=$budget")
    }
    // prefix property: within a language, every kept doc's id is below
    // every dropped doc's id OR the dropped doc appears after the budget
    // was exhausted — equivalently, kept docs per language are a prefix
    // in doc_id order of the docs whose exclusive cum fits
    val byLang = out.groupBy(_.getAs[String]("lang"))
    byLang.foreach { case (_, rows) =>
      val ids = rows.map(_.getAs[Long]("doc_id")).sorted
      val cums = rows.sortBy(_.getAs[Long]("doc_id")).map(_.getAs[Long]("lang_cum"))
      // cum is non-decreasing in doc_id order within the kept prefix
      cums.sliding(2).foreach {
        case Array(a, b) => assert(a <= b)
        case _ =>
      }
      ids.distinct.length shouldBe ids.length
    }
  }
}
