package graft

import org.apache.spark.sql.functions._
import graft.agg.MapMergeAggregator

/** The typed map-merge Aggregator: rollup merge laws on map-valued rows
  * (reference: internal/aggregators/aggregate_rolluper_test.go:13-161).
  */
class MapMergeSpec extends SparkSpecBase {
  import spark.implicits._

  test("map-merge aggregator: pointwise sum + new-key insert + sorted output") {
    val df = Seq(
      ("c1", Map("GET /" -> 3L, "GET /about" -> 2L)),
      ("c1", Map("GET /" -> 4L, "GET /careers" -> 1L)),
      ("c2", Map("GET /" -> 7L))
    ).toDF("customer", "counts")

    val out = df.groupBy("customer")
      .agg(MapMergeAggregator.asUdaf(col("counts")).as("merged"))
      .orderBy("customer")

    val rows = out.collect()
    rows(0).getMap[String, Long](1).toMap shouldBe
      Map("GET /" -> 7L, "GET /about" -> 2L, "GET /careers" -> 1L)
    rows(1).getMap[String, Long](1).toMap shouldBe Map("GET /" -> 7L)
    // deterministic sorted key order inside the map column
    out.select(map_keys(col("merged")).as("ks"))
      .filter(expr("ks != array_sort(ks)")).count() shouldBe 0
  }

  test("map-merge distributes over partial/final split (partition-order invariant)") {
    val rows = (0 until 1000).map { i =>
      ("c1", Map(s"k${i % 7}" -> 1L))
    }
    val df = spark.createDataFrame(rows).toDF("customer", "counts")
      .repartition(8)
    val merged = df.groupBy("customer")
      .agg(MapMergeAggregator.asUdaf(col("counts")).as("merged"))
      .collect().head.getMap[String, Long](1).toMap
    merged.values.sum shouldBe 1000L
    merged.keySet shouldBe (0 until 7).map(i => s"k$i").toSet
  }
}
