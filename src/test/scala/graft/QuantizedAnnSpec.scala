package graft

/** Quantized-domain ANN (ann_topk_quantized): int8 search must rank almost
  * exactly like float search — the whole point of shipping the 4×-smaller
  * index. The symmetric scales cancel out of the cosine, so the quantized
  * score is a pure integer-domain computation; this spec pins the recall
  * against the exact float top-k on the real test embeddings.
  */
class QuantizedAnnSpec extends SparkSpecBase {

  private val sf = "/root/testdata/sf0.001"

  test("quantized top-10 recalls >= 8 of the exact float top-10") {
    val exact = OpsQueries.queries("ann_topk_bruteforce")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val quant = OpsQueries.queries("ann_topk_quantized")(spark, sf)
      .collect().map(_.getLong(0)).toSet
    exact.size shouldBe 10
    quant.size shouldBe 10
    (exact intersect quant).size should be >= 8
  }

  test("quantized scores sit within the int8 reconstruction band of the float scores") {
    // |cos_q - cos| is bounded by the quantization noise; with 64 dims and
    // half-step rounding the observed band is well under 0.05.
    val exact = OpsQueries.queries("ann_topk_bruteforce")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val quant = OpsQueries.queries("ann_topk_quantized")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val both = exact.keySet intersect quant.keySet
    both should not be empty
    both.foreach { id => math.abs(exact(id) - quant(id)) should be < 0.05 }
  }
}
