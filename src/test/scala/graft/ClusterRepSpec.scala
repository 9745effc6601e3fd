package graft

import org.apache.spark.sql.functions._

/** dd_cluster_rep (quality-aware cluster representative): exactly one
  * kept member per cluster, the representative is the argmax-quality
  * member (ties → lowest doc_id), and the clustering itself is the same
  * partition dd_cluster_resolve produces.
  */
class ClusterRepSpec extends SparkSpecBase {

  private val dir = "/root/testdata/sf0.001"

  test("one kept per cluster; rep = argmax quality with doc_id tie-break; same partition as dd_cluster_resolve") {
    val rows = OpsQueries.queries("dd_cluster_rep")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3), r.getBoolean(4)))

    // every doc appears exactly once
    rows.map(_._1).distinct.length shouldBe rows.length

    val byCluster = rows.groupBy(_._2)
    byCluster.foreach { case (cluster, members) =>
      val rep = members.head._4
      // all members agree on the rep, and the rep is a member
      members.map(_._4).distinct shouldBe Array(rep)
      members.map(_._1) should contain(rep)
      // rep is the argmax-quality member, ties broken by lowest doc_id
      val expected = members.maxBy(m => (m._3, -m._1))._1
      rep shouldBe expected
      // exactly the rep is kept
      members.filter(_._5).map(_._1) shouldBe Array(rep)
    }

    // the cluster partition matches dd_cluster_resolve's (same memoized
    // pair frame, min-label relabeled is irrelevant — compare as sets of
    // member sets)
    val resolve = OpsQueries.queries("dd_cluster_resolve")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val partsA = byCluster.values.map(_.map(_._1).toSet).toSet
    val partsB = resolve.groupBy(_._2).values.map(_.map(_._1).toSet).toSet
    partsA shouldBe partsB

    // the policy BITES on this corpus: at least one multi-doc cluster
    // keeps a different doc than min-label would
    val minLabelReps = resolve.filter(r => r._1 == r._2).map(_._1).toSet
    val qualityReps = rows.filter(_._5).map(_._1).toSet
    qualityReps should not be minLabelReps
  }

  test("corpus_build_qrep keeps one rep per cluster — same count as corpus_build, argmax picks") {
    val build = OpsQueries.queries("corpus_build")(spark, dir).collect()
      .map(_.getLong(0)).toSet
    val qrep = OpsQueries.queries("corpus_build_qrep")(spark, dir).collect()
      .map(_.getLong(0)).toSet
    // same cluster partition ⇒ same number of representatives (the
    // argmax SEMANTICS are gated by the DuckDB oracle; this asserts the
    // two policies walk the same clusters)
    qrep.size shouldBe build.size
  }
}
