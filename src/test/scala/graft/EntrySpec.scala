package graft

/** Driver-contract smoke: entry() returns rows on sf0.001; every oracleSql
  * key has a matching queries entry (column-name contract).
  */
class EntrySpec extends SparkSpecBase {
  test("entry() produces rows on sf0.001") {
    SparkEntry.entry(spark).count() should be > 0L
  }

  test("every oracleSql key has a queries implementation") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    missing shouldBe empty
  }

  test("materializeCtes hints plain CTEs, skips recursive tables and WINDOW clauses") {
    SparkEntry.materializeCtes("SELECT 1 AS x") shouldBe "SELECT 1 AS x"
    SparkEntry.materializeCtes("WITH a AS (SELECT 1) SELECT * FROM a") shouldBe
      "WITH a AS MATERIALIZED (SELECT 1) SELECT * FROM a"
    // recursive working tables can't take the hint
    SparkEntry.materializeCtes(
      "WITH RECURSIVE reach(id, r) AS (SELECT 1, 1) SELECT * FROM reach") shouldBe
      "WITH RECURSIVE reach(id, r) AS (SELECT 1, 1) SELECT * FROM reach"
    // named WINDOW clauses share the `name AS (` shape but are not CTEs
    val w = "WITH s AS (SELECT 1 AS v FROM t WINDOW w AS (PARTITION BY v)) SELECT * FROM s"
    SparkEntry.materializeCtes(w) shouldBe
      "WITH s AS MATERIALIZED (SELECT 1 AS v FROM t WINDOW w AS (PARTITION BY v)) SELECT * FROM s"
  }

  test("all queries run on sf0.001 and produce rows") {
    val empty = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val n = fn(spark, "/root/testdata/sf0.001").count()
      if (n == 0) Some(name) else None
    }
    // near-dup pair queries may legitimately be empty at tiny scale —
    // everything else must return rows
    empty.filterNot(Set("dd_ngram_jaccard", "emb_neardup_cosine")) shouldBe empty
  }
}
