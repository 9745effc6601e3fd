package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]` → cast to
  * double): brute-force cosine top-k as the exact baseline and an IVF
  * (inverted-file) index as the scale path — centroids from a deterministic
  * one-iteration Lloyd refinement of seed vectors, probe only the nprobe
  * nearest cells.
  *
  * Scale shape: the centroid table is tiny (nCells ≤ a few hundred), so it
  * lives on the DRIVER and is inlined into the plan as array literals.
  * Cell assignment is then a single shuffle-free PROJECTION (argmax over
  * nCells inlined dot products, whole-stage codegen'd); the Lloyd update is
  * one partial-aggregated groupBy whose exchange carries only
  * nCells × (dim+1) doubles per map task. No join, no window, no vector
  * payload ever crosses a shuffle. (Round-1 review flagged the previous
  * crossJoin + row_number argmin as a scale-killer — three full shuffles of
  * 16× the dataset including payloads.)
  */
object Similarity {

  /** Driver-held IVF index: (cell id, centroid) pairs. */
  final case class IvfModel(centroids: Seq[(Int, Array[Double])]) {
    def dim: Int = centroids.head._2.length
  }

  // Codegen'd exact dot (round-8): bit-identical to the previous
  // aggregate(zip_with(...)) fold — see graft.functions.DotExact — but
  // inside the whole-stage span instead of an interpreted HOF lambda.
  private def dot(a: String, b: String): Column =
    graft.functions.DotExact.dotExact(col(a), col(b))

  /** Decimal places every Lloyd-refined centroid component is rounded to —
    * in BOTH builds (driver model, DataFrame table) and in the DuckDB
    * oracle mirror (`OpsQueries.ivfCentsSql`). The refined mean's double
    * summation ORDER differs between engines (Spark partition-order
    * partials vs sequential SQL sums), so unrounded centroids can differ
    * by a ULP and flip a cell assignment or probe choice on a near-tie —
    * a data-dependent flaky oracle (round-5 advice, low). Rounding to 6
    * decimals puts the cross-engine agreement boundary ~10 orders of
    * magnitude above ULP noise while leaving recall unmeasurably changed.
    */
  val CentroidScale = 6
  private def roundCentroid(x: Double): Double =
    BigDecimal(x).setScale(CentroidScale, BigDecimal.RoundingMode.HALF_UP)
      .toDouble

  /** dot(v, literal centroid) as a pure fold over an inlined array — no
    * join against a centroid table. typedLit, not array(lit...): the whole
    * centroid is ONE Literal node, so 16 centroids × 64 dims add 16 plan
    * nodes instead of ~1000 (optimizer time dominated the query otherwise).
    */
  private def dotLit(v: Column, c: Array[Double]): Column =
    graft.functions.DotExact.dotExact(v, typedLit(c.toSeq))

  /** Deterministic synthetic vector set for specs and plan dumps (pure
    * hash arithmetic over spark.range — no RNG), already `prepare`d.
    * One definition so the plan-shape gates, the equivalence specs, and
    * the dumped PLANS.md all exercise the identical data shape.
    */
  def syntheticVectors(
      spark: SparkSession,
      n: Long,
      dim: Int = 64,
      partitions: Int = 4
  ): DataFrame =
    prepare(spark.range(0, n, 1, partitions).toDF("vec_id")
      .select(col("vec_id"), expr(
        s"""transform(sequence(1, $dim),
           |  i -> CAST(pmod(hash(vec_id, i), 1000) AS FLOAT) / 500.0 - 1.0)"""
          .stripMargin.replace("\n", " ")).as("embedding")))

  /** Vectors as (vec_id, v: array<double>, nrm). */
  def prepare(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      .withColumn("nrm", sqrt(dot("v", "v")))

  /** Exact cosine top-k against the vector with id `queryId`. */
  def bruteForceTopK(e: DataFrame, queryId: Long, k: Int): DataFrame = {
    val q = e.filter(col("vec_id") === queryId)
      .select(col("v").as("qv"), col("nrm").as("qn"))
    e.filter(col("vec_id") =!= queryId).crossJoin(broadcast(q))
      .withColumn("cos_sim", dot("v", "qv") / (col("nrm") * col("qn")))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
      .limit(k)
      .select(col("vec_id"), col("cos_sim"))
  }

  /** Nearest-centroid cell of column `v` (dot-product argmax; nrm is a
    * per-row constant so cosine and dot argmax agree). Ties break to the
    * smallest cell id via the negated-id struct max. Pure projection.
    */
  def assignCell(model: IvfModel): Column = {
    val entries = model.centroids.map { case (cell, cv) =>
      struct(dotLit(col("v"), cv).as("d"), lit(-cell).as("negk"))
    }
    (-array_max(array(entries: _*)).getField("negk")).cast("int")
  }

  /** Build the IVF index: seeds = the `nCells` lowest-vec_id vectors
    * (deterministic), refined by one Lloyd iteration. Driver work is
    * O(nCells·dim); cluster work is one projection + one partial-agg
    * shuffle of nCells×(dim+1) doubles.
    */
  def buildIvfModel(e: DataFrame, nCells: Int): IvfModel =
    kmeansModel(e, nCells, iters = 1)

  /** Deterministic k-means: seeds = the `nCells` lowest-vec_id vectors,
    * refined by `iters` Lloyd steps (each step's centroids rounded to
    * [[CentroidScale]] so the cross-engine oracle stays exact). The IVF
    * build is the iters=1 special case; clustering for diversity
    * sampling / topic balance wants a few more steps. Per step the
    * cluster work is one assignment projection (broadcast/literal
    * centroids — vectors never shuffle) plus one partial-agg exchange of
    * nCells×(dim+1) doubles; driver work is O(nCells·dim·iters).
    */
  def kmeansModel(e: DataFrame, nCells: Int, iters: Int): IvfModel = {
    val seeds = e.orderBy("vec_id").limit(nCells).select("v").collect()
      .zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](0).toArray) }
    (1 to iters).foldLeft(IvfModel(seeds.toIndexedSeq))((m, _) => lloydStep(e, m))
  }

  /** One Lloyd step: element-wise mean per cell via dim map-side-combined
    * sums — the exchange carries only the tiny per-cell partials. Cells
    * that lost every vector keep their previous centroid.
    */
  private def lloydStep(e: DataFrame, m0: IvfModel): IvfModel = {
    val dim = m0.dim
    val sums = (0 until dim).map(i => sum(element_at(col("v"), i + 1)).as(s"s$i"))
    val stats = e.select(assignCell(m0).as("cell"), col("v"))
      .groupBy("cell")
      .agg(count(lit(1)).as("n"), sums: _*)
      .collect()
    val refined = stats.map { r =>
      val cell = r.getInt(0)
      val n = r.getLong(1).toDouble
      cell -> Array.tabulate(dim)(i => roundCentroid(r.getDouble(2 + i) / n))
    }.sortBy(_._1)
    val byCell = refined.toMap
    IvfModel(m0.centroids.map { case (c, cv) => c -> byCell.getOrElse(c, cv) })
  }

  /** Compatibility surface: (centroids, assignments) as DataFrames.
    * Assignments are a pure projection over `e` (no shuffle).
    */
  def buildIvf(spark: SparkSession, e: DataFrame, nCells: Int): (DataFrame, DataFrame) = {
    val model = buildIvfModel(e, nCells)
    import spark.implicits._
    val cents = model.centroids.map { case (c, cv) => (c, cv.toSeq) }
      .toDF("cell", "cv")
    (cents, e.select(col("vec_id"), assignCell(model).as("cell")))
  }

  /** IVF-probed approximate top-k: search only the `nprobe` cells nearest
    * to the query vector. Probe selection runs on the driver (nCells dot
    * products); the cluster side is one filter+projection pass ending in
    * TakeOrderedAndProject — no exchange before the final top-k gather.
    */
  def ivfTopK(
      spark: SparkSession,
      e: DataFrame,
      queryId: Long,
      k: Int,
      nCells: Int = 16,
      nprobe: Int = 4,
      modelOpt: Option[IvfModel] = None
  ): DataFrame = {
    val model = modelOpt.getOrElse(buildIvfModel(e, nCells))
    val qv = e.filter(col("vec_id") === queryId).select("v")
      .collect()(0).getSeq[Double](0).toArray
    val qn = math.sqrt(qv.map(x => x * x).sum)
    val probed = model.centroids
      .map { case (c, cv) => (c, cv.zip(qv).map { case (a, b) => a * b }.sum) }
      .sortBy { case (c, d) => (-d, c) }
      .take(nprobe).map(_._1).toSet
    e.withColumn("cell", assignCell(model))
      .filter(col("cell").isin(probed.toSeq: _*) && col("vec_id") =!= queryId)
      .withColumn("cos_sim", dotLit(col("v"), qv) / (col("nrm") * lit(qn)))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
      .limit(k)
      .select(col("vec_id"), col("cos_sim"))
  }

  // --------------------------------------------------------------------
  // Broadcast-centroid IVF (round-2 review item #6): the literal-centroid
  // path above inlines centroids into the PLAN, which caps nCells at a few
  // hundred (plan size, driver round-trip). The path below keeps centroids
  // in a DataFrame end-to-end: a production 10⁹-vector index wants
  // nCells ≈ √n ≈ 30k, which is still tiny DATA but far too big a PLAN.
  // --------------------------------------------------------------------

  /** Centroid table folded into ONE row carrying array<struct<cell, cv>>,
    * then attached to every data row via a single-row broadcast
    * nested-loop join. Cell assignment stays a row-local argmax fold over
    * that array column — no row multiplication (never n×nCells rows), no
    * shuffle of the vector side, and whole-stage codegen keeps the
    * broadcast row a reference (the array is not copied per row).
    */
  def assignCellBroadcast(e: DataFrame, cents: DataFrame): DataFrame = {
    // dot_exact: the codegen'd exact fold (graft.functions.DotExact),
    // registered per session so the transform lambda can call it —
    // bit-identical to the aggregate(zip_with(...)) form it replaces.
    graft.functions.DotExact.register(e.sparkSession)
    val centsRow = cents.agg(collect_list(struct(col("cell"), col("cv"))).as("__cents"))
    e.crossJoin(broadcast(centsRow))
      .withColumn("cell", expr(
        """CAST(-(array_max(transform(__cents, c -> struct(
          |dot_exact(v, c.cv) AS d,
          |-c.cell AS negk))).negk) AS INT)""".stripMargin.replace("\n", " ")))
      .drop("__cents")
  }

  /** IVF index as a (cell, cv) DataFrame, built fully distributed: seeds =
    * the nCells lowest-vec_id vectors, one Lloyd refinement whose exchange
    * carries only nCells × (dim+1) doubles. The driver never holds a
    * centroid; the result is localCheckpoint'ed (nCells rows) so downstream
    * query plans scan it instead of replaying the build.
    */
  def buildIvfTable(
      e: DataFrame,
      nCells: Int,
      dimOpt: Option[Int] = None,
      reliable: Boolean = false
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Derive the dimensionality from the data unless the caller knows it
    // (round-3 advice: a hardcoded dim silently null-contaminates the
    // Lloyd means for any other embedding width). One limit-1 probe job;
    // an EMPTY input degrades to an empty centroid table (dim value is
    // then irrelevant) instead of crashing the probe.
    val dim = dimOpt.getOrElse(
      e.select(size(col("v")).as("d")).head(1).headOption
        .map(_.getInt(0)).getOrElse(1))
    // row_number over a global order is the low-cardinality-window
    // anti-pattern IN GENERAL; here it runs over the nCells-row limit
    // result, which is single-partition by construction.
    val seeds = Materialize.stable(
      e.orderBy("vec_id").limit(nCells)
        .withColumn("cell",
          (row_number().over(Window.orderBy("vec_id")) - 1).cast("int"))
        .select(col("cell"), col("v").as("cv")),
      reliable)
    val sums = (0 until dim).map(i => sum(element_at(col("v"), i + 1)).as(s"s$i"))
    val stats = assignCellBroadcast(e, seeds)
      .groupBy("cell").agg(count(lit(1)).as("n"), sums: _*)
      .select(col("cell"),
        array((0 until dim).map(i =>
          round(col(s"s$i") / col("n"), CentroidScale)): _*).as("cv2"))
    // Cells that lost every vector keep their seed centroid.
    Materialize.stable(
      seeds.join(stats, Seq("cell"), "left")
        .select(col("cell"), coalesce(col("cv2"), col("cv")).as("cv")),
      reliable)
  }

  /** Single-query top-k over a DataFrame centroid table: same probe
    * semantics as `ivfTopK`, but probe selection is a tiny centroid×query
    * join (not a driver loop) and the candidate filter is a
    * BroadcastHashJoin on cell — the vector side is never hash-exchanged.
    * With nprobe = nCells this degenerates to exact brute force (every
    * cell probed), which the spec uses as a deterministic equivalence.
    */
  def ivfTopKBroadcast(
      e: DataFrame,
      queryId: Long,
      k: Int,
      nCells: Int,
      nprobe: Int,
      centsOpt: Option[DataFrame] = None,
      reliable: Boolean = false
  ): DataFrame = {
    val cents = centsOpt.getOrElse(buildIvfTable(e, nCells, reliable = reliable))
    val q = Materialize.stable(
      e.filter(col("vec_id") === queryId)
        .select(col("v").as("qv"), col("nrm").as("qn")), reliable)
    val probed = Materialize.stable(
      cents.crossJoin(broadcast(q))
        .select(col("cell"), dot("cv", "qv").as("d"))
        .orderBy(col("d").desc, col("cell").asc).limit(nprobe)
        .select("cell"), reliable)
    assignCellBroadcast(e, cents)
      .join(broadcast(probed), Seq("cell"))
      .filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .withColumn("cos_sim", dot("v", "qv") / (col("nrm") * col("qn")))
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
      .limit(k)
      .select(col("vec_id"), col("cos_sim"))
  }

  /** SemDeDup-shaped SEMANTIC deduplication (round-5 verdict item #3) —
    * the composed operator real corpus pipelines run on embeddings, built
    * from the already-oracled primitives: (1) assign every vector to its
    * IVF cell (single-row centroid broadcast + row-local argmax — the
    * vector side is never hash-exchanged for the assignment); (2) candidate
    * pairs = within-cell pairs whose cosine ≥ `minCos` (the cell key is the
    * pruning that keeps the pairing linear-ish — with nCells ≈ √n each
    * cell's self-join is O(n) expected, the published SemDeDup recipe —
    * instead of the corpus-wide O(n²)); (3) resolve pairs TRANSITIVELY via
    * connected components and keep each cluster's min-id representative
    * (the dd_cluster_resolve contract). Returns one row per input vector:
    * (vec_id, cluster_rep, is_kept).
    *
    * Shuffle budget: one exchange of (cell, id, v, nrm) per join side for
    * the cell-keyed pairing — the only time payloads move — then ids-only
    * through CC and the final left join.
    */
  def semDedup(
      e: DataFrame,
      cents: DataFrame,
      minCos: Double = 0.4
  ): DataFrame = {
    val assigned = assignCellBroadcast(e, cents)
      .select(col("cell"), col("vec_id"), col("v"), col("nrm"))
    val a = assigned.select(col("cell"), col("vec_id").as("id_a"),
      col("v").as("va"), col("nrm").as("na"))
    val b = assigned.select(col("cell"), col("vec_id").as("id_b"),
      col("v").as("vb"), col("nrm").as("nb"))
    val pairs = a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .filter(dot("va", "vb") / (col("na") * col("nb")) >= minCos)
      .select("id_a", "id_b")
    val comps = ConnectedComponents.resolve(pairs, "id_a", "id_b")
      .withColumnRenamed("id", "vec_id")
    e.select("vec_id").join(comps, Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("label"), col("vec_id")).as("cluster_rep"))
      .withColumn("is_kept", col("vec_id") === col("cluster_rep"))
  }

  /** Batch ANN (round-2 review item #5): top-k for a whole query TABLE
    * (qid, qv, qn) in one pass. Per-query probe lists are computed by a
    * broadcast of the single-row centroid array against the (small) query
    * table; candidates = data rows whose cell is in a query's probe list
    * (broadcast nested-loop join — the data side streams once, no
    * shuffle); per-query top-k = rank window over CANDIDATES ONLY
    * (≈ nQueries × n × nprobe/nCells rows, the fraction probing chose —
    * and the window key is qid, whose cardinality grows with the workload,
    * not a 5-value constant).
    */
  def ivfTopKBatch(
      e: DataFrame,
      queries: DataFrame,
      k: Int,
      nCells: Int,
      nprobe: Int,
      centsOpt: Option[DataFrame] = None,
      reliable: Boolean = false
  ): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = centsOpt.getOrElse(buildIvfTable(e, nCells, reliable = reliable))
    val centsRow = cents.agg(collect_list(struct(col("cell"), col("cv"))).as("__cents"))
    // Probe list per query: sort the per-cell dots ascending by negated
    // dot (ties to the smaller cell id — same order ivfTopK uses), keep
    // the first nprobe cells.
    graft.functions.DotExact.register(e.sparkSession)
    val qprobes = queries.crossJoin(broadcast(centsRow))
      .select(col("qid"), col("qv"), col("qn"),
        expr(
          s"""transform(slice(array_sort(transform(__cents, c -> struct(
             |-dot_exact(qv, c.cv) AS negd,
             |c.cell AS cell))), 1, $nprobe), s -> s.cell)""".stripMargin
            .replace("\n", " ")).as("probes"))
    val qprobesStable = Materialize.stable(qprobes, reliable)
    val w = Window.partitionBy("qid")
      .orderBy(col("cos_sim").desc, col("vec_id").asc)
    assignCellBroadcast(e, cents)
      .join(broadcast(qprobesStable),
        array_contains(col("probes"), col("cell")) && col("vec_id") =!= col("qid"))
      .withColumn("cos_sim", dot("v", "qv") / (col("nrm") * col("qn")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("vec_id"), col("cos_sim"))
  }
}
