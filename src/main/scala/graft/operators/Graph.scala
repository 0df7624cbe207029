package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Graph analytics over the corpus similarity structure.
  *
  * The near-dup *jaccard* graph is the wrong substrate for exact triangle
  * work: its components are giant near-cliques (sf0.1: 3.5k nodes, max
  * degree 2.3k), so triangle volume grows as Σ C(clique, 3) — measured
  * ~2×10⁹ at sf0.1 — and the answer is better served by
  * [[Dedup.clusterAssignments]]' component sizes. Triangles are instead
  * computed on the **mutual-kNN embedding graph** (edge iff each endpoint
  * is in the other's top-k cosine neighbors), the standard manifold /
  * cluster-cohesion structure: its degree is ≤ k BY CONSTRUCTION, which
  * caps wedge volume at N·k² and makes exact, exactly-once triangle
  * enumeration scale linearly in N — no sampling, no silent caps.
  */
object Graph {
  import graft.functions.VectorFunctions._

  /** Directed exact kNN edges (src, dst): each vector's top-k neighbors
    * by cosine, ties broken by neighbor id, self excluded. The query side
    * is the whole (small) embedding table broadcast against one corpus
    * scan — the oracle-checkable baseline. At 100 TB, swap the pair
    * source for [[Similarity.ivfAssignments]]-style coarse lists or
    * [[Similarity.lshBuckets]] bands (candidates meet through equi-joins
    * instead of a broadcast product); the ranking window and everything
    * downstream are unchanged. */
  private[graft] def knnDirected(s: SparkSession, dir: String, k: Int): DataFrame = {
    // The embeddings table is one parquet block at test SFs, so without a
    // repartition the N×N dot-product stream runs in a SINGLE task (the
    // broadcast join preserves the scan's partitioning — measured 4.7 s
    // single-task vs spread across the cluster). The exchange moves only
    // N tiny vector rows, before the N×N blowup; at 100 TB the scan is
    // many-partitioned to begin with and AQE elides it.
    val all = Similarity.corpus(s, dir).repartition(col("vec_id"))
    val queries = all.select(col("vec_id").as("qid"), col("v").as("qv"),
      col("nrm").as("qnrm"))
    val w = Window.partitionBy("src").orderBy(col("cosine").desc, col("dst"))
    all.join(broadcast(queries), col("vec_id") =!= col("qid"))
      .select(col("qid").as("src"), col("vec_id").as("dst"),
        (dot(col("v"), col("qv")) / (col("nrm") * col("qnrm"))).as("cosine"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select("src", "dst")
  }

  /** Mutual-kNN undirected edge set, one row per edge with u < v. A
    * mutual pair (u,v) appears in the directed set as both (u,v) and
    * (v,u); the forward/reverse equi-join matches each direction once and
    * the u < v filter keeps exactly one row — exactly-once by
    * construction, no dropDuplicates exchange. */
  private[graft] def mutualKnnEdges(s: SparkSession, dir: String, k: Int): DataFrame = {
    val d = knnDirected(s, dir, k)
    d.as("f").join(d.as("r"),
        col("f.src") === col("r.dst") && col("f.dst") === col("r.src"))
      .filter(col("f.src") < col("f.dst"))
      .select(col("f.src").as("u"), col("f.dst").as("v"))
  }

  /** Per-vector triangle participation counts on the mutual-kNN graph —
    * high counts mark vectors inside cohesive clusters, count 0 (absent)
    * marks hubs/outliers whose neighborhoods do not close. Output
    * (vec_id, n_triangles), nodes in ≥ 1 triangle.
    *
    * Enumeration: every triangle a<b<c decomposes uniquely into edges
    * (a,b), (b,c), (a,c) of the u<v edge list, so the wedge join
    * e1.v = e2.u (giving a<b<c paths) closed by the (a,c) edge counts
    * each triangle exactly once. With degree ≤ k the wedge join fans out
    * to at most N·k² rows — id-ordered orientation suffices; the
    * degree-ordered variant is only needed on unbounded-degree graphs.
    * The edge list (≤ N·k/2 rows of two longs) is localCheckpointed: it
    * feeds three join legs, and without materialization each leg would
    * recompute the full kNN build. */
  def triangleCounts(s: SparkSession, dir: String, k: Int = 5): DataFrame =
    triangleCountsFromEdges(mutualKnnEdges(s, dir, k).localCheckpoint())
      .orderBy("vec_id")

  /** (vec_id, n_triangles) for nodes in ≥ 1 triangle of the given u<v
    * edge list, UNSORTED. Expects a materialized (checkpointed) edge
    * relation — it feeds three join legs. */
  private def triangleCountsFromEdges(e: DataFrame): DataFrame = {
    val tri = e.as("e1")
      .join(e.as("e2"), col("e1.v") === col("e2.u"))
      .join(e.as("e3"),
        col("e3.u") === col("e1.u") && col("e3.v") === col("e2.v"))
      .select(col("e1.u").as("a"), col("e1.v").as("b"), col("e2.v").as("c"))
    tri.select(explode(array(col("a"), col("b"), col("c"))).as("vec_id"))
      .groupBy("vec_id").agg(count(lit(1)).as("n_triangles"))
  }

  /** Local clustering structure on the mutual-kNN graph, in EXACT
    * integers: (vec_id, n_triangles, n_wedges) for every node with
    * degree ≥ 2, n_wedges = C(degree, 2). The coefficient
    * n_triangles/n_wedges is left to the consumer — emitting the two
    * integers keeps the result hash-comparable cross-engine (no double
    * division) and keeps zero-closure hub nodes (n_triangles = 0) in
    * the output, which [[triangleCounts]] by construction omits — those
    * are exactly the manifold outliers a curation pass wants to flag. */
  def clusteringCoefficients(s: SparkSession, dir: String, k: Int = 5): DataFrame = {
    val e = mutualKnnEdges(s, dir, k).localCheckpoint()
    val deg = e.select(explode(array(col("u"), col("v"))).as("vec_id"))
      .groupBy("vec_id").agg(count(lit(1)).as("degree"))
    deg.filter(col("degree") >= 2)
      .join(triangleCountsFromEdges(e), Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"),
        expr("degree * (degree - 1) div 2").as("n_wedges"))
      .orderBy("vec_id")
  }
}
