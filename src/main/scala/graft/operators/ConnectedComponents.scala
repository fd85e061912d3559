package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list, by iterative
  * minimum-label propagation ("hash-to-min"): every node starts
  * labeled with its own id; each round a node's label becomes the min
  * of its own and its neighbors'; at fixpoint all nodes of a component
  * carry the component's minimum id.
  *
  * This is the operator that turns near-duplicate PAIRS (MinHash/
  * SimHash/cosine LSH joins — q33/q54/q39) into deduplication
  * CLUSTERS, so a pipeline can keep one representative per cluster
  * instead of dropping both endpoints of every pair — the standard
  * last step of corpus-level fuzzy dedup.
  *
  * Scale: each round is one shuffle of (node, label) pairs on the node
  * id plus a map-side-combined min aggregate — no adjacency matrix,
  * no driver-side graph. Rounds needed = component DIAMETER, and
  * near-dup clusters are dense (near-cliques), so 2-3 rounds settle
  * real corpora. The driver sees only the per-round converged?
  * aggregate (one long), never data. For adversarial long-chain
  * graphs at extreme scale the large-star/small-star variant
  * [Kiveris et al., "Connected Components in MapReduce and Beyond",
  * SoCC'14] bounds rounds at O(log²  n) with the same per-round shape;
  * `maxRounds` caps the loop either way.
  */
object ConnectedComponents {

  /** @param edges DataFrame with two columns `src`, `dst` (one row per
    *              undirected edge; both orientations implied).
    * @return (node, label) with one row per distinct endpoint; `label`
    *         is the minimum node id of the component. Deterministic.
    */
  def cluster(edges: DataFrame, maxRounds: Int = 25): DataFrame = {
    // both orientations, so min-propagation flows the undirected graph
    val sym = edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist()
    var labels = sym.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
      .persist()
    var rounds = 0
    var converged = false
    while (!converged && rounds < maxRounds) {
      // candidate labels: my own + each neighbor's current label
      val viaNeighbors = sym
        .join(labels, sym("src") === labels("node"))
        .select(col("dst").as("node"), col("label"))
      val next = labels.select(col("node"), col("label"))
        .unionAll(viaNeighbors)
        .groupBy(col("node"))
        .agg(min(col("label")).as("label"))
        .persist()
      // converged iff no node's label changed this round — one scalar
      // to the driver, computed distributed
      val changed = next.join(labels.withColumnRenamed("label", "prev"), "node")
        .filter(col("label") < col("prev"))
        .limit(1).count()
      labels.unpersist()
      labels = next
      converged = changed == 0
      rounds += 1
    }
    sym.unpersist()
    labels
  }
}
