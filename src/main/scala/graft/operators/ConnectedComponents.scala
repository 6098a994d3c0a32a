package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by min-label propagation with pointer
  * jumping — the scale-correct replacement for depth-bounded recursive-CTE
  * reachability (a hop-count cap silently splits long duplicate chains into
  * several representatives, a wrong answer at corpus scale).
  *
  * Algorithm (alternating min-propagation to a fixed point, the family of
  * Kiveris et al.'s large-star/small-star "Connected Components in MapReduce
  * and Beyond", MapReduce-friendly and shuffle-only):
  *
  *   label(v) <- min(label(v), min over neighbors u of label(u))   // propagate
  *   label(v) <- label(label(v))                                   // jump
  *
  * Pointer jumping halves the distance to the component minimum each round,
  * so convergence is O(log diameter) shuffle rounds rather than O(diameter).
  * Every round is two shuffle joins + one aggregation — no driver-side state
  * beyond the one-scalar convergence check, and each round's result is
  * `localCheckpoint`ed so the logical plan (and task lineage) stays constant
  * size instead of growing per iteration.
  *
  * At the fixed point label(v) = min node id in v's component: the fixed
  * point of the propagate step is exactly "no neighbor has a smaller label",
  * which over a connected subgraph forces the component-wide minimum.
  */
object ConnectedComponents {

  /** Component labels for `nodes` under `edges`.
    *
    * @param nodes single-column DataFrame `id`; must contain every edge
    *              endpoint (isolated nodes allowed — they keep their own id)
    * @param edges two-column DataFrame `src`, `dst` (direction ignored)
    * @return DataFrame (`id`, `comp`) where `comp` = min id in the component
    */
  def labels(nodes: DataFrame, edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .localCheckpoint(true)

    var comp = nodes.select(col("id"), col("id").as("comp")).localCheckpoint(true)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // propagate: min label over the neighborhood (shuffle on dst, then src)
      val nbrMin = sym
        .join(comp.select(col("id").as("dst"), col("comp").as("dcomp")), "dst")
        .groupBy(col("src")).agg(min(col("dcomp")).as("nmin"))
        .select(col("src").as("id"), col("nmin"))
      // materialized before the jump: both sides of the self-join read it,
      // and without this the propagate join+agg subtree would run twice per
      // round
      val stepped = comp.join(nbrMin, Seq("id"), "left")
        .select(col("id"), least(col("comp"), coalesce(col("nmin"), col("comp"))).as("comp"))
        .localCheckpoint(true)
      // jump: label(v) <- label(label(v)). Labels are always node ids (mins
      // of ids), so the self-join on comp = id always matches.
      val next = stepped.as("a")
        .join(stepped.select(col("id").as("comp"), col("comp").as("jcomp")).as("b"),
          Seq("comp"))
        .select(col("id"), col("jcomp").as("comp"))
        .localCheckpoint(true)
      val changed = next.as("n")
        .join(comp.select(col("id"), col("comp").as("oldc")).as("o"), Seq("id"))
        .filter(col("comp") =!= col("oldc"))
        .limit(1).count()
      comp = next
      converged = changed == 0L
      iter += 1
    }
    if (!converged)
      // labels would still be an upper bound (monotone non-increasing) but
      // possibly NOT component minima — a d56 caller would silently derive
      // wrong dedup representatives from them. The documented contract is
      // comp = component-min, so non-convergence is an error, not a warning.
      // (Practically unreachable: pointer jumping needs ~log2(diameter)
      // rounds, so maxIter=50 covers diameters beyond any physical graph.)
      throw new IllegalStateException(
        s"ConnectedComponents did not converge after $maxIter rounds " +
          "(diameter > 2^maxIter?); labels would violate the comp = " +
          "component-min contract — raise maxIter")
    comp
  }
}
