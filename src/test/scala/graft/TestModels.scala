package graft

/** Sequential reference models shared across suites — one definition per
  * operator semantic, so a tie-break or rounding change cannot silently
  * diverge between the fixture tests (AnalyticsSpec) and the random-input
  * properties (GraftProperties). */
object TestModels {

  /** Capped neighbor similarity (the `neighborSimOf` semantic): symmetrize
    * the weighted edge list, keep each vertex's `m` strongest partners
    * (w desc, partner asc), count common capped neighbors, Jaccard over the
    * capped degrees, drop pairs with common < 2. */
  def nodeSim(edges: Seq[(Long, Long, Long)], m: Int)
      : Map[(Long, Long), (Long, Long, Long, Double)] = {
    val sym = edges.flatMap { case (s, d, w) => Seq((s, d, w), (d, s, w)) }
    val adj = sym.groupBy(_._1).map { case (u, es) =>
      u -> es.sortBy(e => (-e._3, e._2)).take(m).map(_._2).toSet
    }
    val verts = adj.keys.toSeq.sorted
    (for {
      a <- verts; b <- verts if a < b
      c = (adj(a) intersect adj(b)).size.toLong if c >= 2
    } yield {
      val (da, db) = (adj(a).size.toLong, adj(b).size.toLong)
      (a, b) -> (c, da, db,
        math.round(c.toDouble / (da + db - c) * 10000) / 10000.0)
    }).toMap
  }
}
