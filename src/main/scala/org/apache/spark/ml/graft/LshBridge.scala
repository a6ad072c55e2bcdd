package org.apache.spark.ml.graft

import org.apache.spark.ml.feature.MinHashLSHModel
import org.apache.spark.ml.linalg.Vector

/** The one `protected[ml]` doorway the inlined LSH candidate join needs:
  * the MODEL'S OWN keyDistance (exact Jaccard distance over nonzero
  * index sets), so the exact-filter stage of the rebuilt
  * q_dedup_near plan computes bit-identical distances to
  * `approxSimilarityJoin` — reimplementing it would invite silent
  * drift if MLlib's iteration order ever changes. Same package-doorway
  * idiom as [[org.apache.spark.sql.graft.PlanBridge]]. */
object LshBridge {
  def jaccardDistance(m: MinHashLSHModel, x: Vector, y: Vector): Double =
    m.keyDistance(x, y)
}
