package graft.ops

import graft.QueryDef

/** LLM-data-pipeline operators exposed through the driver's correctness
  * gate. Populated as each op lands (dedup, similarity, text analysis).
  */
object OpQueries {
  val defs: Seq[QueryDef] = Seq.empty
}
