package graft.queries

/** Learn-module query registry (SURVEY §2.14/§2.15), split by family in
  * r12 — same queries, same oracle SQL, same order within each family:
  * [[LearnQDatasets]] (preprocessing/selection/generators),
  * [[LearnQModels]] (estimators/linalg/distance), [[LearnQMetrics]],
  * [[LearnQStats]] (hypothesis tests + p-values). A 3k-line single file
  * was where oracle-convention slips would hide (r11 VERDICT #7).
  */
object LearnQ {
  val all: Vector[Q] =
    LearnQDatasets.all ++ LearnQModels.all ++ LearnQMetrics.all ++ LearnQStats.all
}
