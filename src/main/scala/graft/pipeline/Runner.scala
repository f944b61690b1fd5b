package graft.pipeline

import org.apache.spark.sql.SparkSession

/** Stage-DAG runner (SURVEY §2.12): the reference orchestrates notebooks
  * with Synapse `dependsOn: [Succeeded]` edges
  * (`pipeline/mainPipeline.json:4-258`): clean ×3 → quality ×3 → summaries →
  * stats-prep → hypothesis-testing → ML. The engine equivalent is a plain
  * topological runner over named stages; state passes between stages through
  * catalog tables / files exactly like the reference (never through shared
  * memory), so any stage can restart independently.
  */
object Runner {

  final case class Stage(name: String, dependsOn: Seq[String] = Seq.empty)(
      val run: SparkSession => Unit)

  final case class StageResult(name: String, ok: Boolean, durationMs: Long,
      error: Option[Throwable])

  /** Run stages in dependency order (topological; input order breaks ties).
    * A failed stage skips its transitive dependents but independent branches
    * continue — mirroring per-activity failure isolation in the reference's
    * pipeline (retry 0, `mainPipeline.json:10-12`). */
  def run(spark: SparkSession, stages: Seq[Stage]): Seq[StageResult] = {
    val byName = stages.map(s => s.name -> s).toMap
    require(byName.size == stages.size, "duplicate stage names")
    stages.foreach(s => s.dependsOn.foreach(d =>
      require(byName.contains(d), s"stage ${s.name} depends on unknown $d")))

    val order = topoSort(stages)
    val failed = scala.collection.mutable.Set.empty[String]
    order.map { s =>
      if (s.dependsOn.exists(failed)) {
        failed += s.name
        StageResult(s.name, ok = false, 0L,
          Some(new IllegalStateException("skipped: upstream failed")))
      } else {
        val t0 = System.nanoTime()
        try {
          s.run(spark)
          StageResult(s.name, ok = true, (System.nanoTime() - t0) / 1000000, None)
        } catch {
          case e: Throwable =>
            failed += s.name
            StageResult(s.name, ok = false, (System.nanoTime() - t0) / 1000000, Some(e))
        }
      }
    }
  }

  private def topoSort(stages: Seq[Stage]): Seq[Stage] = {
    val done = scala.collection.mutable.LinkedHashSet.empty[String]
    val byName = stages.map(s => s.name -> s).toMap
    def visit(s: Stage, path: Set[String]): Unit = {
      require(!path.contains(s.name), s"dependency cycle at ${s.name}")
      if (!done.contains(s.name)) {
        s.dependsOn.foreach(d => visit(byName(d), path + s.name))
        done += s.name
      }
    }
    stages.foreach(visit(_, Set.empty))
    done.toSeq.map(byName)
  }
}
