package graft.tablefmt

import org.apache.spark.sql.DataFrame

/** Lineage truncation with a reliability switch (VERDICT r2 item 5).
  *
  * Iterative jobs (connected components, fuzzy-title clustering, banded
  * sketch reuse) must cut lineage each round or the nested plan grows
  * without bound. Locally, eager `localCheckpoint` is the right call —
  * executor-memory-resident, no IO. On a real cluster those blocks are
  * unrecoverable: one lost executor kills the whole iterative job where a
  * reliable checkpoint would not. Setting `spark.graft.checkpointDir`
  * (any Hadoop-visible path — HDFS/S3 on a cluster) routes every cut
  * through RELIABLE `checkpoint()` into that directory instead; results
  * are identical either way (ResumeAndStreamSpec runs fuzzy threads both
  * ways).
  */
object LineageCut {
  val ConfKey = "spark.graft.checkpointDir"

  def cut(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(ConfKey) match {
      case Some(dir) if dir.nonEmpty =>
        val sc = spark.sparkContext
        // setCheckpointDir stores a QUALIFIED path (file:/...), so compare
        // by emptiness only — first setter wins for the context's lifetime
        if (sc.getCheckpointDir.isEmpty) sc.setCheckpointDir(dir)
        df.checkpoint(eager = true)
      case _ => df.localCheckpoint(eager = true)
    }
  }
}
