package graft.sources

import java.io.File

import org.apache.spark.sql.SparkSession

/** Run-scoped scratch directories under `java.io.tmpdir`.
  *
  * Every path lives under ONE per-application root
  * (`graft-scratch-<applicationId>`) that a JVM shutdown hook removes
  * recursively. The q79 signature index and q84 term dictionary used to
  * mint bare run-unique directories that nothing ever deleted, so
  * repeated harness runs accumulated unbounded parquet garbage in /tmp;
  * funneling them through a single hooked root keeps the run-uniqueness
  * (concurrent runs never share an index — AtomicParquet is
  * single-writer) while bounding the leak to at most one live run.
  */
object Scratch {

  private val roots =
    new java.util.concurrent.ConcurrentHashMap[String, File]()

  private def deleteRec(f: File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRec)
    f.delete(); ()
  }

  private def appRoot(appId: String): File =
    roots.computeIfAbsent(appId, { id =>
      val f = new File(sys.props("java.io.tmpdir"), s"graft-scratch-$id")
      f.mkdirs()
      // One hook per (JVM, app): registered exactly once thanks to
      // computeIfAbsent; runs after Spark's own shutdown (no executor
      // still writes here by then — local mode shares the JVM).
      Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRec(f)))
      f
    })

  /** A run-unique directory path for `tag` (parent exists; the leaf is
    * left for the writer to create). */
  def dir(spark: SparkSession, tag: String): String =
    new File(appRoot(spark.sparkContext.applicationId), tag).getAbsolutePath
}
