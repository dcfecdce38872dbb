package graft.plans

import org.apache.spark.sql.SparkSession

/** Shared sidecar-manifest I/O for the serving catalogs
  * ([[AggRewrite]] summaries, [[SkipIndex]] stats) — one copy of the
  * publish protocol so a durability fix lands once.
  *
  * Publish is write-tmp → delete-old → rename: rename is atomic on
  * HDFS/posix (readers see the old or the new manifest, never a torn
  * one); on object stores it degrades to copy+delete, where the
  * manifest's internal signature still protects readers (a half-old
  * manifest fails the fence and attach refuses — sound). A failed
  * publish cleans up its tmp file. */
private[plans] object Manifests {

  def write(session: SparkSession, dir: String, fileName: String,
      body: String): Unit = {
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val fs = dirPath.getFileSystem(session.sessionState.newHadoopConf())
    val tmp = new org.apache.hadoop.fs.Path(dirPath, s".$fileName.tmp")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes("UTF-8")) finally out.close()
    val target = new org.apache.hadoop.fs.Path(dirPath, fileName)
    fs.delete(target, false)
    if (!fs.rename(tmp, target)) {
      fs.delete(tmp, false)
      throw new java.io.IOException(s"could not publish $target")
    }
  }

  /** Best-effort write: a read-only store (serving replica, read-only
    * mount) must not fail the in-memory registration it sits beside —
    * the manifest is the durability add-on, not the registration. The
    * skipped persist is logged so a restart that later finds no/stale
    * manifest is attributable. */
  def writeBestEffort(session: SparkSession, dir: String,
      fileName: String, body: String): Unit =
    try write(session, dir, fileName, body)
    catch {
      case scala.util.control.NonFatal(e) =>
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"could not persist $fileName under $dir (" +
            s"${e.getClass.getSimpleName}: ${e.getMessage}) - the " +
            "registration is live in this session but will NOT " +
            "survive a restart via attach()")
    }

  def read(session: SparkSession, dir: String, fileName: String)
      : Option[String] = {
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val fs = dirPath.getFileSystem(session.sessionState.newHadoopConf())
    val target = new org.apache.hadoop.fs.Path(dirPath, fileName)
    if (!fs.exists(target)) None
    else Some(readFile(fs, target))
  }

  def readFile(fs: org.apache.hadoop.fs.FileSystem,
      target: org.apache.hadoop.fs.Path): String = {
    val in = fs.open(target)
    try {
      val bs = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bs.write(buf, 0, n); n = in.read(buf) }
      bs.toString("UTF-8")
    } finally in.close()
  }
}
