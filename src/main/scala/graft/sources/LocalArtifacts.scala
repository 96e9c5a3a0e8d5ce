package graft.sources

/** Shared local-filesystem helpers for the publish-by-rename artifact
  * discipline (pair/cluster/band tables, bucketed catalog tables). */
object LocalArtifacts {

  /** Recursive delete (files then dirs); no-op on a missing path. */
  def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete()
    ()
  }

  /** Resolve a Spark warehouse/artifact dir STRING (plain path or file
    * URI, possibly percent-encoded) to a java.io.File. */
  def asFile(dir: String): java.io.File =
    try new java.io.File(new java.net.URI(dir))
    catch { case _: Exception => new java.io.File(dir.stripPrefix("file:")) }
}
