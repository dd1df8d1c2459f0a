package graft.tools

/** Local-filesystem test/harness utilities. Driver-side only: the
  * declared queries and the probe mains scrub their /tmp store roots
  * before rebuilding; engine code paths never delete through here (the
  * store protocol's deletes go through Hadoop's FileSystem in
  * [[graft.sources.Catalog]], which works on any filesystem).
  */
object LocalFs {

  /** Recursive local delete — the one shared copy (SparkEntry's query
    * bodies, RecallProbe, any future probe main).
    */
  def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles.foreach(deleteRecursively)
    f.delete()
    ()
  }
}
