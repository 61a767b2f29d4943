package graft.io

/** Tiny local-filesystem helpers shared by scratch/fixture management —
  * one recursive delete instead of a per-call-site copy.
  */
object Fs {
  /** Best-effort recursive delete of a LOCAL path (scratch/fixture trees
    * only — lakehouse layouts go through the Hadoop FS APIs).
    */
  def deleteTree(path: java.io.File): Unit = {
    Option(path.listFiles()).foreach(_.foreach(deleteTree))
    path.delete()
    ()
  }
  def deleteTree(path: String): Unit = deleteTree(new java.io.File(path))
  def deleteTree(path: java.nio.file.Path): Unit = deleteTree(path.toFile)
}
