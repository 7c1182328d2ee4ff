package graft.sources

/** One shared data-version fingerprint for every staleness guard in the
  * engine (star-tree rollups, segment-pruning manifests, sorted copies):
  * name:length:mtime of each file in the dir (or of the file itself),
  * hashed. Three structures previously carried near-identical private
  * copies of this idiom; centralizing it keeps "is the layout I described
  * still the layout on disk?" meaning exactly one thing. */
object Fingerprint {
  def of(path: String): String = {
    val f = new java.io.File(path)
    val sig =
      if (f.isFile) s"${f.getName}:${f.length}:${f.lastModified}"
      else Option(f.listFiles)
        .map(_.filter(_.isFile).sortBy(_.getName)
          .map(c => s"${c.getName}:${c.length}:${c.lastModified}").mkString("|"))
        .getOrElse("absent")
    java.lang.Long.toHexString(scala.util.hashing.MurmurHash3.stringHash(sig) & 0xffffffffL)
  }
}
