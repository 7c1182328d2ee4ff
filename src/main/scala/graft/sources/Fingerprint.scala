package graft.sources

/** One shared data-version fingerprint for every staleness guard in the
  * engine (star-tree rollups, segment-pruning manifests, sorted copies):
  * name:length:mtime of each file in the dir (or of the file itself),
  * hashed. Three structures previously carried near-identical private
  * copies of this idiom; centralizing it keeps "is the layout I described
  * still the layout on disk?" meaning exactly one thing. */
object Fingerprint {
  /** Build-once fingerprinted tmp-dir cache for derived layouts (sorted
    * copies, index postings, hybrid-store splits): the layout is (re)built
    * only when the source fixture's data version changes — the
    * segment-build-time cost model of Pinot's index generation, shared by
    * every declared query that reads through a derived layout. */
  def buildOnce(tag: String, dir: String, srcFile: String)(build: String => Unit): String = {
    val fp = java.lang.Long.toHexString(scala.util.hashing.MurmurHash3.stringHash(
      s"$dir|$tag|${of(s"$dir/$srcFile")}") & 0xffffffffL)
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_${tag}_$fp"
    if (!new java.io.File(out, "_SUCCESS").exists) {
      build(out)
      // composite builds (several parquet dirs under one root) don't get a
      // root marker from Spark — stamp one so the cache hit is root-level
      val marker = new java.io.File(out, "_SUCCESS")
      if (!marker.exists) marker.createNewFile()
    }
    out
  }

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
