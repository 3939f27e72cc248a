package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructField, StructType}

/** Shared core of every written-artifact store (VERDICT r9 #4):
  * [[IndexStore]], [[NbStore]], [[BpeStore]] and [[BackoffStore]] all
  * follow the same train-once/serve-many discipline — a learned
  * artifact (index, classifier, tokenizer, n-gram model) outlives the
  * driver as parquet TABLES under a fingerprint-keyed directory,
  * published atomically via a ready marker written LAST, and read back
  * with DECLARED schemas. This object is that discipline, once:
  *
  *  - `path(prefix, dir, fingerprint)` — one directory per (source
  *    dir, data fingerprint): data changing under the same path gets a
  *    NEW directory, so a written artifact can never serve stale
  *    results. The prefix namespaces artifact kinds in one warehouse
  *    root; a fingerprint-format change here changes EVERY store in
  *    lockstep (the drift this extraction prevents).
  *  - `ready`/`publish` — an artifact is visible only once its marker
  *    exists; the marker is written AFTER every table, so a crashed
  *    build is invisible and gets rebuilt, never half-read.
  *  - `readTable` — schemas are DECLARED on read: no inference
  *    surprises on empty or reordered files, and partition/readback
  *    types stay exactly what the writer intended.
  *
  * Adding the next learned artifact (quality classifier, importance
  * weights) is: pick a prefix + marker, write tables, `publish`, read
  * via `readTable`.
  */
object ArtifactStore {

  /** Root for written artifact tables. `graft.index.dir` (system
    * property, test-settable) > `GRAFT_INDEX_DIR` (env) > java tmpdir.
    * At real scale this is a warehouse path, not a tmpdir. */
  def root: String = sys.props.get("graft.index.dir")
    .orElse(sys.env.get("GRAFT_INDEX_DIR"))
    .getOrElse(sys.props("java.io.tmpdir") + "/graft-index")

  private[tools] def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  def path(prefix: String, dir: String, fingerprint: String): String =
    s"$root/$prefix${md5hex(dir + "|" + fingerprint)}"

  /** Driver-side (name, size, mtime) fingerprint of a table's files —
    * shared with ExtensionCatalog's memo keys. listFiles() returning
    * null (unreadable dir / deletion race) falls back to a
    * never-matching key so callers rebuild instead of NPEing. */
  def dataFingerprint(d: String, table: String): String = {
    val f = new java.io.File(s"$d/$table.parquet")
    def one(g: java.io.File) = s"${g.getName}:${g.length}:${g.lastModified}"
    val files =
      if (f.isDirectory) Option(f.listFiles()).map(_.sortBy(_.getName).toSeq)
      else Some(Seq(f))
    files match {
      case Some(fs) => fs.map(one).mkString(",")
      case None => s"unlisted:${System.nanoTime}"
    }
  }

  def ready(p: String, marker: String): Boolean =
    new java.io.File(p, marker).isFile

  /** Atomic-enough publish for a local fs: marker written LAST, after
    * every table. (A real warehouse swaps this for a rename or a
    * transaction-log commit; the call site contract is identical.) */
  def publish(p: String, marker: String): Unit = {
    val _ = new java.io.File(p, marker).createNewFile()
  }

  /** Declared-schema parquet read of one table under the artifact. */
  def readTable(spark: SparkSession, p: String, name: String,
                fields: (String, DataType)*): DataFrame =
    spark.read
      .schema(StructType(fields.map { case (n, t) => StructField(n, t) }))
      .parquet(s"$p/$name.parquet")
}
