package graft.format

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.UUID

/** Versioned-metadata table operations with atomic-rename CAS commits —
  * the HadoopTableOperations protocol (reference
  * core/.../hadoop/HadoopTableOperations.java): metadata lives at
  * `<location>/metadata/v{N}.metadata.json` plus a `version-hint.text`;
  * a commit writes a temp file and renames it to the next version — the
  * rename fails if a concurrent committer won, which surfaces as
  * CommitFailedException and triggers optimistic retry
  * (reference core/.../SnapshotProducer.java:249-279).
  */
final class CommitFailedException(msg: String) extends RuntimeException(msg)

final class TableOps(val location: String) {
  private def metadataDir: Path = Paths.get(location, "metadata")
  private def versionFile(v: Int): Path = metadataDir.resolve(s"v$v.metadata.json")
  private def hintFile: Path = metadataDir.resolve("version-hint.text")

  def exists(): Boolean = Files.exists(hintFile)

  def currentVersion(): Int =
    if (!exists()) 0 else Files.readString(hintFile).trim.toInt

  // version-keyed parse cache: `current()` is called per manifest during
  // (parallel) planning, and re-parsing a large table's metadata JSON N
  // times per plan is driver-side O(N·metadata) work. Version files are
  // immutable once linked, so caching by version is always safe; staleness
  // is bounded by the cheap hint-file read every call (a refresh).
  @volatile private var cached: (Int, TableMetadata) = (0, null)

  /** Refresh: read latest committed metadata (null if table absent). */
  def current(): TableMetadata = {
    val v = currentVersion()
    if (v == 0) return null
    val c = cached
    if (c._1 == v) c._2
    else {
      val m = Model.metadataFromJson(Files.readString(versionFile(v)))
      cached = (v, m)
      m
    }
  }

  /** CAS commit: succeed only if `base` is still current. */
  def commit(baseVersion: Int, updated: TableMetadata): Int = {
    Files.createDirectories(metadataDir)
    val next = baseVersion + 1
    val tmp = metadataDir.resolve(s".tmp-${UUID.randomUUID()}.json")
    Files.writeString(tmp, Model.metadataToJson(updated))
    try {
      // hard-link is the CAS: link(2) fails with EEXIST *atomically*
      // (Files.move without REPLACE_EXISTING pre-checks existence non-
      // atomically — two racing committers can both pass the check and one
      // silently overwrites the other)
      Files.createLink(versionFile(next), tmp)
      Files.deleteIfExists(tmp)
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        Files.deleteIfExists(tmp)
        throw new CommitFailedException(s"version $next already committed")
    }
    // hint is advisory (readers fall back to scanning versions)
    val hintTmp = metadataDir.resolve(s".hint-${UUID.randomUUID()}")
    Files.writeString(hintTmp, next.toString)
    Files.move(hintTmp, hintFile, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
    next
  }

  /** Optimistic-retry loop around a metadata transform (reference
    * SnapshotProducer: Tasks.foreach(ops).retry(...).onlyRetryOn(
    * CommitFailedException)). `apply` must be side-effect-free on retry. */
  def commitTransaction(apply: TableMetadata => TableMetadata,
      retries: Int = 4): TableMetadata = {
    var attempt = 0
    while (true) {
      val baseVersion = currentVersion()
      val base = current()
      val updated = apply(base)
      try {
        commit(baseVersion, updated)
        return updated
      } catch {
        case _: CommitFailedException if attempt < retries =>
          attempt += 1
          Thread.sleep(math.min(100L << attempt, 1000L))
      }
    }
    throw new IllegalStateException("unreachable")
  }

  // ---- auxiliary file I/O (manifests, manifest lists) ----
  def writeMetadataFile(name: String, content: String): String = {
    Files.createDirectories(metadataDir)
    val p = metadataDir.resolve(name)
    val tmp = metadataDir.resolve(s".tmp-${UUID.randomUUID()}")
    Files.writeString(tmp, content)
    Files.move(tmp, p, StandardCopyOption.REPLACE_EXISTING)
    p.toString
  }

  def readFile(path: String): String = Files.readString(Paths.get(path))

  def newManifestPath(): String =
    metadataDir.resolve(s"manifest-${UUID.randomUUID()}.json").toString
  def newManifestListPath(snapshotId: Long): String =
    metadataDir.resolve(s"snap-$snapshotId-${UUID.randomUUID()}.json").toString
}
