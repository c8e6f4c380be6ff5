package graft.format

/** Listing entry returned by [[FileIO.list]]. */
final case class FileInfo(path: String, size: Long, modifiedMillis: Long)

/** File I/O seam (reference api/.../io/FileIO.java, local impl
  * hadoop/HadoopFileIO.java): every metadata byte graft reads or writes —
  * version files, manifests, manifest lists — and every maintenance-side
  * file operation (expiry deletes, orphan listing) goes through this trait,
  * so pointing a table at an object store is one new implementation instead
  * of a code-wide rewrite. The trait is Serializable because distributed
  * maintenance jobs (rewriteManifests) ship it to executor tasks.
  *
  * Data files are NOT routed here: parquet reads/writes already go through
  * Hadoop's FileSystem abstraction (Spark's own seam) via ParquetIO.
  */
trait FileIO extends Serializable {
  def readString(path: String): String

  /** Write atomically with last-writer-wins semantics (temp + rename). */
  def writeString(path: String, content: String): Unit

  /** Create `path` with `content` only if it does not exist, atomically —
    * the CAS primitive under the commit protocol. Local disk uses link(2)
    * (EEXIST is atomic); an object store maps this to a conditional PUT
    * (`If-None-Match: *`). Returns false when the path already exists. */
  def writeExclusive(path: String, content: String): Boolean

  def exists(path: String): Boolean
  def deleteIfExists(path: String): Unit
  def mkdirs(dir: String): Unit
  def deleteRecursive(dir: String): Unit

  /** Recursive listing of regular files under `dir` with the given suffix
    * ("" = all). Missing dir lists empty. */
  def list(dir: String, suffix: String = ""): Seq[FileInfo]
}

/** Default local-filesystem implementation (reference HadoopFileIO with a
  * `file:` scheme). A Scala `object` serializes as a singleton reference,
  * so executor tasks resolve back to this instance. */
object LocalFileIO extends FileIO {
  import java.nio.file.{Files, Path, Paths, StandardCopyOption}
  import scala.jdk.CollectionConverters._

  private def p(s: String): Path = Paths.get(s)

  override def readString(path: String): String = Files.readString(p(path))

  override def writeString(path: String, content: String): Unit = {
    val target = p(path)
    if (target.getParent != null) Files.createDirectories(target.getParent)
    val tmp = target.resolveSibling(s".tmp-${java.util.UUID.randomUUID()}")
    Files.writeString(tmp, content)
    Files.move(tmp, target, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  override def writeExclusive(path: String, content: String): Boolean = {
    val target = p(path)
    if (target.getParent != null) Files.createDirectories(target.getParent)
    val tmp = target.resolveSibling(s".tmp-${java.util.UUID.randomUUID()}")
    Files.writeString(tmp, content)
    try {
      // hard-link is the CAS: link(2) fails with EEXIST *atomically*
      // (Files.move without REPLACE_EXISTING pre-checks existence non-
      // atomically — two racing committers can both pass the check and one
      // silently overwrites the other)
      Files.createLink(target, tmp)
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    } finally Files.deleteIfExists(tmp)
  }

  override def exists(path: String): Boolean = Files.exists(p(path))

  override def deleteIfExists(path: String): Unit = Files.deleteIfExists(p(path))

  override def mkdirs(dir: String): Unit = Files.createDirectories(p(dir))

  override def deleteRecursive(dir: String): Unit = {
    val root = p(dir)
    if (Files.exists(root))
      Files.walk(root).iterator().asScala.toSeq.reverse
        .foreach(Files.deleteIfExists(_))
  }

  override def list(dir: String, suffix: String = ""): Seq[FileInfo] = {
    val root = p(dir)
    if (!Files.exists(root)) Nil
    else Files.walk(root).iterator().asScala
      .filter(f => Files.isRegularFile(f) && f.toString.endsWith(suffix))
      .map(f => FileInfo(f.toString, Files.size(f),
        Files.getLastModifiedTime(f).toMillis))
      .toSeq
  }
}
