package graft.format

/** Where new DATA files go (reference core/.../LocationProviders.java —
  * metadata naming stays on TableOps, like the reference's
  * TableOperations.metadataFileLocation: the commit protocol discovers
  * state under `{location}/metadata`, so it is not relocatable).
  *
  * Every writer that creates data files (batch append, DSv2 fanout,
  * delete writers, compaction, streaming sink) asks the provider for the
  * location of its write batch, so pointing a table's data at another
  * root — or at an object store with distributed key prefixes — is one
  * property, not a code change.
  */
trait LocationProvider extends Serializable {
  /** Absolute location for a new data file (or write-batch directory)
    * named `filename`. */
  def newDataLocation(filename: String): String

  /** The root every data location lives under — maintenance (orphan-file
    * listing) scans this tree. */
  def dataRoot: String
}

object LocationProviders {
  /** Reference TableProperties.OBJECT_STORE_ENABLED. */
  val ObjectStoreEnabled = "write.object-storage.enabled"
  /** Reference TableProperties.OBJECT_STORE_PATH. */
  val ObjectStorePath = "write.object-storage.path"
  /** Reference TableProperties.WRITE_FOLDER_STORAGE_LOCATION. */
  val FolderStoragePath = "write.folder-storage.path"

  /** Resolve by table properties (reference LocationProviders.locationsFor):
    * object-store provider when enabled, else the folder layout. */
  def forTable(location: String, properties: Map[String, String]): LocationProvider =
    if (properties.get(ObjectStoreEnabled).exists(_.toBoolean))
      new ObjectStoreLocationProvider(location, properties)
    else new DefaultLocationProvider(location, properties)
}

/** `{data root}/{filename}` — data root defaults to `{location}/data`
  * (reference DefaultLocationProvider). */
final class DefaultLocationProvider(location: String,
    properties: Map[String, String]) extends LocationProvider {
  // string interpolation, not java.nio Paths: scheme-qualified locations
  // (hdfs://, s3a://) must survive untouched
  override val dataRoot: String = properties
    .getOrElse(LocationProviders.FolderStoragePath, s"$location/data")
  override def newDataLocation(filename: String): String = s"$dataRoot/$filename"
}

/** `{data root}/{%08x murmur3(filename)}/{filename}` — a deterministic
  * hash prefix spreads object-store keys across shards so a hot table's
  * writes don't throttle on one prefix (reference
  * ObjectStoreLocationProvider.computeHash). Prefixing applies at the
  * granularity writers request locations — one write BATCH per request —
  * which is the unit of burst load. */
final class ObjectStoreLocationProvider(location: String,
    properties: Map[String, String]) extends LocationProvider {
  override val dataRoot: String = properties
    .get(LocationProviders.ObjectStorePath)
    .orElse(properties.get(LocationProviders.FolderStoragePath))
    .getOrElse(s"$location/data")
  override def newDataLocation(filename: String): String =
    f"$dataRoot/${graft.util.Murmur3.hashString(filename)}%08x/$filename"
}
