package graft.format

/** Encryption SPI (reference api/.../encryption/EncryptionManager.java +
  * PlaintextEncryptionManager): data-file bytes pass through the manager on
  * their way to and from storage. The reference model is file-granular
  * envelope encryption — encrypt(OutputFile) / decrypt(EncryptedInputFile) —
  * and so is this seam: [[DataFileIO]] applies the manager around the
  * format readers/writers, so ParquetIO/OrcIO/AvroIO stay plaintext codecs.
  *
  * Plaintext is the default and is ZERO-COST (streams pass through
  * untouched, vectorized readers keep reading files directly). A real
  * manager (KMS envelope, AES-GCM) implements the two byte transforms; the
  * tests wire a trivial XOR manager end-to-end to pin the plumbing.
  */
trait EncryptionManager extends Serializable {
  /** Plaintext managers skip the staging hop entirely. */
  def isPlaintext: Boolean = false

  /** Plaintext file bytes → stored form (runs once per file at close). */
  def encrypt(path: String, plaintext: Array[Byte]): Array[Byte]

  /** Stored file bytes → plaintext (runs once per file at open). */
  def decrypt(path: String, stored: Array[Byte]): Array[Byte]
}

object PlaintextEncryptionManager extends EncryptionManager {
  override def isPlaintext: Boolean = true
  override def encrypt(path: String, plaintext: Array[Byte]): Array[Byte] = plaintext
  override def decrypt(path: String, stored: Array[Byte]): Array[Byte] = stored
}

object EncryptionManagers {
  /** Table property: fully-qualified class name of an [[EncryptionManager]]
    * with a no-arg constructor. Absent = plaintext. */
  val ImplKey = "encryption.manager-impl"

  def forTable(properties: Map[String, String]): EncryptionManager =
    properties.get(ImplKey) match {
      case Some(cls) => Class.forName(cls).getDeclaredConstructor()
        .newInstance().asInstanceOf[EncryptionManager]
      case None => PlaintextEncryptionManager
    }
}
