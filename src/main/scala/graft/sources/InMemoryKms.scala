package graft.sources

import org.apache.parquet.crypto.KeyAccessDeniedException
import org.apache.parquet.crypto.keytools.LocalWrapKmsClient

/** In-process KMS for parquet MODULAR ENCRYPTION (PME, the
  * parquet-format spec's footer/column encryption) — the key-server
  * seam of an encrypted lake, reduced to what zero egress allows:
  * master keys come from Hadoop conf (`graft.kms.keys` =
  * `id:base64,...`), and parquet's own [[LocalWrapKmsClient]] performs
  * the envelope wrap (AES-GCM of each data-encryption key under the
  * master key) exactly as it would against a remote KMS in local-wrap
  * mode. Everything downstream — key derivation, module AAD, GCM
  * footer/page encryption, the `PARE` magic — is the real
  * parquet-hadoop crypto path, not a mock: flipping a ciphertext byte
  * or withholding the key list fails the read (LakeSpec pins both).
  *
  * Swapping this class for a networked KmsClient (Vault, KMS, …) is a
  * one-line conf change (`parquet.encryption.kms.client.class`); no
  * query changes. Instantiated reflectively by parquet — must stay a
  * public class with a no-arg constructor.
  */
class InMemoryKms extends LocalWrapKmsClient {

  private var keys: Map[String, Array[Byte]] = Map.empty

  override protected def initializeInternal(): Unit = {
    val list = Option(hadoopConfiguration.get(InMemoryKms.KeyListProp))
      .getOrElse(throw new KeyAccessDeniedException(
        s"${InMemoryKms.KeyListProp} not set — no master keys available"))
    keys = list.split(",").iterator.map(_.trim).filter(_.nonEmpty).map { kv =>
      val Array(id, b64) = kv.split(":", 2)
      id -> java.util.Base64.getDecoder.decode(b64)
    }.toMap
  }

  override protected def getMasterKeyFromServer(keyId: String): Array[Byte] =
    keys.getOrElse(keyId,
      throw new KeyAccessDeniedException(s"unknown master key: $keyId"))
}

object InMemoryKms {
  val KeyListProp = "graft.kms.keys"

  /** Deterministic 128-bit test master keys (fixture material, not
    * secrets): footer key + one column key. */
  private def b64(seed: String): String = java.util.Base64.getEncoder
    .encodeToString(java.security.MessageDigest.getInstance("MD5")
      .digest(seed.getBytes("UTF-8")))
  val testKeyList: String = s"kf:${b64("graft-footer-key")},kc:${b64("graft-column-key")}"
}
