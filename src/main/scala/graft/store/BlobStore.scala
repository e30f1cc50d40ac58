package graft.store

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.security.MessageDigest
import java.util.Base64

/** Content-addressed blob store (S11, SURVEY.md §2.1): captured output
  * bodies below `inlineThreshold` are stored inline as a `data:` URI in
  * the outputs row; larger bodies land in a hash-addressed file tree
  * with 2-char fanout directories and atomic tmp→rename writes.
  * Mirrors the reference's behavior (bird.py:1304-1374,1460-1513 —
  * 4 KB inline threshold, content dedup by digest, refcount via the
  * outputs table) with Spark-native substitutions: BLAKE2b → SHA-256
  * (JDK-standard), refcounts derived by joining the outputs frame
  * instead of a mutable registry table.
  *
  * This is deliberately plain JVM library code, not Spark — blob I/O is
  * out of the analytics hot path; only the small metadata rows
  * ([[graft.model.Output]]) enter DataFrames.
  */
final class BlobStore(rootDir: String,
    inlineThreshold: Int = 4096,
    maxBytes: Int = 1 << 20) {

  private val root: Path = Paths.get(rootDir)

  def hashOf(content: Array[Byte]): String = {
    val d = MessageDigest.getInstance("SHA-256").digest(content)
    d.map("%02x".format(_)).mkString.take(32)
  }

  private def blobPath(hash: String): Path =
    root.resolve(hash.take(2)).resolve(hash)

  /** Store content; returns (storage_type, storage_ref, content_hash).
    * Inline ⇒ `data:` URI; blob ⇒ hash path relative to root. Content
    * above `maxBytes` is truncated head+tail like the reference's cap. */
  def store(content: Array[Byte], contentType: String = "text/plain"): (String, String, String) = {
    val bounded =
      if (content.length <= maxBytes) content
      else content.take(maxBytes / 2) ++
        s"\n...[truncated ${content.length - maxBytes} bytes]...\n"
          .getBytes(StandardCharsets.UTF_8) ++
        content.takeRight(maxBytes / 2)
    val hash = hashOf(bounded)
    if (bounded.length < inlineThreshold) {
      val b64 = Base64.getEncoder.encodeToString(bounded)
      ("inline", s"data:$contentType;base64,$b64", hash)
    } else {
      val p = blobPath(hash)
      if (!Files.exists(p)) {
        Files.createDirectories(p.getParent)
        val tmp = Files.createTempFile(p.getParent, ".tmp", "")
        Files.write(tmp, bounded)
        try Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE)
        catch { // concurrent writer landed the same content: keep theirs
          case _: java.nio.file.FileAlreadyExistsException => Files.deleteIfExists(tmp)
        }
      }
      ("blob", s"${hash.take(2)}/$hash", hash)
    }
  }

  def load(storageType: String, storageRef: String): Array[Byte] = storageType match {
    case "inline" =>
      val b64 = storageRef.substring(storageRef.indexOf(",") + 1)
      Base64.getDecoder.decode(b64)
    case "blob" => Files.readAllBytes(root.resolve(storageRef))
    case other  => throw new IllegalArgumentException(s"unknown storage_type: $other")
  }

  def loadString(storageType: String, storageRef: String): String =
    new String(load(storageType, storageRef), StandardCharsets.UTF_8)

  /** All blob hashes present on disk (for orphan reconciliation: J7 —
    * left_anti against the outputs frame's content_hash column). */
  def listHashes(): Seq[String] =
    if (!Files.exists(root)) Seq.empty
    else {
      // Files.walk holds directory handles until the stream is closed —
      // on a large blob tree an unclosed walk leaks one fd per level
      // per reconciliation scan.
      val out = Seq.newBuilder[String]
      scala.util.Using.resource(Files.walk(root)) { stream =>
        stream.forEach { p =>
          if (Files.isRegularFile(p) && !p.getFileName.toString.startsWith(".tmp"))
            out += p.getFileName.toString
        }
      }
      out.result()
    }

  def delete(hash: String): Boolean = Files.deleteIfExists(blobPath(hash))
}
