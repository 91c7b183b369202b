package graft.storage

import java.nio.file.{Files, Paths}

/** Content fingerprints for persisted scratch state (d10's dedup state,
  * b2's bucketed tables): state keyed on the md5 of the input PATH
  * alone silently survives the input's files changing underneath it —
  * the gate would then run against stale signatures. Folding every
  * file's (relative path, size, mtime) into the key makes any input
  * mutation produce a different scratch location, forcing a rebuild.
  * Size+mtime, not content hashes: fingerprinting must stay O(file
  * count) — at 100 TB you cannot re-read the corpus to decide whether
  * to reuse derived state, and object stores version exactly this way.
  */
object Scratch {

  def fingerprint(dir: String): String = {
    val root = Paths.get(dir)
    val sb = new StringBuilder(dir)
    if (Files.isDirectory(root)) {
      val stream = Files.walk(root)
      try {
        import scala.jdk.CollectionConverters._
        stream.iterator().asScala
          .filter(Files.isRegularFile(_))
          .map(p => (root.relativize(p).toString, Files.size(p),
            Files.getLastModifiedTime(p).toMillis))
          .toSeq.sortBy(_._1)
          .foreach { case (name, size, mtime) =>
            sb.append('|').append(name).append(':')
              .append(size).append(':').append(mtime)
          }
      } finally stream.close()
    }
    org.apache.commons.codec.digest.DigestUtils.md5Hex(sb.toString)
  }
}
