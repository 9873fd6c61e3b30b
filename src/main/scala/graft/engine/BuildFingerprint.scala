package graft.engine

import java.io.File
import java.nio.file.Files
import java.security.MessageDigest

/** Fingerprint of the compiled graft classes (SHA-256 over every .class file
  * on the code source, sorted by relative path). Used to key on-disk caches
  * that must not outlive a code change:
  *
  *  - `Queries.cachedBtr` scratch tables: a btr dir written by an OLD binary
  *    must not satisfy a correctness gate that claims to exercise the NEW
  *    write path (round-3 advice, Queries.scala:43);
  *  - `Bench` input parquet: regenerated when the generator changes.
  *
  * Any code change invalidates everything — coarser than strictly necessary
  * but impossible to get wrong, and a rebuild at sf0.1 costs seconds.
  */
object BuildFingerprint {

  lazy val value: String = {
    val md = MessageDigest.getInstance("SHA-256")
    val src = classOf[graft.codec.BtrConfig].getProtectionDomain.getCodeSource
    val loc = new File(src.getLocation.toURI)
    if (loc.isDirectory) {
      def walk(f: File): Seq[File] =
        if (f.isDirectory) f.listFiles().sortBy(_.getName).toSeq.flatMap(walk)
        else if (f.getName.endsWith(".class")) Seq(f)
        else Nil
      val base = loc.toPath
      walk(loc).sortBy(f => base.relativize(f.toPath).toString).foreach { f =>
        md.update(base.relativize(f.toPath).toString.getBytes("UTF-8"))
        md.update(Files.readAllBytes(f.toPath))
      }
    } else {
      md.update(Files.readAllBytes(loc.toPath)) // assembled-jar deployment
    }
    md.digest().take(8).map(b => f"$b%02x").mkString
  }
}
