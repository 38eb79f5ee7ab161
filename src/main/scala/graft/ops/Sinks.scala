package graft.ops

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

import org.apache.spark.rdd.RDD

/** File sink (reference O7): write reduce partition N to
  * `outputDirectory/outputfileNN` (1-based, zero-padded), clobbering any
  * pre-existing output directory — mirroring `_move_result_files`
  * (`/root/reference/mapreduce/manager/__main__.py:738-761`).
  *
  * The data path is distributed: `saveAsTextFile` writes `part-NNNNN` files
  * executor-side (at cluster scale these land on the shared/object store);
  * only the final rename pass — a metadata operation over numReducers
  * entries, not a data copy — runs on the driver.
  */
object Sinks {

  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
      finally walk.close()
    }

  /** Write `reduced` as outputfileNN files; returns the file paths. */
  def outputFiles(reduced: RDD[String], outputDirectory: String): Seq[String] = {
    val out = Paths.get(outputDirectory)
    deleteRecursively(out)
    val tmp = out.resolveSibling(out.getFileName.toString + ".spark-tmp")
    deleteRecursively(tmp)
    reduced.saveAsTextFile(tmp.toString)
    Files.createDirectories(out)
    val listing = Files.list(tmp)
    val parts =
      try listing
        .filter(p => p.getFileName.toString.startsWith("part-"))
        .sorted()
        .toArray()
        .map(_.asInstanceOf[Path])
      finally listing.close()
    val moved = parts.zipWithIndex.map { case (part, i) =>
      val target = out.resolve(f"outputfile${i + 1}%02d")
      Files.move(part, target)
      target.toString
    }
    deleteRecursively(tmp)
    moved.toSeq
  }
}
