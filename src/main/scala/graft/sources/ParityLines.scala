package graft.sources

import org.apache.spark.SparkContext
import org.apache.spark.rdd.RDD

/** Newline-PRESERVING text reader for reference-parity byte semantics.
  *
  * `SparkContext.textFile` strips line terminators, erasing the one
  * distinction the reference's group stage can observe: its workers sort
  * map output with `readlines()` — lines KEEP their trailing newline, and
  * a file's final line keeps its real bytes, newline or not
  * (`/root/reference/mapreduce/worker/__main__.py:180-182`). So to the
  * reference, an unterminated final line `"foo"` is a DIFFERENT line from
  * `"foo\n"` elsewhere in the input: it sorts before it and increments the
  * distinct-line counter separately, shifting every subsequent rank-mod
  * bucket assignment ([[graft.ops.GroupStage]]'s documented parity
  * limitation through round 11).
  *
  * This reader returns each line WITH its true trailing `\n` (and the
  * final line without one when the file ends mid-line), so
  * [[graft.ops.GroupStage.rankModRaw]] can sort/distinct on the real
  * bytes — no appended sentinel, no merged distinct groups.
  *
  * Built on `wholeTextFiles`, which is the right tool for the PARITY tier
  * only: it reads each file unsplit, exactly like the reference's
  * one-worker-per-file sort, and parity fixtures are file-per-mapper
  * sized. The scalable tier ([[graft.ops.GroupStage.hash]]) keeps
  * `textFile`'s splittable stripped-line reads — at 100 TB the trailing
  * byte of one file is not worth giving up record-level splits, which is
  * the same trade Hadoop's TextInputFormat makes. (A splittable
  * newline-preserving InputFormat is possible — carry a per-line
  * has-terminator flag — but parity mode is the only consumer and runs at
  * golden-fixture scale by definition.)
  */
object ParityLines {

  /** Split one file's content into lines, each keeping its trailing
    * newline; a non-empty unterminated tail is emitted as-is.
    */
  private[graft] def splitKeepingNewlines(content: String): Seq[String] = {
    val out   = scala.collection.mutable.ArrayBuffer.empty[String]
    var start = 0
    var idx   = content.indexOf('\n')
    while (idx >= 0) {
      out += content.substring(start, idx + 1)
      start = idx + 1
      idx = content.indexOf('\n', start)
    }
    if (start < content.length) out += content.substring(start)
    out.toSeq
  }

  /** All lines under `path` (a file or directory), newlines preserved. */
  def apply(sc: SparkContext, path: String, minPartitions: Int): RDD[String] =
    sc.wholeTextFiles(path, minPartitions).flatMap { case (_, content) =>
      splitKeepingNewlines(content)
    }

  /** The reference's SORT-TASK grain, byte-exact (round 13, closing the
    * multi-file-per-task gap ADVICE r12 flagged): the manager sorts the
    * input file list by path and deals files round-robin over `numTasks`
    * task lists (`/root/reference/mapreduce/manager/__main__.py:403-415`
    * `partition[index % num_worker].append(file)`), and each sort task
    * CONCATENATES its files' raw bytes before splitting into lines
    * (`worker/__main__.py:174-177` `input_merge += file.read()`) — so a
    * file that ends mid-line merges its tail with the NEXT file's first
    * line within the same task. Returns one element per task:
    * (taskIndex, lines-with-real-newlines after the concat).
    *
    * The file-name collect is the same driver-side metadata pass the
    * reference's manager performs (its glob + sort); contents stay
    * executor-side.
    */
  def sortTasks(sc: SparkContext, path: String, numTasks: Int): RDD[(Int, Seq[String])] = {
    val files = sc.wholeTextFiles(path, numTasks)
    val order = files.keys.collect().sorted.zipWithIndex.toMap
    files
      .map { case (f, content) => (order(f) % numTasks, (order(f), content)) }
      .groupByKey(numTasks)
      .mapValues(fs => splitKeepingNewlines(fs.toSeq.sortBy(_._1).map(_._2).mkString("")))
  }
}
