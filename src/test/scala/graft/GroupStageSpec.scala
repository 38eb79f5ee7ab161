package graft

import graft.ops.GroupStage

/** Golden parity of the rank-mod distinct-line router against the
  * reference's `test_manager_08` fixtures
  * (`/root/reference/tests/testdata/test_manager_08/correct/job-0/grouper-output/`),
  * plus routing invariants on both modes.
  */
class GroupStageSpec extends SparkSpec {

  private lazy val mapperOut: Seq[String] =
    Seq("file01", "file02", "file03", "file04")
      .flatMap(f => readLines(resource(s"groupstage/mapper-output/$f")))

  test("rank-mod router reproduces reduce01/reduce02 goldens byte-for-byte") {
    val lines  = spark.sparkContext.parallelize(mapperOut, 4)
    val routed = GroupStage.rankMod(lines, 2)
    val parts = routed
      .mapPartitionsWithIndex { case (i, it) => Iterator((i, it.toList)) }
      .collect()
      .toMap
    assert(parts(0) == readLines(resource("groupstage/correct/reduce01")))
    assert(parts(1) == readLines(resource("groupstage/correct/reduce02")))
  }

  test("both routers keep all copies of a line in exactly one bucket, sorted") {
    val data  = (1 to 500).map(i => s"k${i % 37}\t${i % 5}") ++ Seq("\t1", "\t1")
    val lines = spark.sparkContext.parallelize(data, 8)
    for (mode <- Seq(true, false)) {
      val parts = GroupStage(lines, 3, mode)
        .mapPartitionsWithIndex { case (i, it) => it.map(l => (l, i)) }
        .collect()
      // multiset preserved
      assert(parts.map(_._1).sorted.toSeq == data.sorted)
      // each distinct line appears in exactly one partition
      val byLine = parts.groupBy(_._1).view.mapValues(_.map(_._2).distinct.length)
      assert(byLine.values.forall(_ == 1))
    }
  }

  test("sort task reproduces the test_worker_06 merged golden (1 reducer)") {
    // the reference's worker sort task: concat group inputs, line-sort
    // (`/root/reference/tests/test_worker_06.py:109-122` asserts the
    // sorted union of both input files)
    val input = Seq("worker06/test_worker_06.group_input01", "worker06/test_worker_06.group_input02")
      .flatMap(f => readLines(resource(s"groupstage/$f")))
    val lines  = spark.sparkContext.parallelize(input, 2)
    val merged = GroupStage.rankMod(lines, 1)
      .collect()
      .toList
    assert(merged == input.sorted)
    assert(
      merged == List("\t1", "\t1", "bye\t1", "goodbye\t1", "hadoop\t1", "hadoop\t1",
        "hello\t1", "hello\t1", "world\t1", "world\t1")
    )
  }

  test("rank-mod assigns consecutive sorted distinct lines round-robin") {
    val data  = Seq("a\t1", "b\t1", "c\t1", "d\t1", "e\t1", "a\t1")
    val lines = spark.sparkContext.parallelize(data, 2)
    val parts = GroupStage.rankMod(lines, 2)
      .mapPartitionsWithIndex { case (i, it) => Iterator((i, it.toList)) }
      .collect()
      .toMap
    // sorted distinct: a b c d e → buckets 0 1 0 1 0; both copies of "a" in bucket 0
    assert(parts(0) == List("a\t1", "a\t1", "c\t1", "e\t1"))
    assert(parts(1) == List("b\t1", "d\t1"))
  }
}
