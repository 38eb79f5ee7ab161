package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM pins for the core session registries (no SparkSession). */
class CoreUtilSpec extends AnyFunSuite {

  test("BuildWalls accumulates duplicate names instead of overwriting") {
    graft.core.BuildWalls.record("coreutilspec_wall", 1.5)
    graft.core.BuildWalls.record("coreutilspec_wall", 2.5)
    graft.core.BuildWalls.record("coreutilspec_wall", 3.5)
    val snap = graft.core.BuildWalls.snapshot
    assert(snap("coreutilspec_wall") == 1.5, "first build must keep the bare name")
    assert(snap("coreutilspec_wall#2") == 2.5)
    assert(snap("coreutilspec_wall#3") == 3.5)
  }
}
