package graft

import java.nio.file.{Files, Paths}

import graft.operators.Fsevent
import org.scalatest.funsuite.AnyFunSuite

/** fsevent input over java.nio WatchService: create/write/remove
  * events with paths, and recursive registration of new subdirs. */
class FseventSpec extends AnyFunSuite {

  private def drain(w: Fsevent.Watcher, quietMs: Long = 400): Vector[Fsevent.FsEvent] = {
    val out = Vector.newBuilder[Fsevent.FsEvent]
    var e = w.next(quietMs)
    while (e.isDefined) { out += e.get; e = w.next(quietMs) }
    out.result()
  }

  test("create, write and remove events carry the op and full path") {
    val dir = Files.createTempDirectory("fsev").toString
    val w = new Fsevent.Watcher(Seq(dir))
    try {
      val f = Paths.get(dir, "a.txt")
      Files.write(f, "v1".getBytes)
      Thread.sleep(50)
      Files.write(f, "v2-longer".getBytes)
      Thread.sleep(50)
      Files.delete(f)
      val evs = drain(w)
      val byOp = evs.groupBy(_.op)
      assert(byOp.contains("CREATE") && byOp.contains("REMOVE"), s"got $evs")
      assert(evs.forall(_.path == f.toString))
      assert(evs.head.op == "CREATE" && evs.last.op == "REMOVE", "kernel order preserved")
    } finally w.close()
  }

  test("recursive watch follows directories created while watching") {
    val dir = Files.createTempDirectory("fsevr").toString
    Files.createDirectory(Paths.get(dir, "pre")) // existing subdir
    val w = new Fsevent.Watcher(Seq(dir), recursive = true)
    try {
      Files.write(Paths.get(dir, "pre", "x.txt"), "1".getBytes)
      val sub = Paths.get(dir, "new-sub")
      Files.createDirectory(sub)
      Thread.sleep(100) // let the registration land before the write
      Files.write(sub.resolve("y.txt"), "2".getBytes)
      val evs = drain(w)
      val paths = evs.filter(_.op == "CREATE").map(_.path)
      assert(paths.contains(Paths.get(dir, "pre", "x.txt").toString), "pre-existing subdir watched")
      assert(paths.contains(sub.resolve("y.txt").toString), "subdir created mid-watch watched too")
    } finally w.close()
  }

  test("a non-recursive watch does not see subdir contents") {
    val dir = Files.createTempDirectory("fsevn").toString
    Files.createDirectory(Paths.get(dir, "sub"))
    val w = new Fsevent.Watcher(Seq(dir))
    try {
      Files.write(Paths.get(dir, "sub", "hidden.txt"), "1".getBytes)
      Files.write(Paths.get(dir, "seen.txt"), "2".getBytes)
      val evs = drain(w)
      assert(evs.exists(_.path.endsWith("seen.txt")))
      assert(!evs.exists(_.path.endsWith("hidden.txt")))
    } finally w.close()
  }
}
