package graft

import java.nio.charset.StandardCharsets.UTF_8

import graft.conn.Hdfs
import org.scalatest.funsuite.AnyFunSuite

/** WebHDFS REST semantics over MiniHdfs: the two-step 307-redirect
  * write/read path, overwrite guards, append, LISTSTATUS JSON, delete. */
class HdfsSpec extends AnyFunSuite {
  private def b(s: String) = s.getBytes(UTF_8)

  private def withHdfs[T](f: (Hdfs.MiniHdfs, Hdfs.Client) => T): T = {
    val srv = new Hdfs.MiniHdfs().start()
    val c = new Hdfs.Client(srv.endpoint)
    try f(srv, c) finally { c.close(); srv.stop() }
  }

  test("create follows the namenode 307 to the datanode; open reads it back the same way") {
    withHdfs { (srv, c) =>
      c.create("/data/part-00000.txt", b("hello hdfs"))
      assert(srv.fileCount == 1)
      assert(c.open("/data/part-00000.txt").map(new String(_, UTF_8)).contains("hello hdfs"))
      assert(c.open("/data/absent").isEmpty)
    }
  }

  test("overwrite=false rejects an existing path; append concatenates") {
    withHdfs { (_, c) =>
      c.create("/f", b("v1"))
      val e = intercept[IllegalArgumentException](c.create("/f", b("v2"), overwrite = false))
      assert(e.getMessage.contains("FileAlreadyExists"))
      c.create("/f", b("v2")) // overwrite
      c.append("/f", b("+more"))
      assert(c.open("/f").map(new String(_, UTF_8)).contains("v2+more"))
    }
  }

  test("LISTSTATUS returns sorted FileStatus entries scoped to the directory") {
    withHdfs { (_, c) =>
      (1 to 5).foreach(i => c.create(f"/logs/p$i%03d", b("x" * i)))
      c.create("/other/y", b("z"))
      val ls = c.listStatus("/logs")
      assert(ls.map(_.pathSuffix) == (1 to 5).map(i => f"p$i%03d"))
      assert(ls.map(_.length) == (1L to 5L))
      assert(c.listStatus("/nope").isEmpty)
    }
  }

  test("delete reports whether the path existed; binary content survives") {
    withHdfs { (_, c) =>
      val data = Array.tabulate[Byte](512)(_.toByte)
      c.create("/bin", data)
      assert(c.open("/bin").get.toSeq == data.toSeq)
      assert(c.delete("/bin"))
      assert(!c.delete("/bin"))
      assert(c.open("/bin").isEmpty)
    }
  }
}
