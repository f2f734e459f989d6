package graft.operators

import java.nio.file.{FileSystems, Files, Path, Paths, StandardWatchEventKinds, WatchEvent, WatchKey}

import scala.collection.mutable

/** `fsevent` input (internal/impl/io/input_fsevent.go — the reference
  * wraps fsnotify): watches a set of paths and emits one message per
  * filesystem event with metadata (event op + path). The JVM-native
  * substrate is java.nio's WatchService (inotify on linux — the same
  * kernel facility fsnotify wraps). `recursive` registers existing
  * subdirectories AND any directory created while watching, matching
  * the reference's watchNewSubdirs behavior. */
object Fsevent {

  final case class FsEvent(op: String /* CREATE | WRITE | REMOVE */, path: String)

  final class Watcher(paths: Seq[String], recursive: Boolean = false) extends AutoCloseable {
    private val ws = FileSystems.getDefault.newWatchService()
    private val keyDirs = mutable.Map[WatchKey, Path]()
    private val pending = mutable.Queue[FsEvent]()

    private def register(dir: Path): Unit = {
      val key = dir.register(ws, StandardWatchEventKinds.ENTRY_CREATE,
        StandardWatchEventKinds.ENTRY_MODIFY, StandardWatchEventKinds.ENTRY_DELETE)
      keyDirs(key) = dir
      if (recursive)
        Files.list(dir).filter(Files.isDirectory(_)).forEach(register(_))
    }
    paths.foreach(p => register(Paths.get(p)))

    /** next event, or None once idle past timeoutMs */
    def next(timeoutMs: Long = 1000): Option[FsEvent] = {
      val deadline = System.currentTimeMillis() + timeoutMs
      while (pending.isEmpty && System.currentTimeMillis() <= deadline) {
        val key = ws.poll(math.max(1, deadline - System.currentTimeMillis()),
          java.util.concurrent.TimeUnit.MILLISECONDS)
        if (key != null) {
          val dir = keyDirs(key)
          key.pollEvents().forEach { ev =>
            val kind = ev.kind()
            if (kind == StandardWatchEventKinds.OVERFLOW) {
              // the platform buffered >512 events before a poll drained
              // them; events were LOST — surface it (the documented
              // WatchService contract is "re-examine the state"), a
              // consumer that keeps draining never hits this
              pending += FsEvent("OVERFLOW", dir.toString)
            } else {
              val rel = ev.asInstanceOf[WatchEvent[Path]].context()
              val full = dir.resolve(rel)
              val op = kind match {
                case StandardWatchEventKinds.ENTRY_CREATE => "CREATE"
                case StandardWatchEventKinds.ENTRY_MODIFY => "WRITE"
                case _ => "REMOVE"
              }
              // a new directory under a recursive watch is registered
              // too; files that landed in it BEFORE the registration
              // took effect surface as synthesized CREATEs (the
              // standard mitigation for the inotify registration race)
              if (recursive && op == "CREATE" && Files.isDirectory(full)) {
                register(full)
                Files.list(full).filter(p => !Files.isDirectory(p))
                  .forEach(p => pending += FsEvent("CREATE", p.toString))
              }
              pending += FsEvent(op, full.toString)
            }
          }
          key.reset()
        }
      }
      if (pending.isEmpty) None else Some(pending.dequeue())
    }

    override def close(): Unit = ws.close()
  }
}
