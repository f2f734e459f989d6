package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.core.Msg

/** `python` processor (internal/impl/python/processor.go — the
  * reference hosts a CPython 3.12 WASM build under wazero with a
  * per-processor instance pool). Here the guest runtime is an
  * out-of-process python3 worker — ONE interpreter per Spark
  * partition, line-framed JSON over stdin/stdout, the subprocess
  * operator's process model carrying the python processor's contract:
  *
  *  - the message's structured form binds as the global `this`;
  *  - the script assigns the global `root`; `None` (or never assigned)
  *    deletes the message (processor.go's Data Filtering example);
  *  - an exception puts `TypeName: message` into the error facet and
  *    leaves content unchanged (the try/catch routing surface);
  *  - `imports` pre-import modules into the script's globals.
  *
  * The script compiles ONCE per worker; per-message cost is one
  * exec() over fresh globals. Worker count scales with partitions,
  * never rows — the proc_java/wasm lifecycle discipline.
  */
object Python {

  private val entrypoint: String =
    """import sys, json
      |spec = json.loads(sys.stdin.readline())
      |code = compile(spec["script"], "<graft-python>", "exec")
      |mods = {m: __import__(m) for m in spec.get("imports", [])}
      |sys.stdout.write("READY\n"); sys.stdout.flush()
      |for line in sys.stdin:
      |    frame = json.loads(line)
      |    g = dict(mods)
      |    g["root"] = None
      |    try:
      |        g["this"] = json.loads(frame["content"])
      |        exec(code, g)
      |        resp = json.dumps({"ok": True, "root": g.get("root")}, allow_nan=False)
      |    except Exception as e:
      |        # dumps stays inside the guard: a non-JSON root (set, bytes,
      |        # NaN with allow_nan=False, custom object) routes to the error
      |        # facet instead of killing the worker mid-stream
      |        resp = json.dumps({"ok": False, "error": f"{type(e).__name__}: {e}"})
      |    sys.stdout.write(resp); sys.stdout.write("\n"); sys.stdout.flush()
      |""".stripMargin

  /** one pooled interpreter: spawn, ship the script, READY handshake,
    * then request/response per message */
  final class Worker(script: String, imports: Seq[String]) extends AutoCloseable {
    import graft.conn.Aws.Json
    private val proc = new ProcessBuilder("python3", "-u", "-c", entrypoint).start()
    private val toPy = new java.io.BufferedWriter(
      new java.io.OutputStreamWriter(proc.getOutputStream, "UTF-8"))
    private val fromPy = new java.io.BufferedReader(
      new java.io.InputStreamReader(proc.getInputStream, "UTF-8"))
    locally {
      toPy.write(Json.render(Json.obj("script" -> script,
        "imports" -> imports.toVector.map(m => m: Any))))
      toPy.write("\n"); toPy.flush()
      val ready = fromPy.readLine()
      require(ready == "READY", {
        val err = new String(proc.getErrorStream.readNBytes(4096), "UTF-8")
        s"python worker failed to start: $ready $err"
      })
    }

    /** Right(Some(rootJson)) mapped, Right(None) deleted, Left(error) */
    def process(contentJson: String): Either[String, Option[String]] =
      processBatch(Seq(contentJson)).head

    /** pipelined: frames stream from a writer thread while responses
      * are read in order on this one — the per-message flush + context
      * switch dominates the synchronous form (measured ~110 µs/row),
      * and the concurrent read side means no batch size can deadlock
      * on a full stdin/stdout pipe buffer */
    def processBatch(contents: Seq[String]): Seq[Either[String, Option[String]]] = {
      if (contents.isEmpty) return Nil
      val writer = new Thread(() => {
        try {
          contents.foreach { c =>
            toPy.write(Json.render(Json.obj("content" -> c))); toPy.write("\n")
          }
          toPy.flush()
        } catch { case _: java.io.IOException => () } // reader surfaces the death
      })
      writer.setDaemon(true); writer.start()
      val out = contents.map { _ =>
        val line = fromPy.readLine()
        require(line != null, "python worker died mid-stream")
        val resp = Json.asObj(Json.parse(line))
        if (resp.get("ok").contains(true))
          Right(resp.get("root").filter(_ != null).map(Json.render))
        else Left(Json.str(resp, "error"))
      }
      writer.join()
      out
    }

    override def close(): Unit = {
      try { toPy.close(); proc.waitFor(2, java.util.concurrent.TimeUnit.SECONDS); () }
      catch { case _: Throwable => () }
      finally proc.destroyForcibly()
    }
  }

  /** envelope in, envelope out: content remapped through the script,
    * deletions dropped, failures routed to the error facet */
  def processor(script: String, imports: Seq[String] = Nil)(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(Msg.ContentCol), col(Msg.MetaCol), col(Msg.ErrorCol))
      .as[(String, Map[String, String], String)]
      .mapPartitions { it =>
        if (it.isEmpty) Iterator.empty
        else {
          val w = new Worker(script, imports)
          // close on EVERY task exit (downstream limit/take, task failure),
          // not just a fully-drained iterator — else the python3 subprocess
          // outlives the task for the life of the executor JVM
          Option(org.apache.spark.TaskContext.get())
            .foreach(_.addTaskCompletionListener[Unit](_ => w.close()))
          // micro-batched pipelining: 256 rows per batch keeps the
          // interpreter busy instead of paying a round-trip per row
          val mapped = it.grouped(256).flatMap { group =>
            val live = group.collect { case (c, _, e) if e == null && c != null => c }
            val results = w.processBatch(live).iterator
            group.iterator.flatMap {
              case row @ (c, _, e) if e != null || c == null => Iterator.single(row)
              case (content, meta, _) => results.next() match {
                case Right(Some(root)) => Iterator.single((root, meta, null: String))
                case Right(None) => Iterator.empty // root = None: deleted
                case Left(e) => Iterator.single((content, meta, e))
              }
            }
          }
          new Iterator[(String, Map[String, String], String)] {
            def hasNext: Boolean = { val h = mapped.hasNext; if (!h) w.close(); h }
            def next(): (String, Map[String, String], String) = mapped.next()
          }
        }
      }.toDF(Msg.ContentCol, Msg.MetaCol, Msg.ErrorCol)
  }
}
