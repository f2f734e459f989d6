package graft

import graft.blob.{Bloblang, Interp}
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Runs the reference's OWN Bloblang golden tests verbatim
  * (the yaml files under config/test/bloblang — the `bento test` corpus, reference
  * runner: internal/cli/test/case.go:37-107). Assertions supported:
  * content_equals (exact bytes), json_equals (structural), file_equals,
  * metadata_equals, json_contains, and truthy `bloblang:` expressions
  * (incl. error() text against the reference's exact
  * "failed assignment (line N): …" wording). ALL cases in the corpus run.
  */
class BloblangGoldenSpec extends AnyFunSuite {

  // Vendored copy of the reference's public `config/test` fixture tree
  // (src/test/resources/bloblang-golden) — the suite no longer depends on
  // a reference checkout being present at runtime.
  private val corpusRoot =
    new java.io.File(getClass.getResource("/bloblang-golden").toURI)
  private val corpusDirs = Seq(
    new java.io.File(corpusRoot, "bloblang"),
    corpusRoot,
    new java.io.File(corpusRoot, "cookbooks"))
  private val yaml = new org.yaml.snakeyaml.Yaml()

  private def anyRef(v: Any): Any = v // readability alias

  private def loadYaml(f: java.io.File): java.util.Map[String, Any] =
    yaml.load[java.util.Map[String, Any]](java.nio.file.Files.readString(f.toPath))

  /** A runnable pipeline extracted from a test case: the mapping source,
    * whether it's a `mutation` (root starts as `this`), and whether a
    * trailing `unarchive: json_array` expands the result. */
  private case class Pipeline(src: String, mutation: Boolean, unarchive: Boolean)

  private def mappingFor(testCase: java.util.Map[String, Any],
                         selfFile: java.io.File,
                         selfDoc: java.util.Map[String, Any]): Option[Pipeline] = {
    Option(testCase.get("target_mapping")).map(_.toString) match {
      case Some(rel) =>
        val f = new java.io.File(selfFile.getParentFile, rel)
        Some(Pipeline(java.nio.file.Files.readString(f.toPath), mutation = false, unarchive = false))
      case None =>
        // no target at all defaults to the config's own pipeline
        // (reference test runner default, internal/cli/test/)
        Option(testCase.get("target_processors")).map(_.toString)
          .orElse(Some("/pipeline/processors")).flatMap { tp =>
          // a bare name targets a labelled processor_resources entry
          if (!tp.startsWith("/") && !tp.contains("#")) {
            return Option(selfDoc.get("processor_resources")).toSeq
              .flatMap(_.asInstanceOf[java.util.List[_]].asScala)
              .map(_.asInstanceOf[java.util.Map[String, Any]])
              .find(r => String.valueOf(r.get("label")) == tp)
              .flatMap { r =>
                Option(r.get("mapping")).orElse(Option(r.get("bloblang")))
                  .map(s => Pipeline(s.toString, mutation = false, unarchive = false))
              }
          }
          val (doc, pointer) =
            if (tp.startsWith("/")) (selfDoc, tp)
            else {
              val Array(relF, ptr) = tp.split("#", 2)
              (loadYaml(new java.io.File(selfFile.getParentFile, relF)), ptr)
            }
          def resolve(in: Any): Any = pointer.stripPrefix("/").split("/").foldLeft(in) {
            case (m: java.util.Map[_, _], seg) => m.asInstanceOf[java.util.Map[String, Any]].get(seg)
            case (l: java.util.List[_], seg) => l.get(seg.toInt)
            case _ => null
          }
          // `X_bento_test.yaml` tests target the sibling config `X.yaml`
          // (reference test runner pairing, internal/cli/test/) when the
          // pointer doesn't resolve in the test file itself
          val node = resolve(doc) match {
            case null if selfFile.getName.endsWith("_bento_test.yaml") =>
              val sibling = new java.io.File(selfFile.getParentFile,
                selfFile.getName.stripSuffix("_bento_test.yaml") + ".yaml")
              if (sibling.exists()) resolve(loadYaml(sibling)) else null
            case n => n
          }
          def asProc(o: Any): Option[java.util.Map[String, Any]] = o match {
            case p: java.util.Map[_, _] => Some(p.asInstanceOf[java.util.Map[String, Any]])
            case _ => None
          }
          node match {
            // pointer straight at ONE processor (e.g. /pipeline/processors/0)
            case p: java.util.Map[_, _] =>
              val pm = p.asInstanceOf[java.util.Map[String, Any]]
              Option(pm.get("bloblang")).orElse(Option(pm.get("mapping")))
                .map(s => Pipeline(s.toString, mutation = false, unarchive = false))
                .orElse(Option(pm.get("mutation"))
                  .map(s => Pipeline(s.toString, mutation = true, unarchive = false)))
            case procs: java.util.List[_] if procs.size >= 1 =>
              asProc(procs.get(0)).flatMap { pm =>
                val srcOpt = Option(pm.get("bloblang")).orElse(Option(pm.get("mapping")))
                  .map(s => Pipeline(s.toString, mutation = false, unarchive = false))
                  .orElse(Option(pm.get("mutation"))
                    .map(s => Pipeline(s.toString, mutation = true, unarchive = false)))
                srcOpt.flatMap { p =>
                  if (procs.size == 1) Some(p)
                  else if (procs.size == 2 && asProc(procs.get(1)).exists(q =>
                    Option(q.get("unarchive")).flatMap(asProc).exists(
                      _.get("format") == "json_array")))
                    Some(p.copy(unarchive = true))
                  else None
                }
              }
            case _ => None
          }
        }
    }
  }

  private def jsonEq(a: String, b: String): Boolean =
    Interp.valueEq(Interp.parseJsonTyped(a), Interp.parseJsonTyped(b))

  /** json_contains assertion: `want` is a recursive subset of `got`. */
  private def jsonContains(got: Any, want: Any): Boolean = (got, want) match {
    case (g: scala.collection.immutable.VectorMap[String @unchecked, Any @unchecked],
          w: scala.collection.immutable.VectorMap[String @unchecked, Any @unchecked]) =>
      w.forall { case (k, wv) => g.get(k).exists(jsonContains(_, wv)) }
    case (g: Vector[Any @unchecked], w: Vector[Any @unchecked]) =>
      w.forall(wv => g.exists(jsonContains(_, wv)))
    case (g, w) => Interp.valueEq(g, w)
  }

  /** Cache-backed `dedupe` pipeline tests (deduplicate{,_lifo,_lru,_ttlru}
    * .yaml): single dedupe processor, interpolated key, cache state shared
    * across batches. FIFO keeps the first occurrence of a key, LIFO the
    * last; outputs group by original batch with empty batches dropped
    * (reference processor_dedupe.go + cache semantics).
    * Returns None when the shape isn't a single-dedupe pipeline. */
  private def runDedupeCase(tc: java.util.Map[String, Any],
                            doc: java.util.Map[String, Any]): Option[Boolean] = {
    import graft.blob.{Bloblang, Interp, Interpolate}
    // pipeline = optional leading `mapping` (e.g. batch-tagging) + `dedupe`
    val procList = Option(doc.get("pipeline"))
      .collect { case m: java.util.Map[_, _] => m.asInstanceOf[java.util.Map[String, Any]] }
      .flatMap(p => Option(p.get("processors")))
      .collect { case l: java.util.List[_] if l.size == 1 || l.size == 2 =>
        l.asScala.toList.map(_.asInstanceOf[java.util.Map[String, Any]]) }
      .getOrElse(Nil)
    val dedupe = procList.lastOption.flatMap(p => Option(p.get("dedupe")))
      .collect { case m: java.util.Map[_, _] => m.asInstanceOf[java.util.Map[String, Any]] }
    val preMapping = procList.dropRight(1).headOption
      .flatMap(p => Option(p.get("mapping")).orElse(Option(p.get("bloblang"))))
      .flatMap(src => scala.util.Try(Bloblang.parse(String.valueOf(src))).toOption)
    (dedupe, Option(tc.get("input_batches"))) match {
      case (Some(conf), Some(ibs0)) =>
        val keyTpl = Interpolate.compile(String.valueOf(conf.get("key")))
        val lifo = String.valueOf(conf.get("strategy")) == "LIFO"
        val batches = ibs0.asInstanceOf[java.util.List[_]].asScala.map(
          _.asInstanceOf[java.util.List[_]].asScala.map { m0 =>
            val m = m0.asInstanceOf[java.util.Map[String, Any]]
            val meta = Option(m.get("metadata")).map(
              _.asInstanceOf[java.util.Map[String, Any]].asScala
                .map { case (k, v) => k -> String.valueOf(v) }.toMap).getOrElse(Map.empty[String, String])
            (String.valueOf(m.get("content")), meta)
          })
        val flat = batches.zipWithIndex.flatMap { case (b, bi) =>
          // apply the tagging mapping batch-wise, then render each key in
          // full batch context (meta(...).from(0) etc.)
          val msgs = preMapping match {
            case Some(prog) =>
              Interp.runBatchWithMeta(prog, b.toSeq).collect {
                case (Some(c), meta) => (c, meta)
              }.toVector
            case None => b.toVector
          }
          val (cs, ms) = (msgs.map(_._1), msgs.map(_._2))
          msgs.zipWithIndex.map { case ((c, _), i) =>
            (bi, c, Interpolate.renderInBatch(keyTpl, cs, ms, i))
          }
        }
        val keep: Map[String, Int] = // key -> global index of the kept row
          flat.zipWithIndex.foldLeft(Map.empty[String, Int]) { case (acc, ((_, _, k), i)) =>
            if (lifo) acc + (k -> i)
            else if (acc.contains(k)) acc else acc + (k -> i)
          }
        val keptIdx = keep.values.toSet
        val outBatches = flat.zipWithIndex
          .filter { case (_, i) => keptIdx.contains(i) }
          .groupBy { case ((bi, _, _), _) => bi }.toSeq.sortBy(_._1)
          .map { case (_, rows) => rows.map { case ((_, c, _), _) => c } }
          .filter(_.nonEmpty)
        val expected = tc.get("output_batches").asInstanceOf[java.util.List[_]].asScala
          .map(_.asInstanceOf[java.util.List[_]].asScala
            .map(_.asInstanceOf[java.util.Map[String, Any]]))
        val ok = outBatches.size == expected.size &&
          outBatches.zip(expected).forall { case (got, want) =>
            got.size == want.size && got.zip(want).forall { case (g, w) =>
              Option(w.get("content_equals")) match {
                case Some(c) => g == c.toString
                case None => Option(w.get("json_equals")).exists { j =>
                  val wantJson = j match {
                    case s: String => s
                    case o => new com.fasterxml.jackson.databind.ObjectMapper().writeValueAsString(o)
                  }
                  jsonEq(g, wantJson)
                }
              }
            }
          }
        Some(ok)
      case _ => None
    }
  }

  /** Pipelines where EVERY processor is a mapping (e.g. cache_resource:
    * cache_set then cache_get across two processors): run each processor
    * batch-wise in order with one shared cache-resource map. */
  private def runMappingPipelineCase(tc: java.util.Map[String, Any],
                                     doc: java.util.Map[String, Any]): Option[Boolean] = {
    import graft.blob.{Bloblang, Interp}
    val procs = Option(doc.get("pipeline"))
      .collect { case m: java.util.Map[_, _] => m.asInstanceOf[java.util.Map[String, Any]] }
      .flatMap(p => Option(p.get("processors")))
      .collect { case l: java.util.List[_] =>
        l.asScala.toList.map(_.asInstanceOf[java.util.Map[String, Any]]) }
      .getOrElse(Nil)
    val mappings = procs.flatMap(p =>
      Option(p.get("mapping")).orElse(Option(p.get("bloblang"))).toList)
      .flatMap(src => scala.util.Try(Bloblang.parse(String.valueOf(src))).toOption)
    if (procs.isEmpty || mappings.size != procs.size) return None
    Option(tc.get("input_batches")).map { ibs0 =>
      val batches = ibs0.asInstanceOf[java.util.List[_]].asScala.map(
        _.asInstanceOf[java.util.List[_]].asScala.map { m0 =>
          val m = m0.asInstanceOf[java.util.Map[String, Any]]
          val meta = Option(m.get("metadata")).map(
            _.asInstanceOf[java.util.Map[String, Any]].asScala
              .map { case (k, v) => k -> String.valueOf(v) }.toMap)
            .getOrElse(Map.empty[String, String])
          (String.valueOf(m.get("content")), meta)
        }.toVector)
      val caches = scala.collection.mutable.Map
        .empty[String, scala.collection.mutable.Map[String, String]]
      val outBatches = batches.map { b =>
        mappings.foldLeft(b) { (msgs, prog) =>
          Interp.runBatchWithMeta(prog, msgs, Map.empty, caches)
            .collect { case (Some(c), meta) => (c, meta) }.toVector
        }
      }.filter(_.nonEmpty)
      val expected = tc.get("output_batches").asInstanceOf[java.util.List[_]].asScala
        .map(_.asInstanceOf[java.util.List[_]].asScala
          .map(_.asInstanceOf[java.util.Map[String, Any]]))
      outBatches.size == expected.size &&
        outBatches.zip(expected).forall { case (got, want) =>
          got.size == want.size && got.zip(want).forall { case ((g, _), w) =>
            Option(w.get("content_equals")) match {
              case Some(c) => g == c.toString
              case None => Option(w.get("json_equals")).exists { j =>
                val wantJson = j match {
                  case s: String => s
                  case o => new com.fasterxml.jackson.databind.ObjectMapper().writeValueAsString(o)
                }
                jsonEq(g, wantJson)
              }
            }
          }
        }
    }
  }

  /** Pipelines whose single processor is `awk` (awk_bento_test.yaml):
    * run the Awk subset interpreter per message. */
  private def runAwkCase(tc: java.util.Map[String, Any],
                         doc0: java.util.Map[String, Any],
                         selfFile: java.io.File): Option[Boolean] = {
    // X_bento_test.yaml targets the sibling config X.yaml
    val doc =
      if (doc0.get("pipeline") == null && selfFile.getName.endsWith("_bento_test.yaml")) {
        val sibling = new java.io.File(selfFile.getParentFile,
          selfFile.getName.stripSuffix("_bento_test.yaml") + ".yaml")
        if (sibling.exists()) loadYaml(sibling) else doc0
      } else doc0
    val awkConf = Option(doc.get("pipeline"))
      .collect { case m: java.util.Map[_, _] => m.asInstanceOf[java.util.Map[String, Any]] }
      .flatMap(p => Option(p.get("processors")))
      .collect { case l: java.util.List[_] if l.size == 1 => l.get(0) }
      .collect { case m: java.util.Map[_, _] => m.asInstanceOf[java.util.Map[String, Any]] }
      .flatMap(p => Option(p.get("awk")))
      .collect { case m: java.util.Map[_, _] => m.asInstanceOf[java.util.Map[String, Any]] }
    awkConf.flatMap { conf =>
      val program = String.valueOf(conf.get("program"))
      Option(tc.get("input_batch")).map { ib =>
        val inputs = ib.asInstanceOf[java.util.List[_]].asScala.map(
          _.asInstanceOf[java.util.Map[String, Any]])
        val expected = tc.get("output_batches").asInstanceOf[java.util.List[_]]
          .get(0).asInstanceOf[java.util.List[_]].asScala
          .map(_.asInstanceOf[java.util.Map[String, Any]])
        inputs.size == expected.size && inputs.zip(expected).forall { case (in, w) =>
          val meta = Option(in.get("metadata")).map(
            _.asInstanceOf[java.util.Map[String, Any]].asScala
              .map { case (k, v) => k -> String.valueOf(v) }.toMap)
            .getOrElse(Map.empty[String, String])
          val (outC, outM) = graft.operators.Awk.run(
            program, String.valueOf(in.get("content")), meta)
          val contentOk = Option(w.get("content_equals")) match {
            case Some(c) => jsonEq(outC, c.toString) || outC == c.toString
            case None => true
          }
          val metaOk = Option(w.get("metadata_equals")).forall { mo =>
            mo.asInstanceOf[java.util.Map[String, Any]].asScala.forall {
              case (k, v) => outM.get(k).contains(String.valueOf(v))
            }
          }
          contentOk && metaOk
        }
      }
    }
  }

  /** Mock-aware pipelines (mock_http_proc*, infile_resource_mock): each
    * processor is a mapping, a labelled non-mapping (http/…) whose label
    * is mocked by a mapping, or a `resource` ref mocked by name; a mock
    * keyed by the JSON-pointer `/pipeline/processors/-` appends one.
    * Runs the chain with the processor error contract (failed mapping →
    * content unchanged + error facet) and supports content/json/metadata
    * and truthy-`bloblang` assertions. */
  private def runMockPipelineCase(tc: java.util.Map[String, Any],
                                  doc: java.util.Map[String, Any]): Option[Boolean] = {
    import graft.blob.{Bloblang, Interp}
    def asMap(o: Any): java.util.Map[String, Any] = o.asInstanceOf[java.util.Map[String, Any]]
    def mappingSrc(p: java.util.Map[String, Any]): Option[String] =
      Option(p.get("mapping")).orElse(Option(p.get("bloblang"))).map(String.valueOf)

    val procs = Option(doc.get("pipeline")).map(asMap)
      .flatMap(p => Option(p.get("processors")))
      .collect { case l: java.util.List[_] => l.asScala.toList.map(asMap) }
      .getOrElse(Nil)
    val mocks0 = Option(tc.get("mocks")).map(asMap).map(_.asScala.toMap).getOrElse(Map.empty)
    if (procs.isEmpty || mocks0.isEmpty) return None
    val mocks = mocks0.map { case (k, v) => k -> mappingSrc(asMap(v)) }
    if (mocks.values.exists(_.isEmpty)) return None

    // resolve each processor to a mapping source: own mapping, or mock by
    // label / resource name / JSON-pointer index (/pipeline/processors/N)
    val resolved: List[Option[String]] = procs.zipWithIndex.map { case (p, i) =>
      val key = Option(p.get("label")).map(String.valueOf)
        .orElse(Option(p.get("resource")).map(String.valueOf))
      key.flatMap(mocks.get).flatten
        .orElse(mocks.get(s"/pipeline/processors/$i").flatten)
        .orElse(mappingSrc(p))
    }
    if (resolved.exists(_.isEmpty)) return None
    val appended = mocks.get("/pipeline/processors/-").flatten.toList
    val sources = resolved.flatten ++ appended
    val progs =
      try sources.map(Bloblang.parse)
      catch { case _: Exception => return None }

    val inputs = Option(tc.get("input_batch"))
      .collect { case l: java.util.List[_] => l.asScala.toList.map(asMap) }
      .getOrElse(return None)
      .map { m =>
        val content = Option(m.get("content")).map(String.valueOf).getOrElse {
          new com.fasterxml.jackson.databind.ObjectMapper()
            .writeValueAsString(m.get("json_content"))
        }
        val meta = Option(m.get("metadata")).map(
          asMap(_).asScala.map { case (k, v) => k -> String.valueOf(v) }.toMap)
          .getOrElse(Map.empty[String, String])
        (content, meta, null: String)
      }

    val caches = scala.collection.mutable.Map
      .empty[String, scala.collection.mutable.Map[String, String]]
    val out = progs.foldLeft(inputs.toVector) { (msgs, prog) =>
      Interp.runBatchWithErrors(prog, msgs, Map.empty, caches).toVector
    }

    val expected = Option(tc.get("output_batches"))
      .collect { case l: java.util.List[_] =>
        l.asScala.toList.map(_.asInstanceOf[java.util.List[_]].asScala.toList.map(asMap)) }
      .getOrElse(List(Nil))
    val wantBatch = expected.headOption.getOrElse(Nil)
    Some(expected.size <= 1 && out.size == wantBatch.size &&
      out.zip(wantBatch).forall { case ((g, gm, gerr), w) =>
        val contentOk = Option(w.get("content_equals")) match {
          case Some(c) => g == c.toString
          case None => Option(w.get("json_equals")) match {
            case Some(j) =>
              val wantJson = j match {
                case s: String => s
                case o => new com.fasterxml.jackson.databind.ObjectMapper().writeValueAsString(o)
              }
              jsonEq(g, wantJson)
            case None => true
          }
        }
        val metaOk = Option(w.get("metadata_equals")).forall { mo =>
          asMap(mo).asScala.forall { case (k, v) => gm.get(k).contains(String.valueOf(v)) }
        }
        val blobOk = Option(w.get("bloblang")).forall { srcB =>
          try {
            val e = Bloblang.parseExpr(String.valueOf(srcB))
            val parsed: () => Any = {
              lazy val v = try Interp.parseJsonTyped(g) catch { case _: Exception => null }
              () => v
            }
            Interp.eval(e, Interp.Ctx(parsed, g, scala.collection.mutable.Map.empty,
              gm, Map.empty, Map.empty, graft.blob.Bloblang.VNothing,
              errorMsg = gerr)) == true
          } catch { case _: Exception => false }
        }
        contentOk && metaOk && blobOk
      })
  }

  /** Mapping cases seen by the last runCorpus() pass — (name, program
    * post-mutation-wrap, input contents, env, per-input metadata) — feeds
    * the compiled-subset coverage gate below. */
  private val collectedCases = scala.collection.mutable.Buffer
    .empty[(String, Bloblang.Mapping, Seq[String], Map[String, String], Seq[Map[String, String]])]

  /** Run every supported case in the corpus; returns (passed, failed, skipped). */
  private def runCorpus(): (Int, Int, Int, Seq[String], Seq[String]) = {
    collectedCases.clear()
    var (passed, failed, skipped) = (0, 0, 0)
    val failures = Seq.newBuilder[String]
    val skips = Seq.newBuilder[String]
    val files = corpusDirs.flatMap(d => Option(d.listFiles()).toSeq.flatten)
      .filter(_.getName.endsWith(".yaml")).sortBy(_.getName)
    for (f <- files) {
      val doc = try loadYaml(f) catch { case _: Exception => null }
      val tests = if (doc == null) null else doc.get("tests")
      tests match {
        case l: java.util.List[_] =>
          for (tc0 <- l.asScala) {
            val tc = tc0.asInstanceOf[java.util.Map[String, Any]]
            val name = f.getName + "/" + tc.get("name")
            mappingFor(tc, f, doc) match {
              case None =>
                runDedupeCase(tc, doc).orElse(runMappingPipelineCase(tc, doc))
                    .orElse(runMockPipelineCase(tc, doc))
                    .orElse(runAwkCase(tc, doc, f)) match {
                  case None => skipped += 1; skips += name
                  case Some(true) => passed += 1
                  case Some(false) => failed += 1; failures += s"$name: pipeline mismatch"
                }
              case Some(pipe) =>
                val env = Option(tc.get("environment")).map(
                  _.asInstanceOf[java.util.Map[String, Any]].asScala
                    .map { case (k, v) => k -> String.valueOf(v) }.toMap).getOrElse(Map.empty)
                val inputs = tc.get("input_batch").asInstanceOf[java.util.List[_]].asScala
                  .map(_.asInstanceOf[java.util.Map[String, Any]])
                // absent output_batches = the batch is expected to be empty
                val expected = Option(tc.get("output_batches"))
                  .map(_.asInstanceOf[java.util.List[_]]
                    .get(0).asInstanceOf[java.util.List[_]].asScala
                    .map(_.asInstanceOf[java.util.Map[String, Any]]))
                  .getOrElse(scala.collection.mutable.Buffer.empty[java.util.Map[String, Any]])
                // all assertions must be content/json/file/metadata_equals,
                // json_contains, or a truthy bloblang expression
                if (!expected.forall(a =>
                    a.containsKey("content_equals") || a.containsKey("json_equals") ||
                    a.containsKey("file_equals") || a.containsKey("metadata_equals") ||
                    a.containsKey("json_contains") || a.containsKey("bloblang"))) {
                  skipped += 1
                  skips += name
                } else {
                  try {
                    // config-level env interpolation `${VAR}`/`${VAR:default}`
                    // (distinct from `${!expr}` field interpolation)
                    val src = "\\$\\{([A-Za-z_][A-Za-z0-9_]*)(?::([^}]*))?\\}".r
                      .replaceAllIn(pipe.src, m => java.util.regex.Matcher.quoteReplacement(
                        env.getOrElse(m.group(1), Option(m.group(2)).getOrElse(""))))
                    val parsed = Bloblang.parse(src)
                    // mutation = mapping whose root starts as `this`
                    val prog = if (pipe.mutation)
                      parsed.copy(stmts =
                        Bloblang.AssignRoot(Vector.empty, Bloblang.This) +: parsed.stmts)
                    else parsed
                    val contents = inputs.map { in =>
                      if (in.containsKey("json_content"))
                        new com.fasterxml.jackson.databind.ObjectMapper()
                          .writeValueAsString(in.get("json_content"))
                      else if (in.containsKey("file_content"))
                        java.nio.file.Files.readString(new java.io.File(
                          f.getParentFile, in.get("file_content").toString).toPath).stripLineEnd
                      else String.valueOf(in.get("content"))
                    }.toSeq
                    val metas = inputs.map(in => Option(in.get("metadata"))
                      .map(_.asInstanceOf[java.util.Map[String, Any]].asScala
                        .map { case (k, v) => k -> String.valueOf(v) }.toMap)
                      .getOrElse(Map.empty[String, String])).toSeq
                    collectedCases += ((name, prog, contents, env, metas))
                    // metadata is per-message: run individually when any
                    // input carries it or an assertion inspects it
                    // (batch functions don't appear in those cases)
                    val needMeta = expected.exists(_.containsKey("metadata_equals"))
                    // bloblang assertions can read error(): run with the
                    // processor error contract in that case
                    val needErr = expected.exists(_.containsKey("bloblang"))
                    val (mapped, outMetas, outErrs) =
                      if (needErr) {
                        val st = Interp.runBatchWithErrors(prog,
                          contents.zip(metas).map { case (c, m) => (c, m, null: String) }, env)
                        (st.map(_._1), st.map(_._2), st.map(_._3))
                      } else if (metas.forall(_.isEmpty) && !needMeta)
                        (Interp.runBatch(prog, contents, env).flatten,
                          Seq.fill(contents.size)(Map.empty[String, String]),
                          Seq.fill(contents.size)(null: String))
                      else {
                        val rs = contents.zip(metas).flatMap { case (c, m) =>
                          val (out, om) = Interp.runWithMeta(prog, c, m, env)
                          out.map(o => (o, om))
                        }
                        (rs.map(_._1), rs.map(_._2), Seq.fill(rs.size)(null: String))
                      }
                    val outs =
                      if (!pipe.unarchive) mapped
                      else mapped.flatMap { out =>
                        Interp.parseJsonTyped(out) match {
                          case a: Vector[Any @unchecked] => a.map(Interp.marshal)
                          case v => Seq(Interp.marshal(v))
                        }
                      }
                    val ok = outs.size == expected.size && outs.zip(expected).zipWithIndex.forall {
                      case ((got, exp), i) =>
                        val contentOk =
                          if (exp.containsKey("content_equals"))
                            got.stripSuffix("\n") == exp.get("content_equals").toString.stripSuffix("\n")
                          else if (exp.containsKey("file_equals")) {
                            val want = java.nio.file.Files.readString(new java.io.File(
                              f.getParentFile, exp.get("file_equals").toString).toPath)
                            got.stripSuffix("\n") == want.stripSuffix("\n")
                          } else if (exp.containsKey("json_equals")) {
                            val wantJson = exp.get("json_equals") match {
                              case s: String => s
                              case o => new com.fasterxml.jackson.databind.ObjectMapper()
                                .writeValueAsString(o)
                            }
                            jsonEq(got, wantJson)
                          } else if (exp.containsKey("json_contains")) {
                            val wantJson = new com.fasterxml.jackson.databind.ObjectMapper()
                              .writeValueAsString(exp.get("json_contains"))
                            jsonContains(Interp.parseJsonTyped(got),
                              Interp.parseJsonTyped(wantJson))
                          } else true
                        val metaOk = Option(exp.get("metadata_equals")).forall { me =>
                          me.asInstanceOf[java.util.Map[String, Any]].asScala.forall {
                            case (k, want) =>
                              outMetas.lift(i).flatMap(_.get(k)).exists { gv =>
                                want match {
                                  case s: String => gv == s
                                  case o => jsonEq(gv,
                                    new com.fasterxml.jackson.databind.ObjectMapper()
                                      .writeValueAsString(o))
                                }
                              }
                          }
                        }
                        val blobOk = Option(exp.get("bloblang")).forall { bsrc =>
                          try {
                            val e = Bloblang.parseExpr(String.valueOf(bsrc))
                            val parsedContent: () => Any = {
                              lazy val v = try Interp.parseJsonTyped(got) catch { case _: Exception => null }
                              () => v
                            }
                            Interp.eval(e, Interp.Ctx(parsedContent, got,
                              scala.collection.mutable.Map.empty,
                              outMetas.lift(i).getOrElse(Map.empty), env, Map.empty,
                              Bloblang.VNothing,
                              errorMsg = outErrs.lift(i).orNull)) == true
                          } catch { case _: Exception => false }
                        }
                        contentOk && metaOk && blobOk
                    }
                    if (ok) passed += expected.size // count message-level assertions
                    else { failed += 1; failures += s"$name: got=${outs.mkString(" | ")}" }
                  } catch {
                    case e: Exception => failed += 1; failures += s"$name: ${e.getMessage}"
                  }
                }
            }
          }
        case _ => ()
      }
    }
    (passed, failed, skipped, failures.result(), skips.result())
  }

  test("reference bloblang golden corpus: >= 55 cases pass verbatim, none fail, none skip") {
    val (passed, failed, skipped, failures, skips) = runCorpus()
    info(s"golden corpus: passed=$passed failed=$failed skipped=$skipped")
    skips.foreach(n => info(s"SKIP $n"))
    failures.foreach(f => info(s"FAIL $f"))
    assert(failed == 0, s"failures:\n${failures.mkString("\n")}")
    // Pinned: a parser regression must not silently reroute cases to the
    // skip path and stay green.
    assert(skipped == 0, s"skipped golden cases:\n${skips.mkString("\n")}")
    assert(passed >= 55, s"only $passed golden cases passed")
  }

  test("compiled-subset coverage: golden mappings that compile fully to Columns") {
    runCorpus() // (re)populate collectedCases — independent of test order
    val cases = collectedCases.toVector
    assert(cases.nonEmpty, "no mapping cases collected from the corpus")
    var full = 0
    val fallback = Vector.newBuilder[String]
    for ((name, prog, contents, env, metas) <- cases) {
      val docs = try contents.map(Interp.parseJsonTyped)
        catch { case _: Exception => Nil }
      // JSON contents compile against the inferred document schema; raw
      // string contents against the scalar schema (the same dispatch the
      // config frontend uses: json_documents vs lines inputs). Input
      // metadata rides the compiled meta transport, so the schema the
      // mapping compiles against carries one __meta_ column per key the
      // case declares — meta() reads resolve truthfully.
      val metaFields = metas.flatMap(_.keys).distinct.sorted.map(k =>
        org.apache.spark.sql.types.StructField(
          graft.blob.Compile.MetaPrefix + k, org.apache.spark.sql.types.StringType))
      val compiles =
        if (docs.nonEmpty)
          graft.blob.Compile.inferSchema(docs).exists(sc =>
            graft.blob.Compile.tryCompile(prog,
              org.apache.spark.sql.types.StructType(sc.fields ++ metaFields), env).isDefined)
        else
          graft.blob.Compile.tryCompile(prog, graft.blob.Compile.ScalarSchema, env).isDefined
      if (compiles) full += 1 else fallback += name
    }
    info(s"compile coverage: $full/${cases.size} golden mappings compile fully; " +
      s"${cases.size - full} use the interpreter fallback")
    fallback.result().foreach(n => info(s"FALLBACK $n"))
    // Measured baseline at round 5 — a compiler regression (a construct
    // silently dropping out of the subset) must fail loudly here.
    assert(full >= CompiledBaseline,
      s"only $full golden mappings compile; baseline is $CompiledBaseline")
  }
  // Measured round 6: 28/33 golden mappings compile fully — the round-5
  // subset (field mappings, env() filters, lambda chains incl.
  // cities.blobl, content() rewrites, the format twin, structured
  // metadata, fragment envelopes: literals/fans/message_expansion/
  // github_releases, cookbook match-as-filter) plus the round-6
  // additions: the generalized `match` compile (predicate arms with
  // case-context rebinding, optional target, static type()-pruning),
  // the deletable-element channel (deleted()/nothing()/no-match arms
  // inside map_each), enumerated/number(default)/sum/keys, digit-index
  // array access (`this.0`), and the key_values static-sequence chain —
  // which close csv.yaml (both cases) and csv_formatter's Consistent
  // objects; plus named-map `apply` inlining (typed recursion, depth-
  // capped), object map_each in {key,value} entry context, and a native
  // Catalyst `unescape_html` expression (functions/Exprs.scala) — which
  // close walk_json's object cases. The remaining 5: walk_json "Just a
  // string" (scalar `this.or(content())` = per-row parse semantics) and
  // its mixed string+number arrays (no SQL type), csv_formatter Empty
  // (error-message parity — `this.0` on [] must raise the reference's
  // exact wording), windowed.yaml (batch functions are batch-order-
  // dependent; the batch runner owns them) — deliberate interpreter
  // territory.
  private val CompiledBaseline = 28
}
