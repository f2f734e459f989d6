package graft.blob

import Bloblang._
import Interp._
import scala.collection.immutable.VectorMap

/** Bloblang method library for the text frontend (reference registry:
  * internal/bloblang/query/methods*.go; each method cites its source).
  * Static-DSL pipelines use [[graft.functions.Blob]] instead — this
  * library backs interpreted mappings only.
  */
object Methods {

  private def err(msg: String): Nothing = throw new BlobError(msg)

  /** Evaluate a higher-order argument against one element: named lambda
    * binds the parameter; a bare query rebinds `this` (reference method
    * context semantics, query/methods_structured.go:913). */
  private def applyFn(arg: Expr, elem: Any, ctx: Ctx): Any = arg match {
    case Lambda(p, body) =>
      val saved = ctx.vars.get(p)
      ctx.vars(p) = elem
      try Interp.eval(body, ctx.copy(self = () => elem))
      finally { saved match { case Some(v) => ctx.vars(p) = v; case None => ctx.vars.remove(p) } }
    case e => Interp.eval(e, ctx.copy(self = () => elem))
  }

  private def batchMetaAt(ctx: Ctx, i: Int): Map[String, String] =
    if (ctx.batchMeta ne null) ctx.batchMeta(i) else ctx.meta

  private def asBool(v: Any): Boolean = v match {
    case b: Boolean => b
    case other => err(s"expected bool from query, got ${typeName(other)}")
  }

  private def entry(k: String, v: Any): VectorMap[String, Any] =
    VectorMap("key" -> k, "value" -> v)

  /** merge/assign collision rules (methods.md `merge`/`assign`): objects
    * deep-merge; non-object collisions either overwrite (assign) or
    * combine into arrays with array operands expanded (merge). */
  private def deepMerge(a: VectorMap[String, Any], b: VectorMap[String, Any],
                        overwrite: Boolean): VectorMap[String, Any] =
    b.foldLeft(a) { case (acc, (k, v)) =>
      acc.updated(k, acc.get(k) match {
        case None => v
        case Some(ex) => (ex, v) match {
          case (me: VectorMap[String @unchecked, Any @unchecked],
                mv: VectorMap[String @unchecked, Any @unchecked]) =>
            deepMerge(me, mv, overwrite)
          case _ if overwrite => v
          case (ea: Vector[Any @unchecked], va: Vector[Any @unchecked]) => ea ++ va
          case (ea: Vector[Any @unchecked], x) => ea :+ x
          case (x, va: Vector[Any @unchecked]) => x +: va
          case (x, y) => Vector(x, y)
        }
      })
    }

  def call(targetE: Expr, name: String, args: Vector[Expr], ctx: Ctx): Any = name match {
    // error-channel methods control target evaluation (methods.go:148,807)
    case "catch" =>
      try Interp.eval(targetE, ctx)
      catch { case e: BlobError => applyFn(args(0), e.msg, ctx) }
    case "or" =>
      try {
        Interp.eval(targetE, ctx) match {
          case null | VNothing => Interp.eval(args(0), ctx)
          case v => v
        }
      } catch { case _: BlobError => Interp.eval(args(0), ctx) }
    case "exists" =>
      val path = Interp.eval(args(0), ctx).toString
      try {
        val v = path.split('.').foldLeft(Interp.eval(targetE, ctx)) {
          case (m: VectorMap[String @unchecked, Any @unchecked], seg) => m.getOrElse(seg, return false)
          case (null, _) => return false
          case _ => return false
        }
        v != null
      } catch { case _: BlobError => false }
    // batch-positional methods re-evaluate the target query against other
    // batch members (functions.go:186-229, methods.go:187-229)
    case "from_all" =>
      ctx.batch.zipWithIndex.map { case (b, i) =>
        Interp.eval(targetE, ctx.copy(self = b, meta = batchMetaAt(ctx, i)))
      }
    case "from" =>
      val i = Interp.toLong(Interp.eval(args(0), ctx))
      if (i < 0 || i >= ctx.batch.length) err(s"from($i): batch size ${ctx.batch.length}")
      Interp.eval(targetE, ctx.copy(self = ctx.batch(i.toInt), meta = batchMetaAt(ctx, i.toInt)))
    case _ =>
      val t = Interp.eval(targetE, ctx)
      try dispatch(t, targetE, name, args, ctx)
      catch {
        case e: BlobError => throw e
        case scala.util.control.NonFatal(e) =>
          err(s"$name: ${e.getMessage}") // JDK exceptions become catchable blob errors
      }
  }

  /** Render an expression's provenance the way the reference does in
    * type errors ("from field `this.0`"). */
  private def exprDesc(e: Expr): String = e match {
    case This => "`this`"
    case Field(t, n) =>
      def path(x: Expr): Option[String] = x match {
        case This => Some("this")
        case Field(t2, n2) => path(t2).map(p => s"$p.$n2")
        case _ => None
      }
      path(Field(t, n)).map(p => s"field `$p`").getOrElse(s"field `$n`")
    case _ => "expression"
  }

  private def dispatch(t: Any, targetE: Expr, name: String, args: Vector[Expr], ctx: Ctx): Any = {
    def arg(i: Int): Any = Interp.eval(args(i), ctx)
    def argStr(i: Int): String = toStr(arg(i))
    def argLong(i: Int): Long = toLong(arg(i))

    name match {
      // ===== general / coercion (methods.go) =================================
      case "apply" =>
        val mapName = argStr(0)
        val stmts = ctx.maps.getOrElse(mapName, err(s"unknown map $mapName"))
        val sub = ctx.copy(self = () => t, root = VNothing)
        stmts.foreach { s => Interp.execStmt(s, sub) }
        sub.root
      case "not_null" => if (t == null) err("value is null") else t
      case "type" => typeName(t)
      case "string" => toStr(t)
      case "bytes" => VBytes(toStr(t).getBytes("UTF-8"))
      case "number" =>
        def parse(v: Any): Any = v match {
          case l: Long => l
          case d: Double => d
          case b: Boolean => if (b) 1L else 0L
          case s: String =>
            if (s.contains('.') || s.contains('e') || s.contains('E'))
              try s.toDouble catch { case _: Exception => err(s"not a number: $s") }
            else try s.toLong catch { case _: Exception =>
              try s.toDouble catch { case _: Exception => err(s"not a number: $s") } }
          case b: VBytes => parse(b.str)
          case other => err(s"cannot parse ${typeName(other)} as number")
        }
        if (args.isEmpty) parse(t)
        else try parse(t) catch { case _: BlobError => arg(0) } // optional default

      case "bool" => t match {
        case b: Boolean => b
        case s: String => s.toLowerCase match {
          case "true" | "t" | "1" => true
          case "false" | "f" | "0" => false
          case _ => err(s"not a bool: $s")
        }
        case l: Long => l != 0
        case d: Double => d != 0
        case other => err(s"cannot parse ${typeName(other)} as bool")
      }
      case "length" => t match {
        case s: String => s.length.toLong
        case b: VBytes => b.bytes.length.toLong
        case a: Vector[_] => a.length.toLong
        case m: VectorMap[_, _] => m.size.toLong
        case other => err(s"length of ${typeName(other)}")
      }
      case "get" =>
        argStr(0).split('.').foldLeft(t) {
          case (m: VectorMap[String @unchecked, Any @unchecked], seg) => m.getOrElse(seg, null)
          case (null, _) => null
          case (other, seg) => err(s"field `$seg` on ${typeName(other)}")
        }
      case "parse_json" => parseJsonTyped(toStr(t))
      case "format_json" => marshalJson(t)

      // ===== strings (methods_strings.go) ====================================
      case "uppercase" => toStr(t).toUpperCase
      case "lowercase" => toStr(t).toLowerCase
      case "capitalize" =>
        toStr(t).split("(?<= )").map(w =>
          if (w.nonEmpty && w.head.isLetter) w.head.toUpper + w.tail else w).mkString
      case "trim" =>
        if (args.isEmpty) toStr(t).trim
        else { val cut = argStr(0).toSet; toStr(t).dropWhile(cut).reverse.dropWhile(cut).reverse }
      case "trim_prefix" =>
        val s = toStr(t); val p = argStr(0)
        if (s.startsWith(p)) s.drop(p.length) else s
      case "trim_suffix" =>
        val s = toStr(t); val p = argStr(0)
        if (s.endsWith(p)) s.dropRight(p.length) else s
      case "has_prefix" => toStr(t).startsWith(argStr(0))
      case "has_suffix" => toStr(t).endsWith(argStr(0))
      case "contains" => t match {
        case a: Vector[Any @unchecked] => val v = arg(0); a.exists(valueEq(_, v))
        case m: VectorMap[String @unchecked, Any @unchecked] =>
          val v = arg(0); m.values.exists(valueEq(_, v))
        case s => toStr(s).contains(argStr(0))
      }
      case "index_of" => toStr(t).indexOf(argStr(0)).toLong
      case "slice" => t match {
        case a: Vector[Any @unchecked] => sliceSeq(a, argLong(0), if (args.size > 1) Some(argLong(1)) else None)
        case s =>
          val cs = toStr(s)
          sliceSeq(cs.toVector, argLong(0), if (args.size > 1) Some(argLong(1)) else None)
            .asInstanceOf[Vector[Char]].mkString
      }
      case "split" => Vector.from(toStr(t).split(java.util.regex.Pattern.quote(argStr(0)), -1))
      // `.split_by(q)` — segments between chars where the query holds
      // (Go strings.FieldsFunc semantics: empty segments dropped)
      case "split_by" =>
        val s = toStr(t)
        val out = Vector.newBuilder[Any]
        val sb = new StringBuilder
        s.foreach { c =>
          if (asBool(applyFn(args(0), c.toString, ctx))) {
            if (sb.nonEmpty) { out += sb.toString; sb.clear() }
          } else sb.append(c)
        }
        if (sb.nonEmpty) out += sb.toString
        out.result()
      // `.filepath_join()` / `.filepath_split()` — Go path/filepath
      // semantics with '/' (executors are Linux)
      case "filepath_join" =>
        seqOf(t).map(toStr).filter(_.nonEmpty).mkString("/")
          .replaceAll("/+", "/") match { case "" => "" case p => p }
      case "filepath_split" =>
        val s = toStr(t)
        val i = s.lastIndexOf('/')
        if (i < 0) Vector("", s) else Vector(s.substring(0, i + 1), s.substring(i + 1))
      // `.format_xml(indent?)` — impl/xml/bloblang.go:60-89: object keys
      // become tags; pretty-printed, 4-space indent by default
      case "format_xml" =>
        val indent = if (args.isEmpty) "    " else argStr(0)
        val sb = new StringBuilder
        def emit(tag: String, v: Any, depth: Int): Unit = {
          val pad = indent * depth
          v match {
            case m: VectorMap[String @unchecked, Any @unchecked] =>
              sb.append(pad).append('<').append(tag).append(">\n")
              m.foreach { case (k, mv) => emit(k, mv, depth + 1) }
              sb.append(pad).append("</").append(tag).append(">\n")
            case a: Vector[Any @unchecked] => // repeated sibling elements
              a.foreach(e => emit(tag, e, depth))
            case leaf =>
              sb.append(pad).append('<').append(tag).append('>')
                .append(toStr(leaf).replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;"))
                .append("</").append(tag).append(">\n")
          }
        }
        t match {
          case m: VectorMap[String @unchecked, Any @unchecked] =>
            m.foreach { case (k, v) => emit(k, v, 0) }
          case other => err(s"format_xml on ${typeName(other)}")
        }
        sb.toString.stripLineEnd
      // `.format_yaml()` — snakeyaml emit (reference format_yaml)
      case "format_yaml" =>
        def toJava(v: Any): Any = v match {
          case m: VectorMap[String @unchecked, Any @unchecked] =>
            val lm = new java.util.LinkedHashMap[String, Any]()
            m.foreach { case (k, mv) => lm.put(k, toJava(mv)) }
            lm
          case a: Vector[Any @unchecked] =>
            val l = new java.util.ArrayList[Any]()
            a.foreach(e => l.add(toJava(e)))
            l
          case other => other
        }
        val opts = new org.yaml.snakeyaml.DumperOptions()
        opts.setDefaultFlowStyle(org.yaml.snakeyaml.DumperOptions.FlowStyle.BLOCK)
        new org.yaml.snakeyaml.Yaml(opts).dump(toJava(t))
      case "join" => t match {
        case a: Vector[Any @unchecked] =>
          val sep = if (args.isEmpty) "" else argStr(0)
          a.map {
            case s: String => s
            case b: VBytes => b.str
            case other => err(s"join: expected string elements, got ${typeName(other)}")
          }.mkString(sep)
        case other => err(s"join on ${typeName(other)}")
      }
      case "replace_all" => toStr(t).replace(argStr(0), argStr(1))
      case "replace_all_many" => arg(0) match {
        case a: Vector[Any @unchecked] =>
          if (a.length % 2 != 0)
            err(s"replace_all_many: expected an even number of arguments, got ${a.length}")
          a.grouped(2).foldLeft(toStr(t)) {
            case (acc, Vector(f, to)) => acc.replace(toStr(f), toStr(to))
            case (acc, _) => acc
          }
        case _ => err("replace_all_many expects an array")
      }
      case "re_match" => argStr(0).r.findFirstIn(toStr(t)).isDefined
      case "re_find_all" => Vector.from(argStr(0).r.findAllIn(toStr(t)).toSeq)
      case "re_replace_all" => toStr(t).replaceAll(argStr(0), argStr(1))
      case "re_find_all_submatch" =>
        Vector.from(argStr(0).r.findAllMatchIn(toStr(t)).map(m =>
          Vector.tabulate(m.groupCount + 1)(g => Option(m.group(g)).getOrElse(""): Any)).toSeq)
      case "format" =>
        // Go fmt verbs: %v = default-format any value → Java %s
        val jfmt = toStr(t).replace("%%", "\u0000")
          .replace("%v", "%s").replace("\u0000", "%%")
        // Doubles render Go-style (fmt.Sprintf("%v", 2.0) is "2", not
        // "2.0"), keeping this path byte-identical to the compiled twin
        // (Compile.scala "format", which concats via toStrCol).
        String.format(jfmt, args.map(a => Interp.eval(a, ctx) match {
          case l: Long => java.lang.Long.valueOf(l)
          case d: Double => Interp.fmtDouble(d)
          case b: Boolean => java.lang.Boolean.valueOf(b)
          case s => toStr(s)
        }): _*)
      case "repeat" => toStr(t) * argLong(0).toInt
      case "reverse" => t match {
        case a: Vector[Any @unchecked] => a.reverse
        case s => toStr(s).reverse
      }
      case "quote" => marshalJson(toStr(t))
      case "unquote" => parseJsonTyped(toStr(t)) match {
        case s: String => s
        case other => err(s"unquote: ${typeName(other)}")
      }
      case "escape_html" =>
        toStr(t).replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
          .replace("\"", "&#34;").replace("'", "&#39;")
      case "unescape_html" => unescapeHtml(toStr(t))
      case "escape_url_query" => java.net.URLEncoder.encode(toStr(t), "UTF-8")
      case "unescape_url_query" => java.net.URLDecoder.decode(toStr(t), "UTF-8")
      case "strip_html" => graft.functions.Udfs.stripHtml(toStr(t))
      case "slug" => graft.functions.Udfs.slug(toStr(t))
      case "parse_duration" =>
        Option(graft.functions.Udfs.parseDuration(toStr(t))).map(_.longValue())
          .getOrElse(err(s"bad duration ${toStr(t)}"))
      case "encode" => argStr(0) match {
        case "base64" => java.util.Base64.getEncoder.encodeToString(rawBytes(t))
        case "base64url" => java.util.Base64.getUrlEncoder.encodeToString(rawBytes(t))
        case "hex" => rawBytes(t).map("%02x".format(_)).mkString
        case "ascii85" => graft.functions.Codecs.ascii85Encode(rawBytes(t))
        case "z85" => graft.functions.Codecs.z85Encode(rawBytes(t))
        case s => err(s"unknown encoding $s")
      }
      case "decode" => argStr(0) match {
        case "base64" => VBytes(java.util.Base64.getDecoder.decode(toStr(t)))
        case "base64url" => VBytes(java.util.Base64.getUrlDecoder.decode(toStr(t)))
        case "hex" => VBytes(toStr(t).grouped(2).map(Integer.parseInt(_, 16).toByte).toArray)
        case "ascii85" => VBytes(graft.functions.Codecs.ascii85Decode(toStr(t)))
        case "z85" => VBytes(graft.functions.Codecs.z85Decode(toStr(t)))
        case s => err(s"unknown encoding $s")
      }
      // full reference codec set (algorithms.go): pgzip is gzip's wire
      // format behind a parallel encoder — one codec here
      case "compress" => argStr(0) match {
        case "gzip" | "pgzip" => VBytes(graft.functions.Udfs.gzipCompress(rawBytes(t)))
        case "zstd" => VBytes(graft.functions.Codecs.zstdCompress(rawBytes(t)))
        case "lz4" => VBytes(graft.functions.Codecs.lz4Compress(rawBytes(t)))
        case "snappy" => VBytes(graft.functions.Codecs.snappyCompress(rawBytes(t)))
        case "flate" => VBytes(graft.functions.Codecs.flateCompress(rawBytes(t)))
        case "zlib" => VBytes(graft.functions.Codecs.zlibCompress(rawBytes(t)))
        case "bzip2" => VBytes(graft.functions.Codecs.bzip2Compress(rawBytes(t)))
        case s => err(s"unknown compression $s")
      }
      case "decompress" => argStr(0) match {
        case "gzip" | "pgzip" => VBytes(graft.functions.Udfs.gzipDecompress(rawBytes(t)))
        case "zstd" => VBytes(graft.functions.Codecs.zstdDecompress(rawBytes(t)))
        case "lz4" => VBytes(graft.functions.Codecs.lz4Decompress(rawBytes(t)))
        case "snappy" => VBytes(graft.functions.Codecs.snappyDecompress(rawBytes(t)))
        case "flate" => VBytes(graft.functions.Codecs.flateDecompress(rawBytes(t)))
        case "zlib" => VBytes(graft.functions.Codecs.zlibDecompress(rawBytes(t)))
        case "bzip2" => VBytes(graft.functions.Codecs.bzip2Decompress(rawBytes(t)))
        case s => err(s"unknown compression $s")
      }
      case "parse_yaml" => parseJsonTyped(graft.functions.Codecs.yamlToJson(toStr(t)))
      // whole parquet file as bytes -> array of row objects
      // (impl/parquet/bloblang.go:25-57)
      case "parse_parquet" => graft.functions.ParquetCodec.decodeValues(rawBytes(t))
      case "parse_msgpack" => parseJsonTyped(graft.functions.Codecs.msgpackToJson(rawBytes(t)))
      case "format_msgpack" => VBytes(graft.functions.Codecs.jsonToMsgpack(marshalJson(t)))
      case "hash" =>
        val alg = argStr(0) match {
          case "md5" => "MD5"; case "sha1" => "SHA-1"
          case "sha256" => "SHA-256"; case "sha512" => "SHA-512"
          case s => err(s"unknown hash $s")
        }
        VBytes(java.security.MessageDigest.getInstance(alg).digest(rawBytes(t)))
      // password compares (impl/crypto/bcrypt.go:25, argon2.go): target is
      // the plaintext, the arg is the hashed secret
      case "compare_bcrypt" => graft.functions.Bcrypt.check(toStr(t), argStr(0))
      case "compare_argon2" => graft.functions.Argon2.check(toStr(t), argStr(0))

      // ===== numbers (methods_numbers.go, bloblang_numbers.go) ===============
      case "abs" => t match { case l: Long => math.abs(l); case v => math.abs(toNum(v)) }
      case "ceil" => ceilFloor(t, math.ceil)
      case "floor" => ceilFloor(t, math.floor)
      case "round" => t match {
        case l: Long => l
        case v => math.round(toNum(v))
      }
      case "sqrt" => math.sqrt(toNum(t))
      case "log" => math.log(toNum(t))
      case "log10" => math.log10(toNum(t))
      case "sin" => math.sin(toNum(t))
      case "cos" => math.cos(toNum(t))
      case "tan" => math.tan(toNum(t))
      case "pow" => math.pow(toNum(t), toNum(arg(0)))
      case "int64" => toLong(t)
      case "float64" => toNum(t)
      // sized integer casts (methods.md int8…uint64): range-checked, carried
      // as Long (the interpreter's integer repr); overflow is a blob error
      case "int8" | "int16" | "int32" | "uint8" | "uint16" | "uint32" | "uint64" =>
        val v = toLong(t)
        val ok = name match {
          case "int8" => v >= Byte.MinValue && v <= Byte.MaxValue
          case "int16" => v >= Short.MinValue && v <= Short.MaxValue
          case "int32" => v >= Int.MinValue && v <= Int.MaxValue
          case "uint8" => v >= 0 && v <= 255
          case "uint16" => v >= 0 && v <= 65535
          case "uint32" => v >= 0 && v <= 0xFFFFFFFFL
          case "uint64" => v >= 0 // > Long.MaxValue unrepresentable here
        }
        if (!ok) err(s"$name: value $v out of range") else v
      case "float32" => toNum(t).toFloat.toDouble // value snapped to f32 precision
      case "max" => reduceNum(t, math.max)
      case "min" => reduceNum(t, math.min)
      case "sum" => t match {
        case a: Vector[Any @unchecked] =>
          if (a.forall(_.isInstanceOf[Long])) a.map(_.asInstanceOf[Long]).sum
          else a.map(toNum).sum
        case other => err(s"sum on ${typeName(other)}")
      }

      // ===== arrays / objects (methods_structured.go) ========================
      case "all" => seqOf(t).forall(e => asBool(applyFn(args(0), e, ctx)))
      case "any" => seqOf(t).exists(e => asBool(applyFn(args(0), e, ctx)))
      case "append" => seqOf(t) ++ args.map(Interp.eval(_, ctx))
      case "enumerated" =>
        seqOf(t).zipWithIndex.map { case (v, i) =>
          VectorMap[String, Any]("index" -> i.toLong, "value" -> v) }
      case "filter" => t match {
        case a: Vector[Any @unchecked] => a.filter(e => asBool(applyFn(args(0), e, ctx)))
        case m: VectorMap[String @unchecked, Any @unchecked] =>
          m.filter { case (k, v) => asBool(applyFn(args(0), entry(k, v), ctx)) }
        case other => err(s"filter on ${typeName(other)}")
      }
      case "flatten" =>
        seqOf(t).flatMap {
          case a: Vector[Any @unchecked] => a
          case v => Vector(v)
        }
      case "fold" =>
        seqOf(t).foldLeft(arg(0)) { (acc, v) =>
          applyFn(args(1), VectorMap[String, Any]("tally" -> acc, "value" -> v), ctx)
        }
      case "index" =>
        val a = seqOf(t); val i = argLong(0)
        val j = if (i < 0) a.length + i else i
        if (j >= 0 && j < a.length) a(j.toInt) else err(s"index $i out of bounds")
      case "keys" => t match {
        case m: VectorMap[String @unchecked, _] => Vector.from(m.keys)
        // reference type-error wording (query/errors.go): value kind +
        // provenance of the target expression
        case other => err(s"expected object value, got ${typeName(other)} from ${exprDesc(targetE)}")
      }
      case "values" => t match {
        case m: VectorMap[String @unchecked, Any @unchecked] => Vector.from(m.values)
        case other => err(s"values on ${typeName(other)}")
      }
      case "key_values" => t match {
        case m: VectorMap[String @unchecked, Any @unchecked] =>
          Vector.from(m.map { case (k, v) => entry(k, v) })
        case other => err(s"key_values on ${typeName(other)}")
      }
      case "map_each" => t match {
        case a: Vector[Any @unchecked] =>
          a.map(e => applyFn(args(0), e, ctx)).filter(v => v != VDelete && v != VNothing)
        case m: VectorMap[String @unchecked, Any @unchecked] =>
          m.foldLeft(VectorMap.empty[String, Any]) { case (acc, (k, v)) =>
            applyFn(args(0), entry(k, v), ctx) match {
              case VDelete | VNothing => acc
              case nv => acc.updated(k, nv)
            }
          }
        case other => err(s"map_each on ${typeName(other)}")
      }
      case "map_each_key" => t match {
        case m: VectorMap[String @unchecked, Any @unchecked] =>
          m.foldLeft(VectorMap.empty[String, Any]) { case (acc, (k, v)) =>
            acc.updated(toStr(applyFn(args(0), k, ctx)), v)
          }
        case other => err(s"map_each_key on ${typeName(other)}")
      }
      // `.merge()` collides non-object keys into arrays (arrays expand);
      // `.assign()` overwrites on collision — methods.md, query/
      // methods_structured.go merge/assign specs. Objects deep-merge in both.
      case "merge" => (t, arg(0)) match {
        case (a: VectorMap[String @unchecked, Any @unchecked], b: VectorMap[String @unchecked, Any @unchecked]) =>
          deepMerge(a, b, overwrite = false)
        case (a, b) => err(s"merge ${typeName(a)} with ${typeName(b)}")
      }
      case "assign" => (t, arg(0)) match {
        case (a: VectorMap[String @unchecked, Any @unchecked], b: VectorMap[String @unchecked, Any @unchecked]) =>
          deepMerge(a, b, overwrite = true)
        case (a, b) => err(s"assign ${typeName(a)} with ${typeName(b)}")
      }
      case "not_empty" => t match {
        case s: String if s.nonEmpty => s
        case a: Vector[_] if a.nonEmpty => a
        case m: VectorMap[_, _] if m.nonEmpty => m
        case _ => err("value is empty")
      }
      case "sort" =>
        if (args.isEmpty) seqOf(t).sortWith((a, b) => cmpVals(a, b) < 0)
        else seqOf(t).sortWith { (a, b) =>
          asBool(applyFn(args(0), VectorMap[String, Any]("left" -> a, "right" -> b), ctx))
        }
      case "sort_by" =>
        seqOf(t).sortWith((a, b) =>
          cmpVals(applyFn(args(0), a, ctx), applyFn(args(0), b, ctx)) < 0)
      case "unique" =>
        val seen = scala.collection.mutable.LinkedHashSet.empty[String]
        seqOf(t).filter(v => seen.add(marshalJson(v)))
      case "without" => t match {
        case m: VectorMap[String @unchecked, Any @unchecked] =>
          val ks = args.map(a => toStr(Interp.eval(a, ctx))).toSet
          m.filter { case (k, _) => !ks.contains(k) }
        case other => err(s"without on ${typeName(other)}")
      }
      case "zip" => (t, arg(0)) match {
        case (a: Vector[Any @unchecked], b: Vector[Any @unchecked]) =>
          a.zip(b).map { case (x, y) => Vector(x, y) }
        case _ => err("zip expects arrays")
      }
      case "concat" => seqOf(t) ++ args.flatMap(a => seqOf(Interp.eval(a, ctx)))

      // `.find` / `.find_all` / `.find_by` / `.find_all_by` — index search
      // with type-agnostic numeric equality (methods.md find*)
      case "find" =>
        val v = arg(0); seqOf(t).indexWhere(valueEq(_, v)).toLong
      case "find_all" =>
        val v = arg(0)
        seqOf(t).zipWithIndex.collect { case (e, i) if valueEq(e, v) => i.toLong }
      case "find_by" =>
        seqOf(t).indexWhere(e => asBool(applyFn(args(0), e, ctx))).toLong
      case "find_all_by" =>
        seqOf(t).zipWithIndex.collect {
          case (e, i) if asBool(applyFn(args(0), e, ctx)) => i.toLong
        }
      // `.array()` — wrap unless already an array
      case "array" => t match {
        case a: Vector[_] => a
        case other => Vector(other)
      }
      // `.explode(path)` — methods.md explode: array → array of docs each
      // holding one element; object → object of docs keyed like the target
      case "explode" =>
        val path = argStr(0).split('.').toList
        def getAt(v: Any, p: List[String]): Any = p match {
          case Nil => v
          case h :: rest => v match {
            case m: VectorMap[String @unchecked, Any @unchecked] =>
              getAt(m.getOrElse(h, err(s"explode: path $h not found")), rest)
            case other => err(s"explode: ${typeName(other)} at $h")
          }
        }
        def setAt(v: Any, p: List[String], nv: Any): Any = p match {
          case Nil => nv
          case h :: rest => v match {
            case m: VectorMap[String @unchecked, Any @unchecked] =>
              m.updated(h, setAt(m(h), rest, nv))
            case other => err(s"explode: ${typeName(other)} at $h")
          }
        }
        getAt(t, path) match {
          case a: Vector[Any @unchecked] => a.map(e => setAt(t, path, e))
          case m: VectorMap[String @unchecked, Any @unchecked] =>
            m.map { case (k, v) => k -> setAt(t, path, v) }
          case other => err(s"explode: target is ${typeName(other)}")
        }

      // `.collapse()` — methods_structured.go:145: tree → flat dot-path map
      case "collapse" =>
        def walk(prefix: String, v: Any, acc: scala.collection.mutable.Builder[(String, Any), Vector[(String, Any)]]): Unit = v match {
          case m: VectorMap[String @unchecked, Any @unchecked] if m.nonEmpty =>
            m.foreach { case (k, mv) => walk(if (prefix.isEmpty) k else s"$prefix.$k", mv, acc) }
          case a: Vector[Any @unchecked] if a.nonEmpty =>
            a.zipWithIndex.foreach { case (mv, i) => walk(s"$prefix.$i", mv, acc) }
          case leaf => acc += (prefix -> leaf)
        }
        val b = Vector.newBuilder[(String, Any)]
        walk("", t, b)
        VectorMap.from(b.result())
      // `.squash()` — bloblang_objects.go:15: merge an array of objects
      // with `.merge()` collision rules (values collide into arrays)
      case "squash" =>
        seqOf(t).foldLeft(VectorMap.empty[String, Any]) {
          case (acc, m: VectorMap[String @unchecked, Any @unchecked]) =>
            deepMerge(acc, m, overwrite = false)
          case (_, other) => err(s"squash: expected objects, got ${typeName(other)}")
        }
      // `.with(paths...)` — bloblang_objects.go:39: keep only listed keys
      case "with" => t match {
        case m: VectorMap[String @unchecked, Any @unchecked] =>
          val ks = args.map(a => toStr(Interp.eval(a, ctx)))
          ks.foldLeft(VectorMap.empty[String, Any]) { (acc, k) =>
            m.get(k).fold(acc)(acc.updated(k, _))
          }
        case other => err(s"with on ${typeName(other)}")
      }

      // `.json_path("$.a.b[0]")` — impl/jsonpath/bloblang_jsonpath.go:18
      case "json_path" =>
        val segs = argStr(0).stripPrefix("$").split("[.\\[]").filter(_.nonEmpty)
        segs.foldLeft(t) {
          case (m: VectorMap[String @unchecked, Any @unchecked], seg) => m.getOrElse(seg, null)
          case (a: Vector[Any @unchecked], seg) if seg.endsWith("]") =>
            val i = seg.stripSuffix("]").toInt
            if (i >= 0 && i < a.length) a(i) else null
          case (null, _) => null
          case (other, seg) => err(s"json_path: `$seg` on ${typeName(other)}")
        }

      // `.diff(old)` / `.patch(ops)` — impl/changelog/bloblang.go:18,50
      // (RFC-6902 style add/remove/replace; old.patch(new.diff(old)) == new)
      case "diff" => Vector.from(jsonDiff(arg(0), t, ""))
      case "patch" => seqOf(arg(0)).foldLeft(t) { (acc, op) =>
        op match {
          case m: VectorMap[String @unchecked, Any @unchecked] =>
            val path = toStr(m("path")).split('/').filter(_.nonEmpty).toList
            toStr(m("op")) match {
              case "remove" => jsonPatchApply(acc, path, None)
              case "add" | "replace" => jsonPatchApply(acc, path, Some(m.getOrElse("value", null)))
              case o => err(s"patch: unknown op $o")
            }
          case other => err(s"patch: expected op objects, got ${typeName(other)}")
        }
      }

      // ===== timestamps (bloblang_time.go; C-format translation shared
      // with the Column DSL) ==================================================
      case "ts_parse" | "parse_timestamp" => parseTs(toStr(t), argStr(0))
      case "ts_strptime" => parseTs(toStr(t), cToJava(argStr(0)))
      case "ts_format" | "format_timestamp" => formatTs(t, argStr(0))
      case "ts_strftime" => formatTs(t, cToJava(argStr(0)))
      case "ts_unix" => tsEpochMicros(t) / 1000000L
      case "ts_unix_milli" => tsEpochMicros(t) / 1000L
      case "ts_unix_micro" => tsEpochMicros(t)
      // µs is the engine's native precision (Spark TimestampType); the
      // nano variant scales it — sub-µs digits are zero by construction
      case "ts_unix_nano" => tsEpochMicros(t) * 1000L

      // long-form timestamp aliases (methods.md)
      case "parse_timestamp_strptime" => parseTs(toStr(t), cToJava(argStr(0)))
      case "format_timestamp_strftime" => formatTs(t, cToJava(argStr(0)))
      case "format_timestamp_unix" => tsEpochMicros(t) / 1000000L
      case "format_timestamp_unix_milli" => tsEpochMicros(t) / 1000L
      case "format_timestamp_unix_micro" => tsEpochMicros(t)
      case "format_timestamp_unix_nano" => tsEpochMicros(t) * 1000L

      // `.set(path, value)` — methods.md `set`: dot-path write with array
      // indices; writing deleted() removes the field
      case "set" =>
        val v = arg(1)
        def write(cur: Any, path: List[String]): Any = path match {
          case Nil => v
          case seg :: rest =>
            cur match {
              case l: Vector[Any @unchecked] =>
                val i = try seg.toInt catch {
                  case _: NumberFormatException => err(s"set: non-numeric index '$seg' into array")
                }
                if (i < 0 || i >= l.length) err(s"set: index $i out of bounds")
                else if (rest.isEmpty && v == VDelete) l.patch(i, Nil, 1)
                else l.updated(i, write(l(i), rest))
              case m: VectorMap[String @unchecked, Any @unchecked] =>
                if (rest.isEmpty && v == VDelete) m - seg
                else write(m.getOrElse(seg, null), rest) match {
                  case VDelete => m - seg
                  case w => m.updated(seg, w)
                }
              case null | VNothing =>
                if (rest.isEmpty && v == VDelete) VectorMap.empty[String, Any]
                else VectorMap.empty[String, Any].updated(seg, write(null, rest))
              case other => err(s"set: cannot descend into ${typeName(other)}")
            }
        }
        write(t, toStr(arg(0)).split('.').toList.filter(_.nonEmpty))

      // `.parse_csv(parse_header_row?, delimiter?, lazy_quotes?)`
      // (methods_strings.go:1008): RFC-4180 quoting; header row → objects
      case "parse_csv" =>
        val header = if (args.isEmpty) true else arg(0) match {
          case b: Boolean => b
          case other => err(s"parse_csv: expected bool, got ${typeName(other)}")
        }
        val delim = if (args.length > 1) argStr(1).headOption.getOrElse(',') else ','
        val rows = parseCsvRows(toStr(t), delim)
        if (rows.isEmpty) Vector.empty[Any]
        else if (header) {
          val hs = rows.head
          rows.tail.map { r =>
            if (r.length != hs.length)
              err(s"parse_csv: row has ${r.length} values, header has ${hs.length}")
            VectorMap.from(hs.zip(r))
          }
        } else rows.map(r => r: Any)

      // `.parse_xml()` — impl/xml/bloblang.go:13: attributes become "-k"
      // keys, text "#text" when mixed with attrs/children, repeats → arrays
      case "parse_xml" => parseXmlValue(toStr(t))

      // JWT methods (impl/crypto/jwt_sign.go:76, jwt_parse.go:80): sign on
      // the claims object, parse verifies and returns the claims object
      case jwt if jwt.startsWith("sign_jwt_") || jwt.startsWith("parse_jwt_") =>
        val alg = jwt.substring(jwt.lastIndexOf('_') + 1).toUpperCase
        val key = argStr(0)
        if (jwt.startsWith("sign_jwt_")) {
          val claims = marshalJson(t)
          if (alg.startsWith("HS")) graft.functions.Crypto.signJwtHs(alg)(claims, key)
          else graft.functions.Crypto.signJwtPk(alg)(claims, key)
        } else {
          val parsed =
            if (alg.startsWith("HS")) graft.functions.Crypto.parseJwtHs(alg)(toStr(t), key)
            else graft.functions.Crypto.parseJwtPk(alg)(toStr(t), key)
          if (parsed == null) err(s"$jwt: failed to verify token") else parseJsonTyped(parsed)
        }

      // remaining ts_* family (bloblang_time.go)
      case "ts_sub" => // difference t1 - t2 in NANOSECONDS (doc contract)
        (tsEpochMicros(t) - tsEpochMicros(arg(0))) * 1000L
      case "ts_round" => // round to nearest multiple of the ns duration, half up
        val ns = argLong(0)
        if (ns <= 0) err("ts_round: duration must be positive")
        val du = math.max(1L, ns / 1000L) // engine precision is µs
        val m = tsEpochMicros(t)
        val rounded = Math.floorDiv(m + du / 2, du) * du
        java.time.format.DateTimeFormatter.ISO_INSTANT.format(
          java.time.Instant.ofEpochSecond(Math.floorDiv(rounded, 1000000L),
            Math.floorMod(rounded, 1000000L) * 1000L))
      case "ts_tz" =>
        val zone = try java.time.ZoneId.of(argStr(0))
          catch { case e: Exception => err(s"ts_tz: ${e.getMessage}") }
        java.time.format.DateTimeFormatter.ISO_OFFSET_DATE_TIME.format(
          tsInstant(t).atZone(zone))
      case "ts_add_iso8601" | "ts_sub_iso8601" =>
        val neg = name == "ts_sub_iso8601"
        val (period, duration) = parseIso8601Span(argStr(0))
        val odt = tsInstant(t).atOffset(java.time.ZoneOffset.UTC)
        val shifted =
          if (neg) odt.minus(period).minus(duration)
          else odt.plus(period).plus(duration)
        java.time.format.DateTimeFormatter.ISO_INSTANT.format(shifted.toInstant)

      // named/indexed group extraction (methods_strings.go:1623,1677)
      case "re_find_object" =>
        reFindObjects(toStr(t), argStr(0), firstOnly = true)
          .headOption.getOrElse(VectorMap.empty[String, Any])
      case "re_find_all_object" =>
        reFindObjects(toStr(t), argStr(0), firstOnly = false)

      case "parse_duration_iso8601" =>
        graft.functions.Udfs.parseDurationIso(toStr(t))
      case "parse_form_url_encoded" =>
        val m = graft.functions.Udfs.parseFormUrlEncoded(toStr(t))
        if (m == null) err("parse_form_url_encoded on null") else VectorMap.from(m)

      // `.parse_url()` — fields follow Go net/url.URL (methods doc)
      case "parse_url" =>
        val u = try new java.net.URI(toStr(t))
          catch { case e: Exception => err(s"parse_url: ${e.getMessage}") }
        val hostPort =
          Option(u.getHost).map(h => if (u.getPort >= 0) s"$h:${u.getPort}" else h)
        var out = VectorMap[String, Any](
          "fragment" -> Option(u.getFragment).getOrElse(""),
          "host" -> hostPort.getOrElse(""),
          "opaque" -> (if (u.isOpaque) Option(u.getSchemeSpecificPart).getOrElse("") else ""),
          "path" -> Option(u.getPath).getOrElse(""),
          "raw_fragment" -> "",
          "raw_path" -> Option(u.getRawPath).filter(_ != Option(u.getPath).getOrElse("")).getOrElse(""),
          "raw_query" -> Option(u.getRawQuery).getOrElse(""),
          "scheme" -> Option(u.getScheme).getOrElse(""))
        Option(u.getUserInfo).foreach { ui =>
          val (n, pw) = ui.indexOf(':') match {
            case -1 => (ui, None)
            case i => (ui.take(i), Some(ui.drop(i + 1)))
          }
          val user = VectorMap[String, Any]("name" -> n) ++
            pw.map(p => VectorMap[String, Any]("password" -> p)).getOrElse(VectorMap.empty)
          out = out.updated("user", user)
        }
        out

      // AES (methods_encryption.go): ctr / cbc (NoPadding, Go parity) / gcm
      // (nonce + ciphertext‖tag, Go Seal parity)
      case "encrypt_aes" | "decrypt_aes" =>
        val encrypt = name == "encrypt_aes"
        val scheme = argStr(0)
        val key = new javax.crypto.spec.SecretKeySpec(rawBytes(arg(1)), "AES")
        val iv = rawBytes(arg(2))
        val mode = if (encrypt) javax.crypto.Cipher.ENCRYPT_MODE else javax.crypto.Cipher.DECRYPT_MODE
        val cipher = scheme match {
          case "ctr" | "ofb" =>
            val c = javax.crypto.Cipher.getInstance(s"AES/${scheme.toUpperCase}/NoPadding")
            c.init(mode, key, new javax.crypto.spec.IvParameterSpec(iv)); c
          case "cbc" =>
            val c = javax.crypto.Cipher.getInstance("AES/CBC/NoPadding")
            c.init(mode, key, new javax.crypto.spec.IvParameterSpec(iv)); c
          case "gcm" =>
            val c = javax.crypto.Cipher.getInstance("AES/GCM/NoPadding")
            c.init(mode, key, new javax.crypto.spec.GCMParameterSpec(128, iv)); c
          case s => err(s"unknown AES scheme $s")
        }
        try VBytes(cipher.doFinal(rawBytes(t)))
        catch { case e: java.security.GeneralSecurityException => err(s"$name: ${e.getMessage}") }

      // `.json_schema(schema)` — processor_jsonschema.go flavor: validates
      // type/properties/required/items subset, errors on violation,
      // returns the target unchanged
      case "json_schema" =>
        val schema = arg(0) match {
          case m: VectorMap[String @unchecked, Any @unchecked] => m
          case s: String => parseJsonTyped(s) match {
            case m: VectorMap[String @unchecked, Any @unchecked] => m
            case _ => err("json_schema: schema must be an object")
          }
          case other => err(s"json_schema: schema must be an object, got ${typeName(other)}")
        }
        validateJsonSchema(t, schema, "root")
        t

      // `.bloblang(mapping)` — dynamic mapping execution (methods.md)
      case "bloblang" =>
        val prog = try Bloblang.parse(argStr(0))
          catch { case e: Exception => err(s"bloblang: ${e.getMessage}") }
        Interp.run(prog, marshalJson(t), Map.empty, Map.empty) match {
          case Some(out) => parseJsonTyped(out)
          case None => VDelete
        }

      // `.parse_big_decimal(scale)` — Kafka Connect / Debezium decimal:
      // two's-complement big-endian unscaled int → decimal string
      case "parse_big_decimal" =>
        val bytes = t match {
          case b: VBytes => b.bytes
          case s: String => s.getBytes("ISO-8859-1")
          case other => err(s"parse_big_decimal on ${typeName(other)}")
        }
        val scale = argLong(0).toInt
        new java.math.BigDecimal(new java.math.BigInteger(bytes), scale).toPlainString

      // ===== geoip (impl/maxmind/bloblang_geoip.go:55-83) ====================
      // All eight methods look the target IP up in the .mmdb at args(0) and
      // return the decoded record (the reference decodes into per-type Go
      // structs whose JSON marshal mirrors the record layout — the raw
      // record IS that shape). The licensed MaxMind DATA never ships;
      // synthetic databases from Mmdb.Writer back the tests and gate.
      case "geoip_city" | "geoip_country" | "geoip_asn" | "geoip_enterprise" |
           "geoip_anonymous_ip" | "geoip_connection_type" | "geoip_domain" |
           "geoip_isp" =>
        t match {
          case ip: String => graft.functions.Mmdb.lookup(argStr(0), ip)
          case other => err(s"$name on ${typeName(other)}")
        }

      case other => err(s"unknown method $other on ${typeName(t)}")
    }
  }

  // ===== diff/patch helpers ==================================================

  private def jsonDiff(from: Any, to: Any, path: String): Vector[VectorMap[String, Any]] =
    (from, to) match {
      case (a, b) if valueEq(a, b) => Vector.empty
      case (a: VectorMap[String @unchecked, Any @unchecked], b: VectorMap[String @unchecked, Any @unchecked]) =>
        val removed = a.keys.filterNot(b.contains).map(k =>
          VectorMap[String, Any]("op" -> "remove", "path" -> s"$path/$k")).toVector
        val added = b.collect { case (k, v) if !a.contains(k) =>
          VectorMap[String, Any]("op" -> "add", "path" -> s"$path/$k", "value" -> v) }.toVector
        val changed = b.toVector.collect { case (k, v) if a.contains(k) =>
          jsonDiff(a(k), v, s"$path/$k") }.flatten
        removed ++ added ++ changed
      case (a: Vector[Any @unchecked], b: Vector[Any @unchecked]) =>
        val common = a.indices.intersect(b.indices).toVector.flatMap(i =>
          jsonDiff(a(i), b(i), s"$path/$i"))
        val removed = (b.length until a.length).reverse.map(i =>
          VectorMap[String, Any]("op" -> "remove", "path" -> s"$path/$i")).toVector
        val added = (a.length until b.length).map(i =>
          VectorMap[String, Any]("op" -> "add", "path" -> s"$path/$i", "value" -> b(i))).toVector
        common ++ removed ++ added
      case (_, b) =>
        Vector(VectorMap[String, Any]("op" -> "replace", "path" -> (if (path.isEmpty) "/" else path), "value" -> b))
    }

  private def jsonPatchApply(t: Any, path: List[String], value: Option[Any]): Any =
    (t, path) match {
      case (_, Nil) => value.getOrElse(err("patch: remove at root"))
      case (m: VectorMap[String @unchecked, Any @unchecked], k :: Nil) =>
        value.fold(m - k: Any)(v => m.updated(k, v))
      case (m: VectorMap[String @unchecked, Any @unchecked], k :: rest) =>
        m.updated(k, jsonPatchApply(m.getOrElse(k, VectorMap.empty[String, Any]), rest, value))
      case (a: Vector[Any @unchecked], k :: Nil) =>
        val i = k.toInt
        value.fold(a.patch(i, Nil, 1): Any) { v =>
          if (i == a.length) a :+ v else a.updated(i, v)
        }
      case (a: Vector[Any @unchecked], k :: rest) =>
        val i = k.toInt
        a.updated(i, jsonPatchApply(a(i), rest, value))
      case (other, seg) => err(s"patch: `${seg.head}` on ${typeName(other)}")
    }

  // ===== timestamp helpers (values travel as RFC3339 strings) ===============

  private def cToJava(fmt: String): String = graft.functions.Blob.cFormatToJava(fmt)

  private def tsInstant(t: Any): java.time.Instant = t match {
    case s: String =>
      try java.time.Instant.parse(s)
      catch { case _: Exception =>
        try java.time.OffsetDateTime.parse(s).toInstant
        catch { case _: Exception =>
          java.time.LocalDateTime.parse(s.replace(' ', 'T')).toInstant(java.time.ZoneOffset.UTC) } }
    case l: Long => java.time.Instant.ofEpochSecond(l)
    case d: Double => java.time.Instant.ofEpochMilli((d * 1000).toLong)
    case b: VBytes => tsInstant(b.str)
    case other => err(s"expected timestamp, got ${typeName(other)}")
  }

  private def parseTs(s: String, javaFmt: String): String = {
    val f = java.time.format.DateTimeFormatter.ofPattern(javaFmt, java.util.Locale.US)
    val inst =
      try java.time.LocalDateTime.parse(s, f).toInstant(java.time.ZoneOffset.UTC)
      catch { case _: Exception =>
        try java.time.LocalDate.parse(s, f).atStartOfDay.toInstant(java.time.ZoneOffset.UTC)
        catch { case _: Exception => java.time.OffsetDateTime.parse(s, f).toInstant } }
    java.time.format.DateTimeFormatter.ISO_INSTANT.format(inst)
  }

  private def formatTs(t: Any, javaFmt: String): String =
    java.time.format.DateTimeFormatter.ofPattern(javaFmt, java.util.Locale.US)
      .withZone(java.time.ZoneOffset.UTC).format(tsInstant(t))

  private def tsEpochMicros(t: Any): Long = {
    val i = tsInstant(t)
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  private def rawBytes(t: Any): Array[Byte] = t match {
    case b: VBytes => b.bytes
    case v => toStr(v).getBytes("UTF-8")
  }

  private def seqOf(t: Any): Vector[Any] = t match {
    case a: Vector[Any @unchecked] => a
    case other => err(s"expected array, got ${typeName(other)}")
  }

  private def ceilFloor(t: Any, f: Double => Double): Any = t match {
    case l: Long => l
    case v => val d = f(toNum(v)); if (d.isWhole) d.toLong else d
  }

  private def reduceNum(t: Any, f: (Double, Double) => Double): Any = t match {
    case a: Vector[Any @unchecked] if a.nonEmpty =>
      if (a.forall(_.isInstanceOf[Long]))
        a.map(_.asInstanceOf[Long]).reduce((x, y) => f(x.toDouble, y.toDouble).toLong)
      else a.map(toNum).reduce(f)
    case _ => err("min/max on empty or non-array")
  }

  private[blob] def cmpVals(a: Any, b: Any): Int = (a, b) match {
    case (x: String, y: String) => x.compareTo(y)
    case _ => java.lang.Double.compare(toNum(a), toNum(b))
  }

  private val namedEntities = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ", "#34" -> "\"", "#39" -> "'")
  /** Shared with the compiled twin (functions.UnescapeHtmlExpr): both paths
    * must decode the exact same entity set. */
  private[graft] def unescapeHtml(s: String): String =
    "&(#?\\w+);".r.replaceAllIn(s, m => {
      val e = m.group(1)
      val rep =
        if (e.startsWith("#x") || e.startsWith("#X"))
          new String(Character.toChars(Integer.parseInt(e.drop(2), 16)))
        else if (e.startsWith("#"))
          new String(Character.toChars(Integer.parseInt(e.drop(1))))
        else namedEntities.getOrElse(e, m.matched)
      java.util.regex.Matcher.quoteReplacement(rep)
    })

  private def sliceSeq(a: Vector[Any], from: Long, until: Option[Long]): Vector[Any] = {
    val n = a.length
    def norm(i: Long): Int = (if (i < 0) math.max(0L, n + i) else math.min(i, n)).toInt
    a.slice(norm(from), until.map(norm).getOrElse(n))
  }

  /** ISO-8601 span: date part → Period, time part → Duration (mixed
    * "P1MT2H" splits at 'T'; pure "PT…" is Duration-only). */
  private def parseIso8601Span(s: String): (java.time.Period, java.time.Duration) =
    try {
      // a leading '-' negates the WHOLE span (both date and time parts)
      if (s.startsWith("-")) {
        val (p, d) = parseIso8601Span(s.substring(1))
        (p.negated(), d.negated())
      } else if (s.startsWith("PT"))
        (java.time.Period.ZERO, java.time.Duration.parse(s))
      else s.indexOf('T') match {
        case -1 => (java.time.Period.parse(s), java.time.Duration.ZERO)
        case i => (java.time.Period.parse(s.substring(0, i)),
          java.time.Duration.parse("P" + s.substring(i)))
      }
    } catch { case e: java.time.format.DateTimeParseException =>
      err(s"invalid ISO-8601 duration '$s': ${e.getMessage}")
    }

  /** Go-flavored named-group matching: translate `(?P<n>` → `(?<n>`, key
    * each group by name when present else by index, "0" = whole match. */
  private def reFindObjects(s: String, pattern: String, firstOnly: Boolean): Vector[Any] = {
    val javaPat = pattern.replace("(?P<", "(?<")
    val names = "\\(\\?<([A-Za-z][A-Za-z0-9]*)>".r
      .findAllMatchIn(javaPat).map(_.group(1)).toVector
    val m = try java.util.regex.Pattern.compile(javaPat).matcher(s)
      catch { case e: Exception => err(s"invalid pattern: ${e.getMessage}") }
    val out = Vector.newBuilder[Any]
    while (m.find()) {
      var obj = VectorMap[String, Any]("0" -> m.group(0))
      var named = 0
      for (g <- 1 to m.groupCount()) {
        // named groups keep positional numbering in Java, so resolve each
        // index's name by probing the name list
        val name = names.find(n =>
          try m.group(n) != null && m.start(n) == m.start(g) && m.end(g) == m.end(n)
          catch { case _: Exception => false })
        (name, Option(m.group(g))) match {
          case (Some(n), Some(v)) => obj = obj.updated(n, v); named += 1
          case (None, Some(v)) => obj = obj.updated(g.toString, v)
          case _ => ()
        }
      }
      out += obj
      if (firstOnly) return out.result()
    }
    out.result()
  }

  /** Minimal JSON-schema validator: type / properties / required / items. */
  private def validateJsonSchema(v: Any, schema: VectorMap[String, Any], path: String): Unit = {
    schema.get("type").foreach { ty =>
      val ok = (toStr(ty), v) match {
        case ("object", _: VectorMap[_, _]) => true
        case ("array", _: Vector[_]) => true
        case ("string", _: String) | ("string", _: VBytes) => true
        case ("integer", _: Long) => true
        case ("number", _: Long) | ("number", _: Double) => true
        case ("boolean", _: Boolean) => true
        case ("null", null) => true
        case _ => false
      }
      if (!ok) err(s"json_schema: $path: expected ${toStr(ty)}, got ${typeName(v)}")
    }
    (v, schema.get("required")) match {
      case (m: VectorMap[String @unchecked, Any @unchecked], Some(req: Vector[Any @unchecked])) =>
        req.foreach(r => if (!m.contains(toStr(r)))
          err(s"json_schema: $path: missing required field ${toStr(r)}"))
      case _ => ()
    }
    (v, schema.get("properties")) match {
      case (m: VectorMap[String @unchecked, Any @unchecked],
            Some(props: VectorMap[String @unchecked, Any @unchecked])) =>
        props.foreach {
          case (k, sub: VectorMap[String @unchecked, Any @unchecked]) =>
            m.get(k).foreach(pv => validateJsonSchema(pv, sub, s"$path.$k"))
          case _ => ()
        }
      case _ => ()
    }
    (v, schema.get("items")) match {
      case (a: Vector[Any @unchecked], Some(items: VectorMap[String @unchecked, Any @unchecked])) =>
        a.zipWithIndex.foreach { case (e, i) => validateJsonSchema(e, items, s"$path[$i]") }
      case _ => ()
    }
  }

  /** RFC-4180 CSV: quoted fields, "" escapes, CRLF/LF rows. */
  private def parseCsvRows(s: String, delim: Char): Vector[Vector[String]] = {
    val rows = Vector.newBuilder[Vector[String]]
    var row = Vector.newBuilder[String]
    val field = new StringBuilder
    var inQuotes = false
    var sawAny = false
    var i = 0
    def endField(): Unit = { row += field.toString; field.clear() }
    def endRow(): Unit = { endField(); rows += row.result(); row = Vector.newBuilder[String] }
    while (i < s.length) {
      val c = s.charAt(i)
      sawAny = true
      if (inQuotes) {
        if (c == '"') {
          if (i + 1 < s.length && s.charAt(i + 1) == '"') { field.append('"'); i += 1 }
          else inQuotes = false
        } else field.append(c)
      } else c match {
        case '"' if field.isEmpty => inQuotes = true
        case `delim` => endField()
        case '\r' if i + 1 < s.length && s.charAt(i + 1) == '\n' => endRow(); i += 1
        case '\n' => endRow()
        case other => field.append(other)
      }
      i += 1
    }
    if (inQuotes) err("parse_csv: unterminated quote")
    if (field.nonEmpty || row.result().nonEmpty || (sawAny && !s.endsWith("\n")))
      endRow()
    rows.result()
  }

  /** Bento parse_xml value model (impl/xml/bloblang.go + xml/map.go):
    * attributes → "-name" keys, text → "#text" when the element also has
    * attributes/children (bare string otherwise), repeated child names
    * collapse into arrays. */
  private def parseXmlValue(s: String): Any = {
    val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    dbf.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true) // no XXE
    dbf.setNamespaceAware(false)
    val doc =
      try dbf.newDocumentBuilder().parse(
        new java.io.ByteArrayInputStream(s.getBytes("UTF-8")))
      catch { case e: Exception => err(s"parse_xml: ${e.getMessage}") }

    def elemValue(e: org.w3c.dom.Element): Any = {
      val attrs = e.getAttributes
      val fields = Vector.newBuilder[(String, Any)]
      for (i <- 0 until attrs.getLength) {
        val a = attrs.item(i)
        fields += (("-" + a.getNodeName) -> a.getNodeValue)
      }
      val kids = e.getChildNodes
      val childVals = scala.collection.mutable.LinkedHashMap.empty[String, Vector[Any]]
      val text = new StringBuilder
      for (i <- 0 until kids.getLength) kids.item(i) match {
        case ce: org.w3c.dom.Element =>
          childVals(ce.getTagName) = childVals.getOrElse(ce.getTagName, Vector.empty) :+ elemValue(ce)
        case tn: org.w3c.dom.Text => text.append(tn.getData)
        case _ => ()
      }
      childVals.foreach { case (k, vs) =>
        fields += (k -> (if (vs.length == 1) vs.head else vs))
      }
      val txt = text.toString.trim
      val fs = fields.result()
      if (fs.isEmpty) txt
      else VectorMap.from(if (txt.nonEmpty) fs :+ ("#text" -> (txt: Any)) else fs)
    }
    VectorMap[String, Any](doc.getDocumentElement.getTagName -> elemValue(doc.getDocumentElement))
  }
}
