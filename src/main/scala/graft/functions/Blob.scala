package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Bloblang-equivalent expression layer (SURVEY §2.1-2.3).
  *
  * Each method mirrors one Bloblang function/method (reference:
  * internal/bloblang/query/methods*.go, functions.go) as a Catalyst
  * `Column` combinator. Everything here stays inside whole-stage codegen —
  * no UDFs — so a mapping compiled from these is as fast as hand-written
  * Spark SQL. UDF escape hatches live in [[Udfs]].
  *
  * Usage: `import graft.functions.Blob._` then compose like
  * `uppercase(jsonPath($"content", "$.city"))`.
  */
object Blob {

  // ===== general / coercion (methods.go) =====================================

  /** `.catch(fallback)` — methods.go:148. */
  def orCatch(c: Column, fallback: Column): Column = coalesce(c, fallback)
  /** `a | b` pipe/coalesce operator — arithmetic.go:18-33. */
  def pipe(a: Column, b: Column): Column = coalesce(a, b)
  /** `.or(v)` — methods.go:807. */
  def or(c: Column, v: Column): Column = coalesce(c, v)
  /** `.not_null()` — methods.go:741: raises if null (feeds the error facet
    * when wrapped in a Try combinator). `assert_true` returns null when the
    * predicate holds, so the `when` preserves `c`'s type. */
  def notNull(c: Column): Column =
    when(assert_true(c.isNotNull, lit("value is null")).isNull, c)
  /** `.type()` — methods.go:831. */
  def typeName(c: Column): Column = typeof(c)
  /** `.number()` — methods.go:767. */
  def number(c: Column): Column = c.cast(DoubleType)
  /** `.bool()` — methods.go:109. */
  def bool(c: Column): Column = c.cast(BooleanType)
  /** `.string()` — methods_strings.go:1895. */
  def string(c: Column): Column = c.cast(StringType)
  /** `.bytes()` — methods_strings.go:42. */
  def bytes(c: Column): Column = c.cast(BinaryType)
  /** `if cond { a } else { b }` — query_expression_parser.go:109-160. */
  def iff(cond: Column, a: Column, b: Column): Column = when(cond, a).otherwise(b)
  /** `match` expression — query_expression_parser.go:10-101. */
  def matchCase(cases: Seq[(Column, Column)], default: Column): Column =
    cases.foldRight(default) { case ((p, v), acc) => when(p, v).otherwise(acc) }

  // ===== json / structured tree (functions.go:491, methods_strings.go:1122) ==

  /** `json("a.b.c")` over the content facet — functions.go:491. */
  def jsonPath(c: Column, path: String): Column = get_json_object(c, path)
  /** `.parse_json()` — methods_strings.go:1122 (schema-ful boundary). */
  def parseJson(c: Column, schema: DataType): Column = from_json(c, schema)
  /** `.format_json()` — methods_strings.go:1226. */
  def formatJson(c: Column): Column = to_json(c)

  // ===== numbers (methods_numbers.go, impl/pure/bloblang_numbers.go) =========

  def absN(c: Column): Column = abs(c)
  def ceilN(c: Column): Column = ceil(c)
  def floorN(c: Column): Column = floor(c)
  def roundN(c: Column): Column = round(c)
  def powN(c: Column, e: Column): Column = pow(c, e)
  def sqrtN(c: Column): Column = sqrt(c)
  def logN(c: Column): Column = log(c)
  def log10N(c: Column): Column = log10(c)
  def sinN(c: Column): Column = sin(c)
  def cosN(c: Column): Column = cos(c)
  def tanN(c: Column): Column = tan(c)
  /** `.max()` / `.min()` on an array — methods_numbers.go:122,165. */
  def arrayMaxN(c: Column): Column = array_max(c)
  def arrayMinN(c: Column): Column = array_min(c)
  /** `pi()` — impl/pure/bloblang_numbers.go:249. */
  def pi: Column = lit(math.Pi)

  // ===== strings (methods_strings.go) ========================================

  def capitalize(c: Column): Column = initcap(c)
  def uppercase(c: Column): Column = upper(c)
  def lowercase(c: Column): Column = lower(c)
  def trimS(c: Column): Column = trim(c)
  def trimPrefix(c: Column, p: String): Column =
    when(c.startsWith(p), c.substr(lit(p.length + 1), length(c))).otherwise(c)
  def trimSuffix(c: Column, s: String): Column =
    when(c.endsWith(s), c.substr(lit(1), length(c) - s.length)).otherwise(c)
  def hasPrefix(c: Column, p: Column): Column = c.startsWith(p)
  def hasSuffix(c: Column, p: Column): Column = c.endsWith(p)
  def indexOf(c: Column, sub: String): Column = instr(c, sub) - 1 // bento is 0-based
  def containsS(c: Column, sub: String): Column = c.contains(sub)
  def lengthS(c: Column): Column = length(c)
  def reverseS(c: Column): Column = reverse(c)
  def repeatS(c: Column, n: Column): Column = repeat(c, n)
  def replaceAll(c: Column, from: String, to: String): Column = {
    // regexp-escape `from`: bento replace_all is literal (methods_strings.go:1467)
    regexp_replace(c, java.util.regex.Pattern.quote(from), java.util.regex.Matcher.quoteReplacement(to))
  }
  def splitS(c: Column, sep: String): Column = split(c, java.util.regex.Pattern.quote(sep))
  def joinS(c: Column, sep: String): Column = array_join(c, sep)
  def slice(c: Column, start: Int, len: Int): Column = substring(c, start + 1, len)
  /** `.format(args...)` — methods_strings.go:670. */
  def formatS(fmt: String, args: Column*): Column = format_string(fmt, args: _*)
  /** `.quote()` — methods_strings.go:1418 (JSON-style escaping + quotes). */
  def quote(c: Column): Column = {
    val esc = Seq("\\" -> "\\\\", "\"" -> "\\\"", "\n" -> "\\n", "\r" -> "\\r", "\t" -> "\\t")
      .foldLeft(c) { case (acc, (from, to)) =>
        regexp_replace(acc, java.util.regex.Pattern.quote(from), java.util.regex.Matcher.quoteReplacement(to))
      }
    concat(lit("\""), esc, lit("\""))
  }
  /** `.re_match(p)` — methods_strings.go:1801. */
  def reMatch(c: Column, pattern: String): Column = c.rlike(pattern)
  /** `.re_replace_all(p, to)` — methods_strings.go:1848. */
  def reReplaceAll(c: Column, pattern: String, to: String): Column = regexp_replace(c, pattern, to)
  /** `.re_find_all(p)` — methods_strings.go:1577 (full matches → group 0;
    * Spark's 2-arg regexp_extract_all defaults to group 1). */
  def reFindAll(c: Column, pattern: String): Column =
    regexp_extract_all(c, lit(pattern), lit(0))
  def reFind(c: Column, pattern: String, group: Int = 0): Column = regexp_extract(c, pattern, group)

  /** Count capture groups of a pattern (driver-side, plan-time). */
  private def groupCount(pattern: String): Int =
    java.util.regex.Pattern.compile(pattern).matcher("").groupCount()
  /** Named groups `(?<name>...)` of a pattern, in order. */
  private def groupNames(pattern: String): Seq[String] =
    "\\(\\?<([a-zA-Z][a-zA-Z0-9]*)>".r.findAllMatchIn(pattern).map(_.group(1)).toSeq

  /** `.re_find_all_submatch(p)` — methods_strings.go:1623: one
    * array[full, g1, g2…] per match. Group extraction compiles to one
    * codegen'd regexp_extract_all per group, zipped — the group count is
    * plan-time static. */
  def reFindAllSubmatch(c: Column, pattern: String): Column = {
    val gs = (0 to groupCount(pattern)).map(g => regexp_extract_all(c, lit(pattern), lit(g)))
    gs.map(g => transform(g, x => array(x)))
      .reduce((a, b) => zip_with(a, b, (x, y) => concat(x, y)))
  }

  /** `.re_find_object(p)` — methods_strings.go:1677: named groups of the
    * FIRST match as a map. Names resolve at plan time. */
  def reFindObject(c: Column, pattern: String): Column = {
    val names = groupNames(pattern)
    require(names.nonEmpty, "re_find_object: pattern has no named groups")
    map(names.zipWithIndex.flatMap { case (n, i) =>
      Seq(lit(n), regexp_extract(c, pattern, i + 1))
    }: _*)
  }

  /** `.re_find_all_object(p)` — methods_strings.go:1734: named groups of
    * EVERY match, array of maps. */
  def reFindAllObject(c: Column, pattern: String): Column = {
    val names = groupNames(pattern)
    require(names.nonEmpty, "re_find_all_object: pattern has no named groups")
    val perGroup = names.zipWithIndex.map { case (n, i) =>
      transform(regexp_extract_all(c, lit(pattern), lit(i + 1)),
        v => map(lit(n), v))
    }
    perGroup.reduce((a, b) => zip_with(a, b, (x, y) => map_concat(x, y)))
  }

  // ===== hashing / encoding (methods_strings.go:90,757) ======================

  def hashMd5(c: Column): Column = md5(c.cast(BinaryType))
  def hashSha1(c: Column): Column = sha1(c.cast(BinaryType))
  def hashSha256(c: Column): Column = sha2(c.cast(BinaryType), 256)
  def hashSha512(c: Column): Column = sha2(c.cast(BinaryType), 512)
  def hashCrc32(c: Column): Column = crc32(c.cast(BinaryType))
  def hashXx64(c: Column): Column = xxhash64(c)
  def encodeBase64(c: Column): Column = base64(c.cast(BinaryType))
  def decodeBase64(c: Column): Column = unbase64(c)
  def encodeHex(c: Column): Column = lower(hex(c.cast(BinaryType)))
  def decodeHex(c: Column): Column = unhex(c)
  /** `.escape_url_query()` — methods_strings.go:573. */
  def escapeUrlQuery(c: Column): Column = url_encode(c)
  def unescapeUrlQuery(c: Column): Column = url_decode(c)
  /** `.parse_url()` — methods_strings.go:1327. */
  def parseUrlPart(c: Column, part: String): Column = parse_url(c, lit(part))
  /** `encrypt_aes`/`decrypt_aes` — methods_strings.go:282,388. */
  def encryptAes(c: Column, key: Column, mode: String = "GCM"): Column =
    aes_encrypt(c.cast(BinaryType), key, lit(mode))
  def decryptAes(c: Column, key: Column, mode: String = "GCM"): Column =
    aes_decrypt(c.cast(BinaryType), key, lit(mode))

  // ===== structured: arrays & objects (methods_structured.go) ================

  def all(c: Column, p: Column => Column): Column = forall(c, p)
  def any(c: Column, p: Column => Column): Column = exists(c, p)
  def appendA(c: Column, v: Column): Column = array_append(c, v)
  def containsA(c: Column, v: Column): Column = array_contains(c, v)
  /** `.enumerated()` — methods_structured.go:246. */
  def enumerated(c: Column): Column =
    zip_with(sequence(lit(0), size(c) - 1), c, (i, v) => struct(i.as("index"), v.as("value")))
  def filterA(c: Column, p: Column => Column): Column = filter(c, p)
  def findBy(c: Column, p: Column => Column): Column = element_at(filter(c, p), 1)
  def flattenA(c: Column): Column = flatten(c)
  /** `.fold(init, (acc, v) -> …)` — methods_structured.go:641. */
  def fold(c: Column, init: Column, f: (Column, Column) => Column): Column = aggregate(c, init, f)
  def index(c: Column, i: Int): Column = element_at(c, i + 1) // bento 0-based
  def keys(c: Column): Column = map_keys(c)
  def values(c: Column): Column = map_values(c)
  def keyValues(c: Column): Column = map_entries(c)
  def lengthA(c: Column): Column = size(c)
  def mapEach(c: Column, f: Column => Column): Column = transform(c, f)
  def mapEachKey(c: Column, f: Column => Column): Column = transform_keys(c, (k, _) => f(k))
  def mergeM(a: Column, b: Column): Column = map_concat(a, b)
  def sortA(c: Column): Column = array_sort(c)
  def sortByDesc(c: Column): Column = reverse(array_sort(c))
  def sliceA(c: Column, from: Int, until: Int): Column = org.apache.spark.sql.functions.slice(c, from + 1, until - from)
  /** `.sum()` — methods_structured.go:1518. */
  def sumA(c: Column): Column = aggregate(c, lit(0.0), (acc, v) => acc + v.cast(DoubleType))
  def uniqueA(c: Column): Column = array_distinct(c)
  def zipA(a: Column, b: Column): Column = arrays_zip(a, b)
  /** `.without(keys)` — methods_structured.go:1693 (map flavor). */
  def withoutKeys(c: Column, ks: Seq[String]): Column =
    map_filter(c, (k, _) => !k.isin(ks.map(lit(_).cast(StringType)): _*))
  /** `.squash` — impl/pure/bloblang_objects.go:15. */
  def concatA(cs: Column*): Column = concat(cs: _*)

  // ===== timestamps (impl/pure/bloblang_time.go) =============================

  /** `ts_parse` / `parse_timestamp` — bloblang_time.go:243. */
  def tsParse(c: Column, fmt: String): Column = to_timestamp(c, fmt)
  /** `ts_format` — bloblang_time.go:377. */
  def tsFormat(c: Column, fmt: String): Column = date_format(c, fmt)
  /** `ts_unix{,_milli,_micro}` — bloblang_time.go:479-573. */
  def tsUnix(c: Column): Column = unix_timestamp(c)
  def tsUnixMilli(c: Column): Column = unix_millis(c)
  def tsUnixMicro(c: Column): Column = unix_micros(c)
  /** `ts_round(interval)` — bloblang_time.go:48: round DOWN to arbitrary duration. */
  def tsFloor(c: Column, unit: String): Column = date_trunc(unit, c)
  /** `ts_tz` — bloblang_time.go:78. */
  def tsTz(c: Column, tz: String): Column = from_utc_timestamp(c, tz)
  /** `ts_sub` — bloblang_time.go:599 (nanosecond diff in bento; micros here). */
  def tsSubMicros(a: Column, b: Column): Column = unix_micros(a) - unix_micros(b)
  def nowTs: Column = current_timestamp()

  // C-style strptime/strftime (bloblang_time.go:296,449) → Java patterns,
  // translated at plan time so parsing/formatting stays codegen'd
  private val strfMap = Seq(
    "%Y" -> "yyyy", "%y" -> "yy", "%m" -> "MM", "%d" -> "dd", "%e" -> "d",
    "%H" -> "HH", "%I" -> "hh", "%M" -> "mm", "%S" -> "ss", "%f" -> "SSSSSS",
    "%b" -> "MMM", "%B" -> "MMMM", "%a" -> "EEE", "%A" -> "EEEE",
    "%j" -> "DDD", "%p" -> "a", "%z" -> "xx", "%Z" -> "zz", "%%" -> "%")
  private[graft] def cFormatToJava(fmt: String): String = {
    // escape literal letters for Java patterns, then substitute % tokens
    val sb = new StringBuilder
    var i = 0
    while (i < fmt.length) {
      if (fmt.charAt(i) == '%' && i + 1 < fmt.length) {
        val tok = fmt.substring(i, i + 2)
        sb.append(strfMap.toMap.getOrElse(tok,
          throw new IllegalArgumentException(s"strftime: unsupported $tok")))
        i += 2
      } else {
        val c = fmt.charAt(i)
        if (c.isLetter) sb.append("'").append(c).append("'") else sb.append(c)
        i += 1
      }
    }
    sb.toString
  }
  /** `ts_strptime(fmt)` — bloblang_time.go:296. */
  def tsStrptime(c: Column, cFormat: String): Column = to_timestamp(c, cFormatToJava(cFormat))
  /** `ts_strftime(fmt)` — bloblang_time.go:449. */
  def tsStrftime(c: Column, cFormat: String): Column = date_format(c, cFormatToJava(cFormat))

  /** `ts_add_iso8601` / `ts_sub_iso8601` — bloblang_time.go:110,118: the
    * duration is a plan-time literal; arithmetic stays in codegen. */
  def tsAddIso8601(c: Column, isoDuration: String): Column = {
    val micros = java.time.Duration.parse(isoDuration).toNanos / 1000L
    timestamp_micros(unix_micros(c.cast(TimestampType)) + lit(micros))
  }
  def tsSubIso8601(c: Column, isoDuration: String): Column = {
    val micros = java.time.Duration.parse(isoDuration).toNanos / 1000L
    timestamp_micros(unix_micros(c.cast(TimestampType)) - lit(micros))
  }

  // ===== bloblang functions (functions.go) ===================================

  /** `uuid_v4()` — functions.go:927. */
  def uuidV4: Column = uuid()
  /** `random_int(max)` — functions.go:745. */
  def randomInt(n: Int, seed: Long = 42L): Column = floor(rand(seed) * n).cast(LongType)
  /** `range(start, stop, step)` — functions.go:441. */
  def rangeA(start: Int, stop: Int, step: Int = 1): Column =
    sequence(lit(start), lit(stop - 1), lit(step))
  /** `throw(msg)` — functions.go:897 (routes to the error facet upstream). */
  def throwErr(msg: Column): Column = raise_error(msg)
  /** `counter()` per-partition monotonic — functions.go:285 (documented: no
    * global total order in a distributed engine; stable within a partition). */
  def counter: Column = monotonically_increasing_id()

  /** `cosine_similarity(a, b)` — impl/pure/bloblang_numbers_v2.go:36.
    * Fused native expression (functions/Exprs.CosineSimilarityExpr): one
    * codegen'd pass computing dot and both norms, zero intermediate
    * arrays. Replaces the zip_with+aggregate ×3 HOF form with identical
    * semantics and bit-identical results (same left-to-right fold order,
    * same null algebra) — the HOF allocated three zipped arrays per row,
    * the allocation hot path of every ANN scan. */
  def cosineSimilarity(a: Column, b: Column): Column =
    graft.functions.Exprs.cosineSimilarity(a, b)

  /** Dot product as a reusable primitive for the similarity operators. */
  def dotProduct(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (p, q) => p.cast(DoubleType) * q.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)

  def l2Norm(a: Column): Column = sqrt(dotProduct(a, a))
}
