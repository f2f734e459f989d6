package graft

import graft.blob.{Bloblang, Compile, Interp}
import graft.core.Msg
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloblang AST → Catalyst Column compiler (blob/Compile.scala).
  *
  * The load-bearing gate is DIFFERENTIAL: every mapping in the compiled
  * subset must produce byte-identical message content to the per-row
  * interpreter over the same input frame. The pushdown tests then assert
  * the whole point of compiling — filters and column pruning reach the
  * parquet scan and no opaque UDF appears in the plan.
  */
class BloblangCompileSpec extends SparkSpec {
  import spark.implicits._

  // fixture: the compiled subset's type universe (no doubles in OUTPUT
  // fields — they stay predicate-only, like `d` here)
  private lazy val fixture: DataFrame = Seq(
    (1L, 10L, 1.5, "alpha one", true, Seq("x", "y"), Option("hello")),
    (2L, 120L, 2.0, "Beta Two", false, Seq("z"), None),
    (3L, 55L, -0.5, "  padded  ", true, Seq.empty[String], Option("v")),
    (4L, 99L, 4.25, "alpha;beta;g", false, Seq("a", "b", "c"), Option("alpha one")),
    (5L, 0L, 0.0, "", true, Seq("q"), Option(""))
  ).toDF("k", "n", "d", "s", "b", "arr", "mn").coalesce(1)

  /** Run one mapping through BOTH paths and compare surviving contents as
    * sorted multisets — a delete-filter dropping different rows fails the
    * comparison too. */
  private def differential(src: String, df: DataFrame = fixture): Unit = {
    val prog = Bloblang.parse(src)
    val compiled = Compile.tryCompile(prog, df.schema)
    assert(compiled.isDefined, s"mapping did not compile:\n$src")
    val got = Compile.envelope(compiled.get.transform(df), compiled.get.ser)
      .select(Msg.ContentCol).as[String].collect().toSeq.sorted
    val want = Msg.envelope(df).select(Msg.ContentCol).as[String].collect().toSeq
      .flatMap(c => Interp.run(prog, c)).sorted
    assert(got == want,
      s"compiled vs interpreted divergence for:\n$src\ncompiled=${got.take(3)}\ninterp=${want.take(3)}")
  }

  test("differential: field assignments, string methods, filter-deletes") {
    differential("""
      root.okey = this.k
      root.flag = this.s.lowercase()
      root = if this.n < 100 { deleted() }
    """)
    differential("""
      root.up = this.s.uppercase()
      root.t = this.s.trim()
      root.tp = this.s.trim_prefix("alpha")
      root.ts = this.s.trim_suffix("Two")
      root.hp = this.s.has_prefix("alpha")
      root.hs = this.s.has_suffix("g")
    """)
    differential("""
      root.c = this.s.contains("a")
      root.i = this.s.index_of("e")
      root.r = this.s.replace_all("a", "@")
      root.m = this.s.re_match("^[a-z]+ ")
      root.rr = this.s.re_replace_all("[aeiou]", "_")
      root.parts = this.s.split(";")
      root.len = this.s.length()
    """)
  }

  test("differential: arithmetic, comparisons, logic, null handling") {
    differential("""
      root.sum = this.k + this.n
      root.prod = this.k * 2
      root.mod = this.n % 7
      root.big = this.n > 50 && this.b
      root.or2 = this.n < 5 || !this.b
      root.cat = this.s + "_" + this.k.string()
    """)
    differential("""
      root.isnull = this.mn == null
      root.notnull = this.mn != null
      root.pipe = this.mn | "fallback"
      root.orv = this.mn.or("x")
      root.cv = this.mn.catch("y")
    """)
    differential("""
      root.eq = this.s == "alpha one"
      root.ne = this.k != 3
      root.cmp = this.s < "m"
      root.numeq = this.k == 1.0
    """)
  }

  test("differential: if/else, match, let bindings, json() paths") {
    differential("""
      root.cls = if this.n > 100 { "big" } else { "small" }
      root.v = if this.b { this.k } else { 0 - this.k }
    """)
    differential("""
      root.m = match this.s {
        "alpha one" => "A",
        "Beta Two" => "B",
        _ => "other"
      }
    """)
    differential("""
      let low = this.s.lowercase()
      root.a = $low + "_z"
      root.k2 = json("k")
    """)
  }

  test("differential: whole-root forms (this, scalar, object literal, deletes)") {
    // `root = this` only compiles for schemas whose re-marshal is exact —
    // no float kinds (fixture has `d: double`), so use a narrowed frame
    val noDouble = fixture.drop("d")
    differential("root = this", noDouble)
    differential("root = this\nroot = if this.k == 2 { deleted() }", noDouble)
    differential("root = this.s.uppercase()")
    differential("root = this.k") // long scalar → raw string content
    differential("""root = {"a": this.k, "b": "x", "c": this.b}""")
    differential("root.x = this.k\nroot.y = this.s\nroot.x = deleted()")
    differential("root.keep = this.k\nroot.keep = this.s") // overwrite keeps last
  }

  test("untranslatable constructs bail to the interpreter (None)") {
    val bails = Seq(
      "root.u = uuid_v4()", // non-deterministic function
      "root.c = this.s.capitalize()", // word-split semantics
      "meta x = this.s", // metadata write
      "root.d = this.d", // double output field (Go float formatting)
      "root.a.b = this.k", // nested path
      "root.x = if this.b { this.k }", // dynamic field absence
      "map f { root = this }\nroot = this.apply(\"f\")") // named maps
    for (src <- bails) {
      val prog = Bloblang.parse(src)
      assert(Compile.tryCompile(prog, fixture.schema).isEmpty, s"should NOT compile: $src")
    }
    // `root = this` must refuse schemas whose re-marshal isn't exact
    val dblSchema = Seq((1.0, "x")).toDF("d", "s").schema
    assert(Compile.tryCompile(Bloblang.parse("root = this"), dblSchema).isEmpty)
  }

  test("config pipeline over parquet: filter pushes to the scan, no UDF in plan") {
    val dir = java.nio.file.Files.createTempDirectory("blcomp").toFile
    dir.deleteOnExit()
    fixture.write.mode("overwrite").parquet(dir.getPath + "/t.parquet")
    val cfg = s"""
input:
  parquet:
    path: ${dir.getPath}/t.parquet
pipeline:
  processors:
    - mapping: |
        root.okey = this.k
        root.flag = this.s.lowercase()
        root = if this.n < 100 { deleted() }
"""
    val frame = graft.conn.PipelineConfig.load(cfg).frame(spark)
    val plan = frame.queryExecution.executedPlan.toString
    // predicate reached the parquet reader: n >= 100 (or-null keeps the
    // interpreter's row-kept-on-error contract for null n)
    val compact = plan.replaceAll("\\s", "")
    assert(compact.contains("PushedFilters:[") && !compact.contains("PushedFilters:[]"),
      s"filter on n not pushed:\n$plan")
    assert(compact.contains("GreaterThanOrEqual(n,100)"), s"filter on n not pushed:\n$plan")
    // column pruning: only k/n/s are read — d/b/arr/mn never hit the scan
    val readSchema = "ReadSchema: struct<([^>]*)>".r
      .findFirstMatchIn(plan).map(_.group(1)).getOrElse("")
    assert(readSchema.split(",").map(_.takeWhile(_ != ':')).toSet == Set("k", "n", "s"),
      s"scan reads pruned columns: $readSchema")
    // the whole mapping is native Catalyst — no interpreter UDF anywhere
    assert(!plan.contains("UDF"), s"opaque UDF survived compilation:\n$plan")
    // and the result is still correct
    val got = frame.select(get_json_object(col(Msg.ContentCol), "$.okey").cast("long"))
      .as[Long].collect().toSet
    assert(got == Set(2L)) // only n=120 survives n<100 delete
  }

  test("per-processor fallback: uncompilable step seals the envelope, result stays correct") {
    val dir = java.nio.file.Files.createTempDirectory("blcomp2").toFile
    dir.deleteOnExit()
    fixture.write.mode("overwrite").parquet(dir.getPath + "/t.parquet")
    val cfg = s"""
input:
  parquet:
    path: ${dir.getPath}/t.parquet
pipeline:
  processors:
    - mapping: |
        root.k = this.k
        root.s = this.s
        root = if this.n < 50 { deleted() }
    - mapping: |
        root.k = this.k
        root.cap = this.s.capitalize()
"""
    val out = graft.conn.PipelineConfig.load(cfg).frame(spark)
      .select(get_json_object(col(Msg.ContentCol), "$.k").cast("long").as("k"),
        get_json_object(col(Msg.ContentCol), "$.cap").as("cap"))
      .as[(Long, String)].collect().toMap
    // rows n>=50 survive: k=2 (s="Beta Two"), k=3 ("  padded  "), k=4 ("alpha;beta;g")
    assert(out.keySet == Set(2L, 3L, 4L))
    assert(out(2L) == "Beta Two") // capitalize keeps existing caps
    // first (compiled) stage still pushed its filter down
    val plan = graft.conn.PipelineConfig.load(cfg).frame(spark)
      .queryExecution.executedPlan.toString
    assert(plan.replaceAll("\\s", "").contains("GreaterThanOrEqual(n,50)"),
      s"compiled prefix lost pushdown:\n$plan")
  }
}
