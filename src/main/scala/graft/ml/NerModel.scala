package graft.ml

/** Checked-in token-classification (NER) model: multinomial logistic
  * regression over deterministic token-shape + gazetteer + left-context
  * features (reference seam: internal/impl/huggingface/
  * processor_token_classification.go:18 — there an ONNX session; no tensor
  * runtime exists in this container, so the model is a REAL trained linear
  * model whose weights live in resources and whose training procedure is
  * reproducible code: see [[NerTrain]] — the same provenance recipe as the
  * sentiment model [[NlpModel]]).
  *
  * Inference contract (replayed verbatim by the generated DuckDB oracle):
  *  - tokenize: split on whitespace, drop empties, keep casing;
  *  - per token: 10 binary features (below) over (token, previous token);
  *  - z_k = bias_k + Σ w_k,i · f_i accumulated IN FEATURE ORDER
  *    (fixed fold order ⇒ bit-identical doubles across runtimes);
  *  - label = first class in [[Classes]] order whose z is ≥ all later
  *    ones (deterministic argmax tie-break).
  */
object NerModel {

  /** Class order IS the argmax tie-break order. */
  val Classes: Vector[String] = Vector("PER", "LOC", "ORG", "NUM", "O")

  // Gazetteers are part of the feature definition (public-knowledge toy
  // lists, not licensed data). Lowercase canonical forms.
  val PerGaz = Vector("alice", "bob", "carol", "david", "erika", "frank",
    "grace", "henry", "irene", "jack", "karen", "liam")
  val LocGaz = Vector("paris", "london", "tokyo", "berlin", "madrid",
    "oslo", "cairo", "lima", "quito", "dublin")
  val OrgGaz = Vector("acme", "globex", "initech", "umbrella", "stark",
    "wayne", "cyberdyne", "tyrell")
  val OrgSuffix = Vector("inc", "corp", "ltd", "gmbh", "labs")
  val Honorifics = Vector("mr", "mrs", "dr", "prof")
  val LocPreps = Vector("in", "at", "from", "near")

  val FeatureNames: Vector[String] = Vector(
    "initcap", "alldigit", "somedigit", "allcaps",
    "per_gaz", "loc_gaz", "org_gaz", "org_suffix",
    "prev_honorific", "prev_prep")

  /** The 10 binary features for one (token, prev-token) pair. prev is null
    * at index 0. Order matches [[FeatureNames]] and the SQL twin. */
  def features(tok: String, prev: String): Array[Double] = {
    val lt = tok.toLowerCase
    val lp = if (prev == null) "" else prev.toLowerCase
    Array(
      if (tok.matches("^[A-Z].*")) 1.0 else 0.0,
      if (tok.matches("^[0-9]+$")) 1.0 else 0.0,
      if (tok.matches(".*[0-9].*") && !tok.matches("^[0-9]+$")) 1.0 else 0.0,
      if (tok.matches("^[A-Z]{2,}$")) 1.0 else 0.0,
      if (PerGaz.contains(lt)) 1.0 else 0.0,
      if (LocGaz.contains(lt)) 1.0 else 0.0,
      if (OrgGaz.contains(lt)) 1.0 else 0.0,
      if (OrgSuffix.contains(lt)) 1.0 else 0.0,
      if (Honorifics.contains(lp)) 1.0 else 0.0,
      if (LocPreps.contains(lp)) 1.0 else 0.0)
  }

  /** SQL twins of [[features]], same order, over columns `tok`/`prev`. */
  private def featureSql: Vector[String] = {
    def inList(c: String, xs: Vector[String]) =
      s"lower($c) IN (${xs.map(x => s"'$x'").mkString(", ")})"
    Vector(
      "regexp_matches(tok, '^[A-Z]')",
      "regexp_matches(tok, '^[0-9]+$')",
      "regexp_matches(tok, '[0-9]') AND NOT regexp_matches(tok, '^[0-9]+$')",
      "regexp_matches(tok, '^[A-Z]{2,}$')",
      inList("tok", PerGaz),
      inList("tok", LocGaz),
      inList("tok", OrgGaz),
      inList("tok", OrgSuffix),
      inList("prev", Honorifics),
      inList("prev", LocPreps)
    ).map(cond => s"CASE WHEN $cond THEN 1.0 ELSE 0.0 END")
  }

  final case class Model(biases: Vector[Double], weights: Vector[Vector[Double]]) {
    require(biases.length == Classes.length &&
      weights.forall(_.length == FeatureNames.length))

    def logits(tok: String, prev: String): Array[Double] = {
      val f = features(tok, prev)
      Array.tabulate(Classes.length) { k =>
        var z = biases(k)
        val w = weights(k)
        var i = 0
        while (i < f.length) { z += w(i) * f(i); i += 1 } // fixed fold order
        z
      }
    }

    /** First class (in Classes order) whose logit is ≥ every later one. */
    def classify(tok: String, prev: String): String = {
      val z = logits(tok, prev)
      var best = 0
      var k = 1
      while (k < z.length) { if (z(k) > z(best)) best = k; k += 1 }
      Classes(best)
    }

    /** Label every whitespace token of a document, left context threaded. */
    def labelTokens(text: String): Array[(String, String)] = {
      val toks = if (text == null) Array.empty[String]
        else text.split("\\s+").filter(_.nonEmpty)
      var prev: String = null
      toks.map { t => val l = classify(t, prev); prev = t; (t, l) }
    }

    /** DuckDB SQL replaying this exact model over a CTE `docs(doc_id,
      * text)` — generated from the weights so gate parity is by
      * construction. Output: (doc_id, idx, token, label). */
    def oracleSql(docsCte: String): String = {
      val fs = featureSql.zipWithIndex
        .map { case (sql, i) => s"$sql AS f$i" }.mkString(",\n             ")
      val zs = Classes.indices.map { k =>
        val terms = weights(k).zipWithIndex
          .map { case (w, i) => s"+ (${fmt(w)}) * f$i" }.mkString(" ")
        s"(${fmt(biases(k))}) $terms AS z$k"
      }.mkString(",\n             ")
      // first-wins argmax in Classes order, mirroring classify()'s strict->
      val arg = Classes.indices.init.map { k =>
        val geAll = (k + 1 until Classes.length).map(j => s"z$k >= z$j").mkString(" AND ")
        s"WHEN $geAll THEN '${Classes(k)}'"
      }.mkString("\n             ")
      s"""WITH docs AS ($docsCte),
         tk0 AS (
           SELECT doc_id, list_filter(string_split_regex(text, '\\s+'),
             t -> length(t) > 0) AS toks
           FROM docs),
         tk AS (
           SELECT doc_id, (u.i - 1)::INTEGER AS idx, u.t AS tok,
             lag(u.t) OVER (PARTITION BY doc_id ORDER BY u.i) AS prev
           FROM tk0, unnest(list_transform(toks,
             (t, i) -> struct_pack(i := i, t := t))) AS s(u)),
         feat AS (
           SELECT doc_id, idx, tok,
             $fs
           FROM tk),
         zz AS (
           SELECT doc_id, idx, tok,
             $zs
           FROM feat)
         SELECT doc_id, idx, tok AS token,
           CASE $arg
                ELSE '${Classes.last}' END AS label
         FROM zz"""
    }
  }

  private def fmt(d: Double): String = {
    val s = d.toString
    if (s.contains('E')) f"$d%.17e" else s
  }

  val ResourcePath = "graft/nlp/ner_lr.tsv"

  /** TSV: `#classes` and `#features` header lines (validated), then one
    * `class<TAB>bias<TAB>w0..w9` line per class, file order = Classes. */
  def parse(lines: Iterator[String]): Model = {
    val rows = lines.filter(_.nonEmpty).toVector
    require(rows.length == Classes.length + 2, s"ner weights: want ${Classes.length + 2} lines")
    require(rows(0) == "#classes\t" + Classes.mkString("\t"), "ner weights: class header mismatch")
    require(rows(1) == "#features\t" + FeatureNames.mkString("\t"), "ner weights: feature header mismatch")
    val parsed = rows.drop(2).map { l =>
      val parts = l.split('\t')
      (parts(0), parts(1).toDouble, parts.drop(2).map(_.toDouble).toVector)
    }
    require(parsed.map(_._1) == Classes, "ner weights: class row order mismatch")
    Model(parsed.map(_._2), parsed.map(_._3))
  }

  /** JVM-wide cached model (one classpath load per executor). */
  lazy val default: Model = {
    val in = getClass.getClassLoader.getResourceAsStream(ResourcePath)
    require(in != null, s"missing resource $ResourcePath — run `sbt \"runMain graft.ml.NerTrain\"`")
    try parse(scala.io.Source.fromInputStream(in, "UTF-8").getLines())
    finally in.close()
  }
}
