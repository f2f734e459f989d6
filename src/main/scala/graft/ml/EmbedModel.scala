package graft.ml

import org.apache.spark.sql.{DataFrame, Dataset}

/** Checked-in feature-extraction (sentence-embedding) model — the
  * reference seam is `internal/impl/huggingface/
  * processor_feature_extraction.go:18` (an ONNX encoder session; no tensor
  * runtime exists in this container, so the model is REAL trained word
  * embeddings whose weights live in resources and whose training procedure
  * is reproducible code: [[EmbedTrain]] — PPMI + truncated SVD over a
  * deterministic topical corpus, the same provenance recipe as the
  * sentiment and NER models).
  *
  * Inference contract (replayed verbatim by the generated DuckDB oracle):
  *  - tokenize: split on whitespace, drop empties, lowercase;
  *  - sum the vectors of in-vocabulary tokens. Weights are QUANTIZED to
  *    integer multiples of 2^-20 with |x| < 8, so every partial sum is an
  *    exact dyadic rational far inside the double mantissa — addition is
  *    associative HERE and the sum is order-independent and bit-identical
  *    across runtimes (this is what lets a SQL GROUP BY replay it);
  *  - mean = sum / hits (one IEEE division), then L2-normalize with the
  *    norm accumulated in dimension order; zero hits → all-zero vector.
  */
object EmbedModel {

  val Dim = 8
  val Scale = 1048576L // 2^20: quantization denominator

  /** (vocab word → integer numerators m, vector = m / 2^20). */
  final case class Model(vecs: Map[String, Array[Long]]) {

    def embed(text: String): (Long, Array[Double]) = {
      val toks = text.split("\\s+").iterator.filter(_.nonEmpty).map(_.toLowerCase)
      val sum = new Array[Long](Dim) // exact integer arithmetic
      var hits = 0L
      for (t <- toks; v <- vecs.get(t)) {
        var i = 0
        while (i < Dim) { sum(i) += v(i); i += 1 }
        hits += 1
      }
      if (hits == 0L) return (0L, new Array[Double](Dim))
      val mean = sum.map(m => m.toDouble / Scale / hits)
      var nsq = 0.0
      var i = 0
      while (i < Dim) { nsq += mean(i) * mean(i); i += 1 } // dimension order
      val norm = math.sqrt(nsq)
      (hits, if (norm == 0.0) new Array[Double](Dim) else mean.map(_ / norm))
    }
  }

  /** Parse the TSV weight format: `word \t m0 \t ... \t m7` (integer
    * numerators — exact by construction, no float parsing). */
  def parse(lines: Iterator[String]): Model = {
    val vecs = Map.newBuilder[String, Array[Long]]
    for (ln <- lines if ln.nonEmpty && !ln.startsWith("#")) {
      val parts = ln.split("\t")
      require(parts.length == Dim + 1, s"embed tsv row arity ${parts.length}")
      vecs += parts(0) -> parts.drop(1).map(_.toLong)
    }
    Model(vecs.result())
  }

  /** The checked-in model (one parse per JVM). */
  lazy val default: Model = {
    val in = getClass.getResourceAsStream("/graft/nlp/embed_ppmi.tsv")
    require(in != null, "missing resource graft/nlp/embed_ppmi.tsv — run EmbedTrain")
    try parse(scala.io.Source.fromInputStream(in, "UTF-8").getLines())
    finally in.close()
  }

  final case class EmbedOut(doc_id: Long, n_hits: Long,
                            e0: Double, e1: Double, e2: Double, e3: Double,
                            e4: Double, e5: Double, e6: Double, e7: Double)

  /** Batched per-partition inference over (doc_id, text) rows — the
    * mapPartitions + model-init-once contract every encoder-shaped
    * processor uses (feature_extraction.go batches the same way). */
  def extract(docs: DataFrame): Dataset[EmbedOut] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select("doc_id", "text").as[(Long, String)].mapPartitions { rows =>
      val m = default // resource-cached per executor JVM
      rows.map { case (id, text) =>
        val (hits, e) = m.embed(if (text == null) "" else text)
        EmbedOut(id, hits, e(0), e(1), e(2), e(3), e(4), e(5), e(6), e(7))
      }
    }
  }

  /** Unit-norm anchor vector for a label: mean of its seed words' vectors
    * (exact quantized sum, same contract as [[Model.embed]]). */
  def labelVector(words: Seq[String]): Array[Double] = {
    val m = default
    val sum = new Array[Long](Dim)
    var hits = 0L
    for (w <- words; v <- m.vecs.get(w.toLowerCase)) {
      var i = 0
      while (i < Dim) { sum(i) += v(i); i += 1 }
      hits += 1
    }
    require(hits > 0, s"zero-shot label words all out of vocabulary: $words")
    val mean = sum.map(x => x.toDouble / Scale / hits)
    var nsq = 0.0
    var i = 0
    while (i < Dim) { nsq += mean(i) * mean(i); i += 1 }
    val norm = math.sqrt(nsq)
    mean.map(_ / norm)
  }

  final case class ZeroShotOut(doc_id: Long, label: String, score: Double)

  /** `nlp_zero_shot_classify` with REAL inference: cosine between the
    * document embedding and each label's anchor vector, first-wins argmax
    * in label order (processor_zero_shot_classification.go:18 — there an
    * NLI ONNX session; here the trained embedding space). Both vectors are
    * unit-norm so the dot product IS the cosine; accumulation runs in
    * dimension order, replayed exactly by [[zeroShotOracleSql]]. */
  def zeroShot(docs: DataFrame, labels: Seq[(String, Seq[String])]): Dataset[ZeroShotOut] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val anchors = labels.map { case (name, ws) => (name, labelVector(ws)) }
    docs.select("doc_id", "text").as[(Long, String)].mapPartitions { rows =>
      val m = default
      rows.map { case (id, text) =>
        val (_, e) = m.embed(if (text == null) "" else text)
        var bestLabel = anchors.head._1
        var best = Double.NegativeInfinity
        for ((name, a) <- anchors) {
          var s = 0.0
          var i = 0
          while (i < Dim) { s += e(i) * a(i); i += 1 }
          if (s > best) { best = s; bestLabel = name } // strict: first label wins ties
        }
        ZeroShotOut(id, bestLabel, if (best == Double.NegativeInfinity) 0.0 else best)
      }
    }
  }

  /** DuckDB oracle for [[zeroShot]] over `SELECT doc_id, text FROM
    * (innerSql)`: document unit vector via the embed CTEs, label anchors
    * inlined as exact double literals, dim-ordered dot products, CASE
    * argmax with first-wins ties. */
  def zeroShotOracleSql(innerSql: String, labels: Seq[(String, Seq[String])]): String = {
    val m = default
    val rows = m.vecs.toSeq.sortBy(_._1).map { case (w, v) =>
      s"('$w', ${v.mkString(", ")})"
    }.mkString(",\n           ")
    val sums = (0 until Dim).map(i => s"sum(v.m$i) AS s$i").mkString(", ")
    val means = (0 until Dim).map(i => s"(s$i / $Scale.0) / n AS m$i").mkString(", ")
    val normSq = (0 until Dim).map(i => s"m$i*m$i").mkString(" + ")
    val units = (0 until Dim).map(i =>
      s"CASE WHEN nrm = 0 THEN 0.0 ELSE m$i / nrm END AS u$i").mkString(",\n                ")
    val anchors = labels.map { case (name, ws) => (name, labelVector(ws)) }
    // Double.toString is the shortest repr that parses back to the same
    // double in any correctly-rounded reader (DuckDB included)
    val scores = anchors.zipWithIndex.map { case ((_, a), k) =>
      (0 until Dim).map(i => s"u$i*(${a(i)})").mkString(" + ") + s" AS sc$k"
    }.mkString(",\n              ")
    val argmax = anchors.indices.map { k =>
      val geAll = (k + 1 until anchors.size).map(j => s"sc$k >= sc$j")
      val gtPrev = (0 until k).map(j => s"sc$j < sc$k")
      val cond = (gtPrev ++ geAll).mkString(" AND ")
      if (cond.isEmpty) s"ELSE '${anchors(k)._1}'"
      else s"WHEN $cond THEN '${anchors(k)._1}'"
    }
    val bestScore = anchors.indices.map { k =>
      val geAll = (k + 1 until anchors.size).map(j => s"sc$k >= sc$j")
      val gtPrev = (0 until k).map(j => s"sc$j < sc$k")
      val cond = (gtPrev ++ geAll).mkString(" AND ")
      if (cond.isEmpty) s"ELSE sc$k" else s"WHEN $cond THEN sc$k"
    }
    s"""WITH docs AS ($innerSql),
       v(tok, ${(0 until Dim).map("m" + _).mkString(", ")}) AS (VALUES
           $rows),
       toks AS (
         SELECT doc_id, lower(unnest(string_split(text, ' '))) AS tok FROM docs),
       agg AS (
         SELECT t.doc_id, count(*)::BIGINT AS n, $sums
         FROM toks t JOIN v ON t.tok = v.tok
         GROUP BY t.doc_id),
       mm AS (SELECT doc_id, n, $means FROM agg),
       nm AS (SELECT doc_id, ${(0 until Dim).map("m" + _).mkString(", ")},
                sqrt($normSq) AS nrm FROM mm),
       uu AS (SELECT d.doc_id,
                ${(0 until Dim).map(i => s"COALESCE(u$i, 0.0) AS u$i").mkString(", ")}
              FROM docs d LEFT JOIN (SELECT doc_id, $units FROM nm) x USING (doc_id)),
       sc AS (SELECT doc_id,
              $scores
              FROM uu)
       SELECT doc_id,
         CASE ${argmax.mkString(" ")} END AS label,
         round(CASE ${bestScore.mkString(" ")} END, 6) AS score
       FROM sc"""
  }

  /** Generate the DuckDB oracle for `SELECT doc_id, text FROM (innerSql)`:
    * the same tokenize → vocab join → exact sum → mean → normalize → round
    * pipeline, emitted as SQL against the CHECKED-IN weights. */
  def oracleSql(innerSql: String): String = {
    val m = default
    val rows = m.vecs.toSeq.sortBy(_._1).map { case (w, v) =>
      s"('$w', ${v.mkString(", ")})"
    }.mkString(",\n           ")
    val sums = (0 until Dim).map(i => s"sum(v.m$i) AS s$i").mkString(", ")
    val means = (0 until Dim).map(i => s"(s$i / $Scale.0) / n AS m$i").mkString(", ")
    val normSq = (0 until Dim).map(i => s"m$i*m$i").mkString(" + ")
    val outs = (0 until Dim).map(i =>
      s"round(CASE WHEN nrm = 0 THEN 0.0 ELSE m$i / nrm END, 6) AS e$i").mkString(",\n         ")
    val zeros = (0 until Dim).map(i => s"0.0 AS e$i").mkString(", ")
    s"""WITH docs AS ($innerSql),
       v(tok, ${(0 until Dim).map("m" + _).mkString(", ")}) AS (VALUES
           $rows),
       toks AS (
         SELECT doc_id, lower(unnest(string_split(text, ' '))) AS tok FROM docs),
       agg AS (
         SELECT t.doc_id, count(*)::BIGINT AS n, $sums
         FROM toks t JOIN v ON t.tok = v.tok
         GROUP BY t.doc_id),
       m AS (SELECT doc_id, n, $means FROM agg),
       nm AS (SELECT doc_id, n, ${(0 until Dim).map("m" + _).mkString(", ")},
                sqrt($normSq) AS nrm FROM m)
       SELECT doc_id, n AS n_hits, $outs FROM nm
       UNION ALL
       SELECT d.doc_id, 0::BIGINT AS n_hits, $zeros
       FROM docs d LEFT JOIN agg USING (doc_id) WHERE agg.doc_id IS NULL"""
  }
}
