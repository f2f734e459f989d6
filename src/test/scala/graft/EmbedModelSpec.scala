package graft

import graft.ml.{EmbedModel, EmbedTrain}

/** Feature-extraction embeddings (ml/EmbedModel.scala + EmbedTrain.scala;
  * reference seam processor_feature_extraction.go:18): provenance,
  * semantics and the exact-arithmetic contract the oracle relies on.
  */
class EmbedModelSpec extends SparkSpec {

  test("checked-in weights ARE the deterministic retrain output") {
    val res = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/graft/nlp/embed_ppmi.tsv"), "UTF-8").mkString
    assert(res == EmbedTrain.trainTsv(),
      "resource drifted from EmbedTrain — retrain with: sbt \"runMain graft.ml.EmbedTrain\"")
  }

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    val d = a.zip(b).map { case (x, y) => x * y }.sum
    val na = math.sqrt(a.map(x => x * x).sum)
    val nb = math.sqrt(b.map(x => x * x).sum)
    if (na == 0 || nb == 0) 0.0 else d / (na * nb)
  }

  test("semantic gate: within-topic similarity beats cross-topic by a margin") {
    val m = EmbedModel.default
    val topics = EmbedTrain.Topics.values.toVector
    def vec(w: String): Array[Double] = m.embed(w)._2
    val within = for {
      t <- topics; a <- t; b <- t if a < b
    } yield cos(vec(a), vec(b))
    val cross = for {
      (t1, i) <- topics.zipWithIndex; t2 <- topics.drop(i + 1)
      a <- t1.take(5); b <- t2.take(5)
    } yield cos(vec(a), vec(b))
    val (wAvg, cAvg) = (within.sum / within.size, cross.sum / cross.size)
    info(f"within-topic cosine $wAvg%.3f vs cross-topic $cAvg%.3f")
    assert(wAvg > cAvg + 0.3, f"embedding separation too weak: $wAvg%.3f vs $cAvg%.3f")
  }

  test("token-order invariance: quantized sums are exact, bit-identical") {
    val m = EmbedModel.default
    val words = EmbedTrain.Topics.values.flatten.take(20).toVector
    val fwd = m.embed(words.mkString(" "))
    val rev = m.embed(words.reverse.mkString(" "))
    assert(fwd._1 == rev._1)
    assert(fwd._2.sameElements(rev._2), "sum must be order-independent")
  }

  test("OOV-only and empty text embed to zeros with zero hits") {
    val m = EmbedModel.default
    for (t <- Seq("", "zzqx unknownword 12345", "   ")) {
      val (hits, e) = m.embed(t)
      assert(hits == 0L && e.forall(_ == 0.0), s"'$t'")
    }
  }

  test("unit norm for any in-vocab text") {
    val m = EmbedModel.default
    for (t <- Seq("rain", "market trade", "bread cheese apple soup", "rain market bread airport")) {
      val (_, e) = m.embed(t)
      assert(math.abs(e.map(x => x * x).sum - 1.0) < 1e-9, s"'$t'")
    }
  }

  test("zero-shot: dominant-topic texts classify 100% via embedding cosine") {
    val spark0 = spark
    import spark0.implicits._
    val labels = EmbedTrain.Topics.toSeq.sortBy(_._1).map { case (n, ws) => (n, ws.take(3)) }
    // 2:1 dominant mixes across every (dominant, minority) topic pair
    val topics = EmbedTrain.Topics.toSeq.sortBy(_._1)
    val docs = for {
      ((dn, dws), i) <- topics.zipWithIndex
      (mn, mws) <- topics if mn != dn
    } yield ((i * 10 + topics.indexWhere(_._1 == mn)).toLong,
      s"${dws(3)} ${dws(4)} ${dws(5)} ${mws(6)}", dn)
    val df = docs.map(d => (d._1, d._2)).toDF("doc_id", "text")
    val got = EmbedModel.zeroShot(df, labels).collect().map(r => r.doc_id -> r.label).toMap
    val wrong = docs.filter(d => got(d._1) != d._3)
    assert(wrong.isEmpty, s"misclassified: ${wrong.take(3)}")
  }

  test("zero-shot: zero-hit documents take the first label with score 0") {
    val spark0 = spark
    import spark0.implicits._
    val labels = EmbedTrain.Topics.toSeq.sortBy(_._1).map { case (n, ws) => (n, ws.take(3)) }
    val out = EmbedModel.zeroShot(Seq((9L, "zzqx 123")).toDF("doc_id", "text"), labels)
      .collect().head
    assert(out.label == labels.head._1 && out.score == 0.0)
  }

  test("extract: distributed inference matches driver-side embed") {
    import org.apache.spark.sql.functions._
    val spark0 = spark
    import spark0.implicits._
    val docs = Seq((1L, "rain storm cloud"), (2L, "profit loss bank zzz"), (3L, "qqq"))
      .toDF("doc_id", "text")
    val got = EmbedModel.extract(docs).collect().map(r => r.doc_id -> r).toMap
    val m = EmbedModel.default
    for ((id, text) <- Seq((1L, "rain storm cloud"), (2L, "profit loss bank zzz"), (3L, "qqq"))) {
      val (hits, e) = m.embed(text)
      assert(got(id).n_hits == hits)
      assert(got(id).e0 == e(0) && got(id).e7 == e(7))
    }
  }
}
