package graft.ml

/** Reproducible trainer for [[EmbedModel]] — full provenance for the
  * checked-in weights (no opaque binaries): a seeded topical corpus →
  * windowed co-occurrence → PPMI → truncated SVD by deterministic power
  * iteration → 2^-20 quantization. Re-running
  * `sbt "runMain graft.ml.EmbedTrain"` regenerates
  * src/main/resources/graft/nlp/embed_ppmi.tsv byte-identically; the
  * EmbedModelSpec determinism gate asserts resource == retrain output.
  *
  * PPMI + SVD is the classical count-based embedding method (public
  * literature: Levy & Goldberg 2014 showed it matches word2vec's implicit
  * factorization) — small, deterministic, and real: the semantic gate in
  * EmbedModelSpec checks that within-topic similarity beats cross-topic.
  */
object EmbedTrain {
  import EmbedModel.{Dim, Scale}

  val Topics: Map[String, Vector[String]] = Map(
    "weather" -> Vector("rain", "storm", "cloud", "wind", "snow",
      "forecast", "cold", "thunder", "drizzle", "frost"),
    "finance" -> Vector("market", "stock", "price", "trade", "profit",
      "loss", "bank", "invest", "dividend", "ledger"),
    "food" -> Vector("bread", "cheese", "apple", "soup", "dinner",
      "cook", "taste", "meal", "spice", "butter"),
    "travel" -> Vector("airport", "journey", "ticket", "hotel",
      "luggage", "passport", "voyage", "tourist", "harbor", "railway"))

  private val fillers = Vector("the", "a", "of", "and", "with", "for")

  /** Seeded corpus: each sentence draws 5-8 words from ONE topic with
    * interleaved fillers — co-occurrence concentrates within topics. */
  def corpus(nSentences: Int, seed: Long): Vector[Vector[String]] = {
    val rnd = new scala.util.Random(seed)
    val topicKeys = Topics.keys.toVector.sorted
    Vector.tabulate(nSentences) { _ =>
      val words = Topics(topicKeys(rnd.nextInt(topicKeys.length)))
      val n = 5 + rnd.nextInt(4)
      Vector.tabulate(n) { _ =>
        if (rnd.nextInt(5) == 0) fillers(rnd.nextInt(fillers.length))
        else words(rnd.nextInt(words.length))
      }
    }
  }

  /** Symmetric windowed co-occurrence → PPMI matrix over the vocab. */
  def ppmi(sentences: Seq[Vector[String]], window: Int): (Vector[String], Array[Array[Double]]) = {
    val vocab = sentences.flatten.distinct.sorted.toVector
    val index = vocab.zipWithIndex.toMap
    val n = vocab.length
    val c = Array.ofDim[Double](n, n)
    for (s <- sentences; i <- s.indices; d <- 1 to window; if i + d < s.length) {
      val (a, b) = (index(s(i)), index(s(i + d)))
      c(a)(b) += 1.0
      c(b)(a) += 1.0
    }
    val row = c.map(_.sum)
    val total = row.sum
    val m = Array.tabulate(n, n) { (i, j) =>
      if (c(i)(j) == 0.0 || row(i) == 0.0 || row(j) == 0.0) 0.0
      else math.max(0.0, math.log(c(i)(j) * total / (row(i) * row(j))))
    }
    (vocab, m)
  }

  /** Top-`k` eigenpairs of a symmetric matrix by power iteration with
    * deflation — fixed iteration count, LCG-seeded start vectors, sign
    * canonicalized (largest-|entry| positive): fully deterministic. */
  def topEigen(m: Array[Array[Double]], k: Int, iters: Int = 300): Seq[(Double, Array[Double])] = {
    val n = m.length
    val a = m.map(_.clone())
    var lcg = 0x2545F4914F6CDD1DL
    def nextUnit(): Array[Double] = {
      val v = Array.fill(n) {
        lcg = lcg * 6364136223846793005L + 1442695040888963407L
        ((lcg >>> 11).toDouble / (1L << 53).toDouble) - 0.5
      }
      val nm = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / nm)
    }
    def matVec(v: Array[Double]): Array[Double] =
      Array.tabulate(n)(i => { var s = 0.0; var j = 0; while (j < n) { s += a(i)(j) * v(j); j += 1 }; s })
    (0 until k).map { _ =>
      var v = nextUnit()
      for (_ <- 0 until iters) {
        val w = matVec(v)
        val nm = math.sqrt(w.map(x => x * x).sum)
        v = if (nm == 0.0) w else w.map(_ / nm)
      }
      val lambda = v.zip(matVec(v)).map { case (x, y) => x * y }.sum
      // canonical sign
      val imax = v.indices.maxBy(i => math.abs(v(i)))
      val s = if (v(imax) < 0) -1.0 else 1.0
      val vc = v.map(_ * s)
      // deflate: a -= lambda v v^T
      for (i <- 0 until n; j <- 0 until n) a(i)(j) -= lambda * vc(i) * vc(j)
      (lambda, vc)
    }
  }

  /** Train and render the TSV (word \t integer numerators, vector =
    * m / 2^20 — integers make the weights exact in every runtime). */
  def trainTsv(): String = {
    val (vocab, m) = ppmi(corpus(nSentences = 600, seed = 7L), window = 2)
    val eigs = topEigen(m, Dim)
    val sb = new StringBuilder
    sb ++= "# PPMI+SVD word embeddings - regenerate: sbt \"runMain graft.ml.EmbedTrain\"\n"
    for ((w, wi) <- vocab.zipWithIndex) {
      val vec = eigs.map { case (lambda, u) =>
        u(wi) * math.sqrt(math.max(lambda, 0.0))
      }
      val q = vec.map(x => math.max(-8 * Scale + 1,
        math.min(8 * Scale - 1, math.round(x * Scale))))
      sb ++= (w +: q.map(_.toString)).mkString("\t")
      sb += '\n'
    }
    sb.result()
  }

  def main(args: Array[String]): Unit = {
    val out = java.nio.file.Paths.get("src/main/resources/graft/nlp/embed_ppmi.tsv")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out, trainTsv().getBytes("UTF-8"))
    println(s"wrote $out")
  }
}
