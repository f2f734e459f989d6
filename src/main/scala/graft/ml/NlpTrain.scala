package graft.ml

/** Reproducible trainer for [[NlpModel]] — full provenance for the
  * checked-in weights (no opaque binaries): a seeded synthetic sentiment
  * corpus + full-batch gradient-descent logistic regression. Re-running
  * `sbt "runMain graft.ml.NlpTrain"` regenerates
  * src/main/resources/graft/nlp/sentiment_lr.tsv byte-identically; the
  * NlpModelSpec determinism gate asserts resource == retrain output.
  */
object NlpTrain {

  val positives: Vector[String] = Vector(
    "excellent", "wonderful", "amazing", "delightful", "superb", "fantastic",
    "great", "love", "loved", "perfect", "brilliant", "enjoyable",
    "refreshing", "charming", "impressive", "satisfying", "smooth",
    "reliable", "friendly", "elegant")
  val negatives: Vector[String] = Vector(
    "terrible", "awful", "horrible", "disappointing", "broken", "worst",
    "hate", "hated", "defective", "useless", "frustrating", "annoying",
    "slow", "buggy", "crashed", "refund", "waste", "poor", "damaged",
    "misleading")
  val neutrals: Vector[String] = Vector(
    "the", "product", "arrived", "yesterday", "box", "color", "device",
    "manual", "battery", "screen", "order", "shipping", "package", "store",
    "price", "version", "update", "model", "size", "weight")

  /** Vocabulary in canonical (sorted) order — this order is the FP
    * accumulation order everywhere. */
  val vocab: Vector[String] = (positives ++ negatives ++ neutrals).sorted

  final case class Doc(text: String, label: Int)

  /** Seeded synthetic corpus: each doc mixes sentiment words with neutral
    * filler; 10% get one contradicting word (label noise the linear model
    * must shrug off). */
  def corpus(n: Int, seed: Long): Vector[Doc] = {
    val rnd = new scala.util.Random(seed)
    Vector.tabulate(n) { i =>
      val pos = i % 2 == 0
      val own = if (pos) positives else negatives
      val opp = if (pos) negatives else positives
      val nSent = 1 + rnd.nextInt(3)
      val nNeu = 3 + rnd.nextInt(6)
      val words = scala.collection.mutable.ArrayBuffer.empty[String]
      for (_ <- 0 until nSent) words += own(rnd.nextInt(own.length))
      for (_ <- 0 until nNeu) words += neutrals(rnd.nextInt(neutrals.length))
      if (rnd.nextInt(10) == 0) words += opp(rnd.nextInt(opp.length))
      val shuffled = rnd.shuffle(words)
      Doc(shuffled.mkString(" "), if (pos) 1 else 0)
    }
  }

  private def features(text: String): Array[Double] = {
    val toks = text.toLowerCase.replaceAll("[^a-z0-9]", " ").split(" +")
      .iterator.filter(_.nonEmpty).toSet
    vocab.iterator.map(w => if (toks(w)) 1.0 else 0.0).toArray
  }

  /** Full-batch GD (deterministic — no sampling, fixed iteration count). */
  def train(docs: Vector[Doc], iters: Int = 400, lr: Double = 2.0,
            l2: Double = 1e-3): NlpModel.Model = {
    val x = docs.map(d => features(d.text)).toArray
    val y = docs.map(_.label.toDouble).toArray
    val n = docs.length
    val dim = vocab.length
    val w = new Array[Double](dim)
    var b = 0.0
    for (_ <- 0 until iters) {
      val gw = new Array[Double](dim)
      var gb = 0.0
      for (i <- 0 until n) {
        var z = b
        val xi = x(i)
        for (j <- 0 until dim) z += w(j) * xi(j)
        val p = 1.0 / (1.0 + math.exp(-z))
        val d = p - y(i)
        gb += d
        for (j <- 0 until dim) gw(j) += d * xi(j)
      }
      b -= lr * gb / n
      for (j <- 0 until dim) w(j) -= lr * (gw(j) / n + l2 * w(j))
    }
    NlpModel.Model(b, vocab.zip(w.toVector))
  }

  def accuracy(m: NlpModel.Model, docs: Vector[Doc]): Double =
    docs.count(d => (m.logit(d.text) >= 0) == (d.label == 1)).toDouble / docs.length

  def render(m: NlpModel.Model): String =
    (s"__bias__\t${m.bias}" +: m.vocab.map { case (w, v) => s"$w\t$v" }).mkString("\n") + "\n"

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("src/main/resources/graft/nlp/sentiment_lr.tsv")
    val model = train(corpus(1200, seed = 42))
    val heldOut = corpus(400, seed = 4242)
    println(f"train-acc=${accuracy(model, corpus(1200, 42))}%.4f held-out-acc=${accuracy(model, heldOut)}%.4f")
    val p = java.nio.file.Paths.get(out)
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.writeString(p, render(model))
    println(s"wrote ${p.toAbsolutePath}")
  }
}
