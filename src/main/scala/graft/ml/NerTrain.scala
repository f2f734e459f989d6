package graft.ml

/** Reproducible trainer for [[NerModel]] — full provenance for the
  * checked-in weights (no opaque binaries): a seeded synthetic
  * token-labelled corpus + full-batch gradient-descent softmax regression.
  * Re-running `sbt "runMain graft.ml.NerTrain"` regenerates
  * src/main/resources/graft/nlp/ner_lr.tsv byte-identically; the
  * NerModelSpec determinism gate asserts resource == retrain output.
  *
  * The corpus is built from the SAME gazetteers the feature extractor
  * uses, plus deliberate hard cases: sentence-initial capitalized filler
  * (initcap alone must not imply an entity) and out-of-gazetteer person
  * names that are only recoverable from the honorific left-context.
  */
object NerTrain {
  import NerModel._

  private val fillers = Vector("the", "quarterly", "report", "was", "filed",
    "before", "deadline", "shipment", "arrived", "with", "notes", "and",
    "records", "during", "review", "cycle", "on", "schedule")
  private val oovNames = Vector("smithers", "quintero", "ybarra", "novak",
    "keller", "brandt")

  private def cap(s: String): String = s.head.toUpper + s.tail

  final case class Tok(tok: String, prev: String, label: String)

  /** Seeded synthetic corpus of (token, prev, label) rows. */
  def corpus(nSentences: Int, seed: Long): Vector[Tok] = {
    val rnd = new scala.util.Random(seed)
    val out = Vector.newBuilder[Tok]
    for (_ <- 0 until nSentences) {
      val words = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      val nSeg = 2 + rnd.nextInt(3)
      for (_ <- 0 until nSeg) rnd.nextInt(5) match {
        case 0 => // person, honorific-led half the time
          if (rnd.nextBoolean()) {
            words += ((cap(Honorifics(rnd.nextInt(Honorifics.length))), "O"))
            // a third of honorific-led names are OOV: only the context
            // feature can recover these
            if (rnd.nextInt(3) == 0)
              words += ((cap(oovNames(rnd.nextInt(oovNames.length))), "PER"))
            else words += ((cap(PerGaz(rnd.nextInt(PerGaz.length))), "PER"))
          } else words += ((cap(PerGaz(rnd.nextInt(PerGaz.length))), "PER"))
        case 1 => // location, preposition-led most of the time
          if (rnd.nextInt(10) < 6)
            words += ((LocPreps(rnd.nextInt(LocPreps.length)), "O"))
          words += ((cap(LocGaz(rnd.nextInt(LocGaz.length))), "LOC"))
        case 2 => // organization, suffixed half the time
          words += ((cap(OrgGaz(rnd.nextInt(OrgGaz.length))), "ORG"))
          if (rnd.nextBoolean())
            words += ((cap(OrgSuffix(rnd.nextInt(OrgSuffix.length))), "ORG"))
        case 3 => // number
          words += (((1 + rnd.nextInt(99999)).toString, "NUM"))
        case _ => // filler run; 20% start capitalized (hard negative)
          val n = 1 + rnd.nextInt(3)
          for (j <- 0 until n) {
            val w = fillers(rnd.nextInt(fillers.length))
            words += ((if (j == 0 && rnd.nextInt(5) == 0) cap(w) else w, "O"))
          }
      }
      var prev: String = null
      words.foreach { case (w, l) => out += Tok(w, prev, l); prev = w }
    }
    out.result()
  }

  /** Full-batch GD softmax regression (deterministic — no sampling,
    * fixed iteration count, fixed accumulation order). */
  def train(toks: Vector[Tok], iters: Int = 300, lr: Double = 1.0,
            l2: Double = 1e-3): Model = {
    val k = Classes.length
    val dim = FeatureNames.length
    val x = toks.map(t => features(t.tok, t.prev)).toArray
    val y = toks.map(t => Classes.indexOf(t.label)).toArray
    val n = toks.length
    val w = Array.fill(k)(new Array[Double](dim))
    val b = new Array[Double](k)
    for (_ <- 0 until iters) {
      val gw = Array.fill(k)(new Array[Double](dim))
      val gb = new Array[Double](k)
      for (i <- 0 until n) {
        val xi = x(i)
        val z = new Array[Double](k)
        var zmax = Double.NegativeInfinity
        for (c <- 0 until k) {
          var s = b(c)
          for (j <- 0 until dim) s += w(c)(j) * xi(j)
          z(c) = s
          if (s > zmax) zmax = s
        }
        var sum = 0.0
        for (c <- 0 until k) { z(c) = math.exp(z(c) - zmax); sum += z(c) }
        for (c <- 0 until k) {
          val p = z(c) / sum
          val d = p - (if (y(i) == c) 1.0 else 0.0)
          gb(c) += d
          for (j <- 0 until dim) gw(c)(j) += d * xi(j)
        }
      }
      for (c <- 0 until k) {
        b(c) -= lr * gb(c) / n
        for (j <- 0 until dim) w(c)(j) -= lr * (gw(c)(j) / n + l2 * w(c)(j))
      }
    }
    Model(b.toVector, w.map(_.toVector).toVector)
  }

  def accuracy(m: Model, toks: Vector[Tok]): Double =
    toks.count(t => m.classify(t.tok, t.prev) == t.label).toDouble / toks.length

  def render(m: Model): String = {
    val header = Seq(
      "#classes\t" + Classes.mkString("\t"),
      "#features\t" + FeatureNames.mkString("\t"))
    val rows = Classes.indices.map { c =>
      (Classes(c) +: (m.biases(c) +: m.weights(c)).map(_.toString)).mkString("\t")
    }
    (header ++ rows).mkString("\n") + "\n"
  }

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("src/main/resources/graft/nlp/ner_lr.tsv")
    val model = train(corpus(800, seed = 7))
    val heldOut = corpus(300, seed = 7007)
    println(f"train-acc=${accuracy(model, corpus(800, 7))}%.4f " +
      f"held-out-acc=${accuracy(model, heldOut)}%.4f")
    val p = java.nio.file.Paths.get(out)
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.writeString(p, render(model))
    println(s"wrote ${p.toAbsolutePath}")
  }
}
