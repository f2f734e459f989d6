package graft

import graft.ml.{NerModel, NerTrain}
import org.scalatest.funsuite.AnyFunSuite

/** The trained token-classification model behind nlp_tokens
  * (ml/NerModel.scala): accuracy, provenance (resource == deterministic
  * retrain), and the weight-generated oracle SQL's structural parity —
  * the same gate battery as the sentiment model (NlpModelSpec). */
class NerModelSpec extends AnyFunSuite {

  test("checked-in weights reach >= 0.9 accuracy on a held-out corpus") {
    val heldOut = NerTrain.corpus(300, seed = 7007) // seed differs from training (7)
    val acc = NerTrain.accuracy(NerModel.default, heldOut)
    assert(acc >= 0.9, f"held-out accuracy $acc%.4f < 0.9")
  }

  test("resource weights are byte-identical to a deterministic retrain") {
    val retrained = NerTrain.render(NerTrain.train(NerTrain.corpus(800, seed = 7)))
    val in = getClass.getClassLoader.getResourceAsStream(NerModel.ResourcePath)
    val packaged = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    assert(packaged == retrained,
      "ner_lr.tsv drifted from NerTrain output — rerun `sbt \"runMain graft.ml.NerTrain\"`")
  }

  test("classification is a real forward pass with working context features") {
    val m = NerModel.default
    assert(m.classify("Alice", null) == "PER") // gazetteer
    assert(m.classify("Paris", "from") == "LOC") // gazetteer + preposition
    assert(m.classify("Acme", null) == "ORG")
    assert(m.classify("12345", null) == "NUM")
    assert(m.classify("shipment", null) == "O")
    // initcap alone is NOT an entity (hard negative held during training)
    assert(m.classify("Shipment", null) == "O")
    // ...but the honorific left-context recovers an out-of-gazetteer name
    assert(m.classify("Novak", "Dr") == "PER")
    assert(m.classify("Novak", "the") == "O")
  }

  test("labelTokens threads left context across a document") {
    val got = NerModel.default.labelTokens("Dr Keller flew from Oslo to Acme Labs with 42 records")
    val labels = got.map(_._2).toSeq
    assert(got.map(_._1).toSeq == Seq("Dr", "Keller", "flew", "from", "Oslo",
      "to", "Acme", "Labs", "with", "42", "records"))
    assert(labels == Seq("O", "PER", "O", "O", "LOC", "O", "ORG", "ORG", "O", "NUM", "O"),
      s"got $labels")
  }

  test("oracle SQL embeds every class weight in model order") {
    val m = NerModel.default
    val sql = m.oracleSql("SELECT 1 AS doc_id, 'x' AS text")
    // same shortest-round-trip rule as the generator
    def fmt(d: Double) = { val s = d.toString; if (s.contains('E')) f"$d%.17e" else s }
    for (k <- NerModel.Classes.indices) {
      assert(sql.contains(s"AS z$k"), s"missing logit for class $k")
      assert(sql.contains(fmt(m.biases(k))), s"missing bias of class $k")
      val idxs = m.weights(k).map(w => sql.indexOf(s"(${fmt(w)}) * f"))
      assert(idxs.forall(_ >= 0), s"missing weights of class $k in generated oracle")
    }
    // argmax tie-break order is the class order
    assert(sql.indexOf("THEN 'PER'") < sql.indexOf("THEN 'LOC'"))
    assert(sql.indexOf("THEN 'NUM'") < sql.indexOf("ELSE 'O'"))
  }
}
