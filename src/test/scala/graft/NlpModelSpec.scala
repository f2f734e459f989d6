package graft

import graft.ml.{NlpModel, NlpTrain}
import org.scalatest.funsuite.AnyFunSuite

/** The trained sentiment model behind nlp_classify (ml/NlpModel.scala):
  * accuracy, provenance (resource == deterministic retrain), and the
  * weight-generated oracle SQL's structural parity. */
class NlpModelSpec extends AnyFunSuite {

  test("checked-in weights reach >= 0.9 accuracy on a held-out corpus") {
    val heldOut = NlpTrain.corpus(400, seed = 4242) // seed differs from training (42)
    val acc = NlpTrain.accuracy(NlpModel.default, heldOut)
    assert(acc >= 0.9, f"held-out accuracy $acc%.4f < 0.9")
  }

  test("resource weights are byte-identical to a deterministic retrain") {
    val retrained = NlpTrain.render(NlpTrain.train(NlpTrain.corpus(1200, seed = 42)))
    val in = getClass.getClassLoader.getResourceAsStream(NlpModel.ResourcePath)
    val packaged = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    assert(packaged == retrained,
      "sentiment_lr.tsv drifted from NlpTrain output — rerun `sbt \"runMain graft.ml.NlpTrain\"`")
  }

  test("classify is a real forward pass: flipping a learned word flips the logit") {
    val m = NlpModel.default
    val (posLabel, posScore) = m.classify("the excellent wonderful device arrived")
    val (negLabel, negScore) = m.classify("the broken awful device arrived")
    assert(posLabel == "POSITIVE" && negLabel == "NEGATIVE")
    assert(posScore > 0 && negScore < 0)
    // neutral filler alone carries ~no signal
    val (_, neuScore) = m.classify("the device arrived yesterday box")
    assert(math.abs(neuScore) < math.abs(posScore))
  }

  test("oracle SQL embeds every vocab weight in model order") {
    val sql = NlpModel.default.oracleSql("documents", "doc_id", "text")
    val words = NlpModel.default.vocab.map(_._1)
    val idxs = words.map(w => sql.indexOf(s"'% $w %'"))
    assert(idxs.forall(_ >= 0), "missing vocab terms in generated oracle")
    assert(idxs == idxs.sorted, "oracle term order differs from model accumulation order")
    assert(sql.contains(NlpModel.default.bias.toString))
  }
}
