package graft.llm

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The distilled quality classifier: training determinism, separation in
  * the teacher rule's direction, and the written-model serve path. */
class ClassifierSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("training is deterministic and the model table is self-contained") {
    val docs = graft.Tables.documents(spark, dir)
    val m1 = Classifier.logregTrain(docs, rounds = 5).collect().map(_.toSeq)
    val m2 = Classifier.logregTrain(docs, rounds = 5).collect().map(_.toSeq)
    assert(m1.toSeq === m2.toSeq)
    assert(m1.length === Classifier.NumFeatures)
    // bias row carries the identity standardization; every non-bias row a
    // real (mu, sd) — the table alone defines the feature space
    assert(m1.head(2) === 0L && m1.head(3) === 1000000L)
    assert(m1.tail.forall(r => r(3).asInstanceOf[Long] > 0L))
  }

  test("the smooth score separates in the teacher rule's direction") {
    val docs = graft.Tables.documents(spark, dir)
    val model = Classifier.logregTrain(docs, rounds = 5)
    val scored = Classifier.logregScore(docs, model)
    val means = scored.groupBy("y")
      .agg(avg(col("s_micro").cast("double")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(means.contains(0L) && means.contains(1L))
    // docs the rule passes must score higher ON AVERAGE than docs it
    // fails — distillation learned the gate's direction, not a constant
    assert(means(1L) > means(0L) + 50000.0,
      s"no separation: pass=${means(1L)} fail=${means(0L)}")
  }

  test("extended features beat the base model on the held-out splits (the q146 gate)") {
    // The feature extension (rep-2gram, hashed char-3-gram distinct
    // ratio, stopword ratio) is gated on generalization, not in-sample
    // fit: train both models on the cluster-safe train split, score the
    // full corpus, and require the extension to win on the HELD-OUT
    // (val+test) agreement and to not lose on held-out AUC. The whole
    // chain is deterministic, so this is an exact pin, not a flaky
    // statistical test.
    val docs = graft.Tables.documents(spark, dir)
    val split = graft.llm.LlmQueries.clusterSafeSplitAssign(spark, dir)
      .select("doc_id", "split")
    val train = docs.join(split.filter(col("split") === "train"),
      Seq("doc_id"), "left_semi")
    def heldout(nf: Int): Map[String, (Long, Long, Long)] =
      Classifier.heldoutReport(
        Classifier.scoreFrame(docs,
            Classifier.logregTrain(train, rounds = 5, nf = nf), nf = nf)
          .join(split, "doc_id"))
        .collect().map(r => r.getAs[String]("split") ->
          ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_agree"),
            r.getAs[Long]("auc_micro")))).toMap
    val base = heldout(Classifier.NumFeatures)
    val ext = heldout(Classifier.NumFeaturesExt)
    val splits = Seq("val", "test")
    assert(splits.forall(s => base.contains(s) && ext.contains(s)),
      s"missing splits: base=${base.keySet} ext=${ext.keySet}")
    val baseAgree = splits.map(base(_)._2).sum
    val extAgree = splits.map(ext(_)._2).sum
    assert(extAgree > baseAgree,
      s"extension did not improve held-out agreement: $baseAgree -> $extAgree")
    assert(splits.forall(s => ext(s)._3 >= base(s)._3),
      s"extension lost held-out AUC: base=$base ext=$ext")
  }

  test("scoring from a WRITTEN model table equals the inline model") {
    val docs = graft.Tables.documents(spark, dir)
    val tmp = java.nio.file.Files.createTempDirectory("graft_qcls").toString
    Classifier.logregTrain(docs, rounds = 5)
      .write.mode("overwrite").parquet(s"$tmp/model")
    val viaTable = Classifier.logregScore(docs,
      spark.read.parquet(s"$tmp/model")).collect().map(_.toSeq)
    val inline = Classifier.logregScore(docs,
      Classifier.logregTrain(docs, rounds = 5)).collect().map(_.toSeq)
    // integer micros round-trip parquet exactly — the shipped model is
    // bit-identical to the in-session one
    assert(viaTable.toSeq === inline.toSeq && viaTable.nonEmpty)
  }

  test("retrainClassifierAfterTakedown == a fresh train on the surviving " +
      "corpus (gradients have no row-level inverse; the delete tier IS " +
      "the retrain)") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val victims = docs.filter(org.apache.spark.sql.functions.col("doc_id")
      % 11 === 5).select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(victims.nonEmpty)
    val retrained = Classifier.retrainClassifierAfterTakedown(
      docs, victims, rounds = 3).collect().map(_.toSeq).toSeq
    val fresh = Classifier.logregTrain(
      docs.filter(!org.apache.spark.sql.functions.col("doc_id")
        .isin(victims: _*)), rounds = 3).collect().map(_.toSeq).toSeq
    assert(retrained === fresh && retrained.nonEmpty)
    // and the weights actually moved vs the victim-inclusive model
    val full = Classifier.logregTrain(docs, rounds = 3)
      .collect().map(_.toSeq).toSeq
    assert(full !== fresh)
  }
}
