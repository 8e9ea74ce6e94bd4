package graft.expr

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native IVF assignment kernel (r20) against two independent
  * spellings of the same ranking — the reference window plan it
  * ultimately replaced and the HOF fold — on randomized float vectors
  * including exact duplicates (sim ties → cell tie-break) and a zero
  * vector (NaN cosine → ranks first, the window's NaN-largest DESC
  * order). */
class NearestCellsSpec extends SparkSpec {
  import spark.implicits._

  private val rng = new scala.util.Random(11)
  private def vec(): Array[Float] = Array.fill(8)(rng.nextFloat() - 0.5f)

  // NOTE: no zero vector here — under ANSI mode (the session default)
  // 0/0 cosine THROWS in the reference window/HOF spellings, so a NaN sim
  // is unreachable in any passing query; the kernel's NaN→rank-first path
  // is exercised by its own test below.
  private val base = Seq.tabulate(40)(i => (i.toLong, vec(), i % 3))
  private val embs = {
    // duplicate a few vectors so sim ties exercise the cell tie-break
    val withDups = base ++ base.take(3).map { case (id, v, l) =>
      (id + 100L, v.clone(), l)
    }
    withDups.toDF("vec_id", "embedding", "label")
  }
  // centroids including one duplicated centroid (guaranteed sim tie)
  private val cents = {
    val cs = Seq.tabulate(7)(i => (i.toLong, vec().map(_.toDouble))) :+
      (7L, vec().map(_.toDouble))
    (cs :+ (8L, cs(2)._2.clone())).toDF("cell", "cent")
  }

  private def windowReference(maxProbes: Int) = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy("vec_id")
      .orderBy(col("sim").desc, col("cell").asc)
    embs.join(broadcast(cents))
      .select(col("vec_id"), col("cell"),
        graft.llm.Similarity.cosine(col("embedding"), col("cent")).as("sim"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= maxProbes)
      .select("vec_id", "cell", "__rn")
  }

  private def kernel(maxProbes: Int) = {
    val row = broadcast(cents.coalesce(1)
      .select(struct(col("cell"), col("cent"),
        sqrt(graft.llm.Similarity.dot(col("cent"), col("cent"))).as("cn"))
        .as("__c"))
      .agg(array_sort(collect_list(col("__c"))).as("__cents")))
    embs.crossJoin(row)
      .select(col("vec_id"),
        posexplode(NearestCells(col("embedding"), col("__cents"),
          maxProbes, withCent = false)).as(Seq("__p", "__sc")))
      .select(col("vec_id"), col("__sc").getField("cell").as("cell"),
        (col("__p") + 1).cast("int").as("__rn"))
  }

  for (p <- Seq(1, 2, 4))
    test(s"kernel == window reference at maxProbes=$p (ties, NaN, dups)") {
      val got = kernel(p).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted
      val want = windowReference(p).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted
      assert(got.length === want.length && got.sameElements(want))
    }

  test("zero vector: NaN cosine ranks FIRST (the window's NaN-largest DESC order), cell tie-break") {
    val zero = Seq((0L, Array.fill(8)(0.0f), 0)).toDF("vec_id", "embedding", "label")
    val row = broadcast(cents.coalesce(1)
      .select(struct(col("cell"), col("cent"),
        sqrt(graft.llm.Similarity.dot(col("cent"), col("cent"))).as("cn"))
        .as("__c"))
      .agg(array_sort(collect_list(col("__c"))).as("__cents")))
    val got = zero.crossJoin(row)
      .select(posexplode(NearestCells(col("embedding"), col("__cents"), 2,
        withCent = false)).as(Seq("__p", "__sc")))
      .select(col("__sc").getField("cell")).collect().map(_.getLong(0))
    // every sim is NaN -> all tie -> cell ascending
    assert(got.toSeq === Seq(0L, 1L))
  }

  test("withCent carries the winning centroid exactly") {
    val row = broadcast(cents.coalesce(1)
      .select(struct(col("cell"), col("cent"),
        sqrt(graft.llm.Similarity.dot(col("cent"), col("cent"))).as("cn"))
        .as("__c"))
      .agg(array_sort(collect_list(col("__c"))).as("__cents")))
    val got = embs.crossJoin(row)
      .select(col("vec_id"),
        posexplode(NearestCells(col("embedding"), col("__cents"), 1,
          withCent = true)).as(Seq("__p", "__sc")))
      .select(col("vec_id"), col("__sc").getField("cell").as("cell"),
        col("__sc").getField("cent").as("cent"))
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getSeq[Double](2).toArray.toSeq)).toMap2
    val centMap = cents.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toSeq).toMap
    got.foreach { case (_, (cell, cent)) =>
      assert(centMap(cell) === cent)
    }
  }

  implicit private class Tuples3[A, B, C](xs: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = xs.map(t => t._1 -> (t._2, t._3)).toMap
  }
}
