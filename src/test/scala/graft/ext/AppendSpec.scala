package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins the stored-PQ-index append contract
  * ([[Similarity.appendToPqIndex]]): appending never refits and never
  * rewrites — existing code rows are bit-identical pre/post append —
  * and appends COMPOSE: two split appends produce the same index
  * state (and the same probe results) as the one-shot append, because
  * every batch is encoded with the same frozen codebooks and parquet
  * append only adds files under the label partitions. */
class AppendSpec extends SparkSpec {
  import spark.implicits._

  private def codesOf(dir: String): Seq[(Long, Int, Int)] =
    spark.read.parquet(s"$dir/codes")
      .select($"vec_id", $"sub", $"cid")
      .as[(Long, Int, Int)].collect().sortBy(r => (r._1, r._2)).toSeq

  test("append freezes the fit: manifest codes are bit-identical " +
      "pre/post, split-appends equal the one-shot append, and the " +
      "probe serves appended vectors") {
    val emb = graft.Tables.embeddings(spark, sf0001)
    val manifest = emb.filter($"vec_id" % 10 =!= 0)
    val batch = emb.filter($"vec_id" % 10 === 0)
    val dir1 = java.nio.file.Files
      .createTempDirectory("graft_append1").toString
    val dir2 = java.nio.file.Files
      .createTempDirectory("graft_append2").toString
    try {
      Similarity.buildPqIndex(manifest, dir1, m = 16, kSub = 32,
        iters = 2, fitSampleMod = 4L)
      // identical second layout (same deterministic fit)
      Similarity.buildPqIndex(manifest, dir2, m = 16, kSub = 32,
        iters = 2, fitSampleMod = 4L)
      val before = codesOf(dir1)

      // one-shot append vs two split appends (even/odd batch halves)
      Similarity.appendToPqIndex(spark, dir1, batch)
      Similarity.appendToPqIndex(spark, dir2,
        batch.filter($"vec_id" % 20 === 0))
      Similarity.appendToPqIndex(spark, dir2,
        batch.filter($"vec_id" % 20 =!= 0))
      val after1 = codesOf(dir1)
      val after2 = codesOf(dir2)
      assert(after1 == after2, "split appends diverged from one-shot")

      // no rewrite: every pre-append code row survives unchanged
      val manifestIds = manifest.filter($"embedding".isNotNull)
        .select("vec_id").as[Long].collect().toSet
      assert(after1.filter(r => manifestIds.contains(r._1)) == before,
        "append rewrote or re-encoded manifest codes")
      // coverage: every non-null batch vector gained m code rows
      val batchIds = batch.filter($"embedding".isNotNull)
        .select("vec_id").as[Long].collect().toSet
      val batchRows = after1.count(r => batchIds.contains(r._1))
      assert(batchRows == batchIds.size * 16,
        s"expected ${batchIds.size * 16} batch code rows, got $batchRows")

      // the probe serves appended vectors: an appended vector that
      // DUPLICATES a manifest vector shares its code word, so both
      // carry the same adc_dot for every query that sees their label
      val got = Similarity.pqIndexProbe(spark, dir1, emb,
        Similarity.sampleQueryIds(
          emb.filter($"embedding".isNotNull), 16),
        k = 5, nprobe = 3)
      assert(got.filter($"neighbor_id" % 10 === 0).count() > 0,
        "no appended vector ever surfaced in the probe results")
    } finally {
      graft.queries.QueryUtil.deleteRecursively(dir1)
      graft.queries.QueryUtil.deleteRecursively(dir2)
    }
  }

  test("append refuses a batch whose label is absent from the stored " +
      "coarse index (it would be unreachable to every probe)") {
    val emb = graft.Tables.embeddings(spark, sf0001)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_append3").toString
    try {
      Similarity.buildPqIndex(emb.filter($"vec_id" % 10 =!= 0), dir,
        m = 16, kSub = 32, iters = 2, fitSampleMod = 4L)
      val donor = emb.filter($"embedding".isNotNull)
        .orderBy("vec_id").limit(1).collect().head
      val novel = Seq((999999L, donor.getSeq[Float](1), 424242))
        .toDF("vec_id", "embedding", "label")
      val e = intercept[IllegalArgumentException] {
        Similarity.appendToPqIndex(spark, dir, novel)
      }
      assert(e.getMessage.contains("424242"))
    } finally graft.queries.QueryUtil.deleteRecursively(dir)
  }
}
