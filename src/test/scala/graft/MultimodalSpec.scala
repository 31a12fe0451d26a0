package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Multimodal

/** Specs for the multimodal binary-column plumbing. The decode bodies are
  * deterministic stubs (no codecs on the classpath); what's under test is
  * the real part — schema, partition-wise batching, determinism, and the
  * feature-vector contract that feeds the ANN path.
  */
class MultimodalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = TestSpark.session
  import spark.implicits._
  private val d = TestSpark.sf0001

  test("media table: binary payload with typed metadata, all kinds present") {
    val m = Multimodal.mediaTable(spark, d)
    assert(m.schema("payload").dataType.typeName === "binary")
    val kinds = m.select("kind").distinct().as[String].collect().toSet
    assert(kinds === Set("image", "audio", "video"))
  }

  test("decodeImages: only images, plausible dims, deterministic across runs") {
    val media = Multimodal.mediaTable(spark, d)
    val a = Multimodal.decodeImages(media).collect().sortBy(_.media_id)
    val b = Multimodal.decodeImages(media).collect().sortBy(_.media_id)
    assert(a.nonEmpty)
    assert(a.map(_.media_id).toSeq === b.map(_.media_id).toSeq)
    assert(a.map(_.width).toSeq === b.map(_.width).toSeq)
    a.foreach { i =>
      assert(i.width >= 64 && i.width < 1088)
      assert(i.height >= 64 && i.height < 1088)
      assert(i.n_channels === 3)
    }
  }

  test("extractFeatures: fixed-width L2-normalized vectors usable by ANN") {
    val feats = Multimodal.extractFeatures(Multimodal.mediaTable(spark, d))
      .collect()
    assert(feats.nonEmpty)
    feats.foreach { f =>
      assert(f.feature.length === 64)
      val n2 = f.feature.foldLeft(0.0)((s, v) => s + v * v)
      assert(math.abs(n2 - 1.0) < 1e-3, s"not normalized: $n2")
    }
  }

  test("sampleFrames: only videos, frame indexes stride correctly") {
    val frames = Multimodal.sampleFrames(Multimodal.mediaTable(spark, d))
    val idx = frames.select("frame_idx").as[Long].collect()
    assert(idx.nonEmpty)
    idx.foreach(i => assert(i % 4 === 0))
  }

  test("resizeImages: nearest-neighbor resample matches a reference model, " +
      "only non-empty images survive") {
    val out = Multimodal.resizeImages(Multimodal.mediaTable(spark, d))
      .collect().map(r => r.media_id -> r).toMap
    assert(out.nonEmpty)
    out.values.foreach { r =>
      assert(r.out_w === 32 && r.out_h === 32 && r.out_bytes === 1024)
      assert(r.media_id % 3 === 0) // image rows only
    }
    // reference model on the actual source payloads
    val payloads = Multimodal.mediaTable(spark, d)
      .filter(m => m.kind == "image" && m.payload.nonEmpty)
      .collect().map(m => m.media_id -> m.payload).toMap
    assert(out.keySet === payloads.keySet)
    payloads.foreach { case (id, p) =>
      var h = 1125899906842597L
      var j = 0
      while (j < 1024) {
        h = 31 * h + (p(((j.toLong * p.length) / 1024).toInt) & 0xFF)
        j += 1
      }
      assert(out(id).checksum === (h & Long.MaxValue), s"media $id")
      assert(out(id).src_bytes === p.length.toLong)
    }
  }

  test("mediaStats never reads the payload column (pruned scan)") {
    val plan = Multimodal.mediaStats(spark, d).queryExecution
      .executedPlan.toString
    // the aggregate pipeline must not carry the payload bytes
    assert(!plan.contains("payload#") || plan.contains("length"),
      "payload should be reduced to a length immediately")
  }

  test("imagePhash: deterministic 64-bit fingerprint; model equivalence " +
      "on raw payload bytes") {
    val media = Multimodal.mediaTable(spark, d)
    val hashes = Multimodal.imagePhash(media)
      .as[(Long, Long)].collect().toMap
    val payloads = media.filter(_.kind == "image")
      .collect().map(m => m.media_id -> m.payload).toMap
    assert(hashes.keySet === payloads.keySet && hashes.nonEmpty)
    payloads.foreach { case (id, p) =>
      val cells = new Array[Long](64)
      p.indices.foreach(i => cells(i % 64) += (p(i) & 0xFFL))
      val total = cells.sum
      var expect = 0L
      (0 until 64).foreach(c =>
        if (cells(c) * 64 > total) expect |= (1L << c))
      assert(hashes(id) === expect, s"media $id")
    }
  }

  test("phashPairs: banding finds exactly the brute-force Hamming<=3 " +
      "pairs (pigeonhole completeness)") {
    // sf0.01: the fixture's near-identical documents put 3 image pairs
    // within Hamming 3; sf0.001 has none, which would vacuously pass
    val d01 = TestSpark.sf001
    val got = Multimodal.phashPairs(spark, d01)
      .as[(Long, Long, Int)].collect().toSet
    val hs = Multimodal.imagePhash(Multimodal.mediaTable(spark, d01))
      .as[(Long, Long)].collect()
    val brute = (for {
      (a, ha) <- hs; (b, hb) <- hs if a < b
      ham = java.lang.Long.bitCount(ha ^ hb) if ham <= 3
    } yield (a, b, ham)).toSet
    assert(got === brute)
    assert(got.nonEmpty, "fixture plants near-duplicate images")
  }

  test("audioEnergy: model equivalence on raw payload bytes; silence " +
      "threshold actually splits the fixture") {
    val media = Multimodal.mediaTable(spark, TestSpark.sf001)
    val out = Multimodal.audioEnergy(media)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val payloads = media.filter(_.kind == "audio")
      .collect().map(m => m.media_id -> m.payload).toMap
    assert(out.keySet === payloads.keySet && out.nonEmpty)
    payloads.foreach { case (id, p) =>
      var silent = 0L; var total = 0L
      var f = 0
      val nFrames = (p.length + 255) / 256
      while (f < nFrames) {
        val start = f * 256
        val end = math.min(start + 256, p.length)
        var e = 0L
        (start until end).foreach { i => val s = p(i).toLong; e += s * s }
        total += e
        if (e < 9600L * (end - start)) silent += 1
        f += 1
      }
      assert(out(id) === ((id, nFrames.toLong, silent, total)), s"media $id")
    }
    val silentTotal = out.values.map(_._3).sum
    val frameTotal = out.values.map(_._2).sum
    assert(silentTotal > 0 && silentTotal < frameTotal,
      "floor must mark some but not all frames silent")
  }

  test("phashClusters: components match a reference union-find over the " +
      "pairs") {
    val d01 = TestSpark.sf001
    val pairs = Multimodal.phashPairs(spark, d01)
      .select("media_a", "media_b").as[(Long, Long)].collect()
    // reference union-find
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expect = parent.keys.map(x => (x, find(x))).toSeq
      .groupBy(_._2).map { case (cid, ms) =>
        (cid, ms.map(_._1).toSeq.sorted.mkString(","))
      }.toSet
    val got = Multimodal.phashClusters(spark, d01)
      .select("cluster_id", "members").as[(Long, String)].collect().toSet
    assert(got === expect && got.nonEmpty)
  }
}
