package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.functions._

class MultimodalOpsSpec extends SparkSuite {

  test("media view: binary payload round-trips, types cycle, metadata present") {
    import spark.implicits._
    val m = MultimodalOps.media(spark, sf0001)
    val n = graft.Tables.documents(spark, sf0001).count()
    assert(m.count() == n)
    assert(m.toDF().schema("payload").dataType.typeName == "binary")
    val types = m.toDF().select("media_type").distinct()
      .collect().map(_.getString(0)).toSet
    assert(types == Set("image", "audio", "video"))
    // payload is the utf-8 of text — length matches for every row
    val bad = m.toDF().alias("m")
      .join(graft.Tables.documents(spark, sf0001).alias("d"),
        $"m.media_id" === $"d.doc_id")
      .where(length($"m.payload") =!= octet_length($"d.text")).count()
    assert(bad == 0)
  }

  test("decodeFeatures: deterministic stub, checksum equals SQL md5, dims clamped") {
    import spark.implicits._
    val f = MultimodalOps.q75MediaFeatures(spark, sf0001)
    // cross-check the JVM MessageDigest md5 against Spark SQL's md5
    val mismatch = f.alias("f")
      .join(graft.Tables.documents(spark, sf0001).alias("d"),
        $"f.media_id" === $"d.doc_id")
      .where($"f.checksum" =!= md5($"d.text")).count()
    assert(mismatch == 0)
    f.collect().foreach { r =>
      assert(r.getInt(4) <= MultimodalOps.targetSize)
      assert(r.getInt(5) <= MultimodalOps.targetSize)
      assert(r.getLong(2) > 0)
    }
  }

  test("decodeFeatures preserves partitioning (no shuffle in the decode pass)") {
    val ds = MultimodalOps.media(spark, sf0001).repartition(7)
    val decoded = MultimodalOps.decodeFeatures(ds)
    assert(decoded.rdd.getNumPartitions == 7)
    val plan = decoded.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"))
  }

  test("q123 frame dedup: global-occurrence replay, both branches covered") {
    import spark.implicits._
    val texts = graft.Tables.documents(spark, sf0001)
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter { case (id, t) => id % 3 == 2 && t.length >= MultimodalOps.frameLen }
    val frames = texts.flatMap { case (id, t) =>
      (0 to (t.length - MultimodalOps.frameLen) / MultimodalOps.frameStride).map {
        i => id -> t.substring(i * MultimodalOps.frameStride,
          i * MultimodalOps.frameStride + MultimodalOps.frameLen)
      }
    }
    val occ = frames.groupBy(_._2).view.mapValues(_.length).toMap
    val expect = frames.groupBy(_._1).view.mapValues { fs =>
      (fs.length.toLong, fs.count(f => occ(f._2) >= 2).toLong)
    }.toMap
    val got = MultimodalOps.q123FrameDedup(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.length == expect.size)
    got.foreach { case (id, nF, nDup, ratio) =>
      val (eF, eDup) = expect(id)
      assert(nF == eF && nDup == eDup, s"media $id")
      assert(math.abs(ratio - eDup.toDouble / eF) < 1e-12)
    }
    assert(got.exists(_._3 > 0) && got.exists(g => g._3 < g._2),
      "need both duplicated and unique frames in the fixture")
  }

  test("q76 frame sample: stride/len arithmetic on a known payload") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("mm").toString
    // doc_id=2 → video; 100 chars → frames at offsets 0 and 64
    val text = ("abcdefghij" * 10)
    Seq((2L, text, "en", "t", 100L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = MultimodalOps.q76FrameSample(spark, tmp).collect()
    assert(rows.length == 2)
    assert(rows.map(_.getInt(1)).toSeq == Seq(0, 1))
    // frame 0 = chars 1..16, frame 1 = chars 65..80; both md5s differ
    assert(rows(0).getString(2) != rows(1).getString(2))
  }

  test("q315 audio chunks: frame+hop arithmetic, full tail coverage, overlap") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("mm315").toString
    // doc_id=1 → audio; 100 bytes → starts 0/32/64/96, lengths 48/48/36/4
    val text = (0 until 100).map(i => ('a' + i % 26).toChar).mkString
    // doc_id=4 → audio too; 10 bytes < one window → ONE short chunk,
    // not a silent drop (the contract the docstring promises)
    Seq((1L, text, "en", "t", 100L), (4L, text.take(10), "en", "t", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val all = MultimodalOps.q315AudioChunks(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
    assert(all.filter(_._1 == 4L).map(c => (c._2, c._3, c._4)).toSeq ==
      Seq((0L, 0L, 10L)), "sub-window payload must emit one short chunk")
    val rows = all.filter(_._1 == 1L).map(c => (c._2, c._3, c._4, c._5))
    assert(rows.map(c => (c._1, c._2, c._3)).toSeq ==
      Seq((0L, 0L, 48L), (1L, 32L, 48L), (2L, 64L, 36L), (3L, 96L, 4L)))
    // every chunk hashes its exact slice — replay md5 from the source text
    def md5(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    rows.foreach { case (_, start, n, h) =>
      assert(h == md5(text.substring(start.toInt, start.toInt + n.toInt)))
    }
    // coverage: chunks reach the last byte, and consecutive chunks
    // genuinely overlap (window > hop)
    assert(rows.map(c => c._2 + c._3).max == 100L)
    assert(rows.sliding(2).forall {
      case Array(a, b) => b._2 < a._2 + a._3; case _ => true })
  }

  test("q316 conformance: flag replay over the fixture, counts conserve") {
    import spark.implicits._
    val media = MultimodalOps.media(spark, sf0001).collect()
    val want = media.groupBy(_.media_type).map { case (t, ms) =>
      val small = ms.count(m =>
        m.declared_w < MultimodalOps.minEdge || m.declared_h < MultimodalOps.minEdge)
      val aspect = ms.count(m =>
        m.declared_w > m.declared_h.toLong * MultimodalOps.maxAspect ||
        m.declared_h > m.declared_w.toLong * MultimodalOps.maxAspect)
      val short = ms.count(m => m.payload.length <
        m.declared_w.toLong * m.declared_h / MultimodalOps.payloadDivisor)
      val clean = ms.count(m =>
        !(m.declared_w < MultimodalOps.minEdge || m.declared_h < MultimodalOps.minEdge) &&
        !(m.declared_w > m.declared_h.toLong * MultimodalOps.maxAspect ||
          m.declared_h > m.declared_w.toLong * MultimodalOps.maxAspect) &&
        !(m.payload.length <
          m.declared_w.toLong * m.declared_h / MultimodalOps.payloadDivisor))
      t -> ((ms.length.toLong, small.toLong, aspect.toLong, short.toLong,
        clean.toLong, 1000000L * clean / ms.length))
    }
    val got = MultimodalOps.q316MediaConformance(spark, sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(got == want.toMap)
    // the gate reads three media types and conserves the corpus
    assert(got.keySet == Set("image", "audio", "video"))
    assert(got.values.map(_._1).sum == media.length.toLong)
  }

  test("q344 resize plan: downscale-only geometry, pads fill the model edge") {
    val rows = MultimodalOps.q344ResizePlan(spark, sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, h, sc) = (r.getLong(1), r.getLong(2), r.getLong(3))
      val (ow, oh) = (r.getLong(4), r.getLong(5))
      val (px, py) = (r.getLong(6), r.getLong(7))
      assert(sc <= 1000, s"upscaling forbidden: $r")
      assert(ow <= MultimodalOps.targetSize && oh <= MultimodalOps.targetSize)
      assert(px >= 0 && py >= 0 && px == MultimodalOps.targetSize - ow
        && py == MultimodalOps.targetSize - oh)
      // the larger declared edge drives the scale: after scaling it
      // lands within rounding of the model edge (or the image was
      // already smaller than the edge at scale 1000)
      assert(sc == 1000 || math.max(ow, oh) >= MultimodalOps.targetSize - 1,
        s"scale not tight: $r")
      assert(r.getString(8).length == 32, "md5 probe hash")
      assert(w >= ow && h >= oh)
    }
  }

  test("q345 interleaved pack: atomic units never straddle, offsets are exact") {
    val rows = MultimodalOps.q345InterleavedPack(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    // per (bucket, seq): units placed back-to-back from zero, and a
    // unit crosses the budget only when it opened the sequence alone
    rows.groupBy(t => (t._2, t._4)).foreach { case ((b, seq), units) =>
      val sorted = units.sortBy(_._1)
      var off = 0L
      sorted.foreach { case (d, _, cost, _, start) =>
        assert(start == off, s"bucket $b seq $seq doc $d: start $start != $off")
        off += cost
      }
      sorted.foreach { case (d, _, cost, _, start) =>
        assert(start + cost <= MultimodalOps.interleaveBudget || start == 0,
          s"doc $d straddles a sequence boundary")
      }
    }
    // image docs cost their text plus the image block
    val img = rows.filter(_._1 % 3 == 0)
    assert(img.nonEmpty && img.forall(_._3 > MultimodalOps.imageTokens))
  }

  test("q360 perceptual near-dup: planted family fires, inverted pattern never candidates") {
    val got = MultimodalOps.q360PhashNeardup(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val planted = got.filter(p => p._1 < 0 || p._2 < 0).toSet
    // identical twins at hd 0; the one-char variant at hd 2 vs both
    assert(planted == Set((-2L, -1L, 0L), (-3L, -2L, 2L), (-3L, -1L, 2L)),
      s"planted pairs: $planted")
    // the all-bits-flipped plant shares no band with anything
    assert(!got.exists(p => p._1 == -4L || p._2 == -4L))
    // every emitted pair respects the tolerance
    assert(got.forall(_._3 <= MultimodalOps.phashTau))
  }

  test("q373 binaryFile ingest: every payload lands and reads back byte-identical") {
    import spark.implicits._
    val got = MultimodalOps.q373BinaryFileIngest(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val truth = graft.Tables.documents(spark, sf0001)
      .selectExpr("doc_id", "CAST(octet_length(CAST(text AS BINARY)) AS BIGINT)",
        "md5(CAST(text AS BINARY))")
      .orderBy($"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.toSeq == truth.toSeq)
  }

  test("q404 silence trim: hand-computed chunk energies drive the plan; " +
      "all-silent recording gets the -1 drop sentinels") {
    import spark.implicits._
    // 64 spaces + 32 'z' + 64 spaces → 5 chunks (hop 32, len 48):
    // c0 silent, c1 = 16 z of 48 → (16·8100·1000)/48 = 2.7M voiced,
    // c2 = 32 z of 48 → 5.4M voiced, c3/c4 silent
    val padded = " " * 64 + "z" * 32 + " " * 64
    val rows = Seq((1L, padded), (2L, " " * 100))
      .toDF("media_id", "content")
    val got = MultimodalOps.silenceTrimOf(rows).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, 5L, 3L, 32L, 2L * 32 + 48),
      (2L, 4L, 4L, -1L, -1L)), got.toSeq.toString)
    // the energy arithmetic itself: 16 z-amplitudes in a 48-byte chunk
    assert(16L * (122 - 32) * (122 - 32) * 1000 / 48 == 2700000L)
  }
}
