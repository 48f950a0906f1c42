package graft

import org.apache.spark.sql.functions._
import graft.io.Tsv
import graft.ops.Zip
import graft.ext.Multimodal

/** Specs for the io/multimodal/zip modules. */
class ModulesSpec extends SparkSpec {

  import spark.implicits._

  test("S4/S5 TSV roundtrip: single file per node, string-first re-read") {
    val dir = java.nio.file.Files.createTempDirectory("tsv_spec").toString
    val df = Seq((1, "a", 1.5), (2, "b\ttab", 2.0)).toDF("k", "s", "d")
    assert(Tsv.writeNode(df, dir, "node1"))
    assert(new java.io.File(s"$dir/node1.tsv").isFile)
    val back = Tsv.read(spark, s"$dir/node1.tsv")
    assert(back.schema.fields.forall(_.dataType ==
      org.apache.spark.sql.types.StringType))
    val rows = back.orderBy("k").collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("1", "2"))
    assert(rows(1).getString(1) == "b\ttab") // quoted field survives the sep
    assert(rows(0).getString(2) == "1.5")
  }

  test("S4 skips empty frames (the reference's all-null guard)") {
    val dir = java.nio.file.Files.createTempDirectory("tsv_spec2").toString
    val empty = Seq.empty[(Int, String)].toDF("k", "s")
    assert(!Tsv.writeNode(empty, dir, "nodeE"))
    assert(!new java.io.File(s"$dir/nodeE.tsv").exists)
  }

  test("J2 positional zip truncates the longer side and is order-driven") {
    val a = Seq(3, 1, 2).toDF("x")
    val b = Seq("c", "a").toDF("y")
    val out = Zip.positional(a, Seq(col("x")), b, Seq(col("y")))
      .orderBy("rn").collect()
    assert(out.length == 2)
    assert(out.map(r => (r.getInt(1), r.getString(2))).toSeq ==
      Seq((1, "a"), (2, "c")))
  }

  test("J2 globalRank: contiguous 1..n, order-true, partitioning-independent") {
    // deliberately unordered input over several partitions
    val df = spark.sparkContext.parallelize(
      Seq(42L, 7L, 99L, 1L, 13L, 56L, 3L, 77L, 21L, 64L), 5).toDF("k")
    val ranked = Zip.globalRank(df, Seq(col("k")), "rn")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ranked.values.toSeq.sorted == (1L to 10L), "ranks must be 1..n")
    assert(ranked.toSeq.sortBy(_._2).map(_._1) ==
      Seq(1L, 3L, 7L, 13L, 21L, 42L, 56L, 64L, 77L, 99L),
      "rank order must follow the key order")
    // same ranks from a different physical layout
    val ranked1 = Zip.globalRank(
      spark.sparkContext.parallelize(Seq(42L, 7L, 99L, 1L, 13L, 56L, 3L, 77L, 21L, 64L), 1)
        .toDF("k"), Seq(col("k")), "rn")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ranked1 == ranked)
    // multiple ACTIONS over one ranked frame agree (the range sampler
    // must not re-draw boundaries between consumers — the rn-join case)
    val rdf = Zip.globalRank(df, Seq(col("k")), "rn")
    val selfJoined = rdf.join(rdf.select(col("rn"), col("k").as("k2")), Seq("rn"))
    assert(selfJoined.count() == 10L)
    assert(selfJoined.filter(col("k") =!= col("k2")).count() == 0L)
  }

  test("S3 transposedKv pivots kv rows to one wide row; missing keys null") {
    val kv = Seq(("a", 1), ("b", 2)).toDF("k", "v")
    val row = graft.ops.Reshape.transposedKv(kv, "k", "v", Seq("a", "b", "z"))
      .collect()(0)
    assert(row.getInt(0) == 1 && row.getInt(1) == 2 && row.isNullAt(2))
  }

  test("Approx: sketches land within tolerance of exact answers") {
    val df = (1 to 10000).map(i => (i % 997).toLong).toDF("k")
    val approx = df.select(graft.ext.Approx.distinctCount(col("k"))).as[Long].head()
    assert(math.abs(approx - 997) < 997 * 0.1, s"approx=$approx")
    val q = df.select(graft.ext.Approx.quantiles(col("k"), Seq(0.5)))
      .collect()(0).getSeq[Long](0)
    assert(math.abs(q.head - 498) < 30)
    val profile = graft.ext.Approx.cardinalityProfile(df, Seq("k")).collect()(0)
    assert(profile.getString(0) == "k" && profile.getLong(2) == 0)
  }

  test("melt is pivot's inverse: wide row -> one row per value column") {
    val df = Seq((1, 10.0, 20.0), (2, 30.0, 40.0)).toDF("id", "a", "b")
    val long = graft.ops.Reshape.melt(df, Seq("id"), Seq("a", "b"))
    assert(long.columns.toSeq == Seq("id", "attr", "val"))
    val got = long.orderBy("id", "attr").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSeq
    assert(got == Seq((1, "a", 10.0), (1, "b", 20.0), (2, "a", 30.0), (2, "b", 40.0)))
  }

  test("tableFingerprint: order-independent, content- and null-layout-sensitive") {
    import graft.validate.Validations.tableFingerprint
    def fp(rows: Seq[(java.lang.Integer, String)]): (Long, String) = {
      val r = tableFingerprint(rows.toDF("k", "s"), Seq("k", "s")).collect()(0)
      (r.getLong(0), r.getString(1))
    }
    val base = fp(Seq((1, "a"), (2, "b"), (3, null)))
    assert(base == fp(Seq((3, null), (1, "a"), (2, "b"))), "row order must not matter")
    assert(base != fp(Seq((1, "a"), (2, "b"), (3, "c"))), "value change must change the sum")
    // null layout is part of the checksum: which column is null matters
    def fp2(rows: Seq[(String, String)]): String = {
      val r = tableFingerprint(rows.toDF("x", "y"), Seq("x", "y")).collect()(0)
      r.getString(1)
    }
    assert(fp2(Seq((null, "x"))) != fp2(Seq(("x", null))))
    assert(fp(Seq((1, "a")))._2 != fp(Seq((1, "a"), (1, "a")))._2, "duplicates change the sum")
    // NULL is distinct from any real value, including the characters a
    // space-sentinel would collide with — the engine-portable NUL sentinel
    assert(fp2(Seq((null, "x"))) != fp2(Seq((" ", "x"))), "null must not collide with ' '")
    assert(fp2(Seq((null, "x"))) != fp2(Seq(("", "x"))), "null must not collide with ''")
    // decimal-free output: plain digits, compares identically on any engine
    assert(base._2.matches("[0-9]+"), s"fingerprint must be a digit string: ${base._2}")
  }

  test("distinctGate: flag holds for a faithful sketch, output shape is gated") {
    val df = (1 to 5000).map(i => (s"t${i % 3}", (i % 731).toLong)).toDF("typ", "u")
    val out = graft.ext.Approx.distinctGate(df, "typ", "u").orderBy("typ").collect()
    assert(out.length == 3)
    assert(out.forall(_.getLong(2) == 1L), "2% rsd sketch must sit within 5%")
    assert(out.forall(_.getLong(1) == 731L))
  }

  test("quantileGate: GK sketch sits inside the exact rank-tolerance interval") {
    val df = (1 to 20000).map(i => (s"g${i % 2}", (i * 7919 % 10007).toDouble))
      .toDF("g", "v")
    val out = graft.ext.Approx.quantileGate(df, "g", "v").orderBy("g").collect()
    assert(out.length == 2)
    assert(out.forall(_.getLong(2) == 1L), out.mkString(","))
    assert(out.forall(_.getLong(1) == 10000L))
  }

  test("quantileGate: small and all-null groups pass vacuously, tail probs rejected") {
    // 4 distinct values: interpolated bounds sit BETWEEN elements — the
    // gate must not fail a perfect sketch on interpolation wobble
    val small = Seq(("s", Some(1.0)), ("s", Some(2.0)), ("s", Some(3.0)),
      ("s", Some(4.0)), ("n", Option.empty[Double]), ("n", Option.empty[Double]))
      .toDF("g", "v")
    val out = graft.ext.Approx.quantileGate(small, "g", "v")
      .orderBy("g").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq(("n", 2L, 1L), ("s", 4L, 1L)))
    intercept[IllegalArgumentException] {
      graft.ext.Approx.quantileGate(small, "g", "v", probs = Seq(0.995))
    }
    ()
  }

  test("SeenKeys: cross-batch dedup state filters, absorbs, and survives reload") {
    val dir = java.nio.file.Files.createTempDirectory("seen_keys").toString
    val b1 = Seq(("f1", "a"), ("f2", "b"), ("f1", "a-dup")).toDF("fp", "v")
    val out1 = graft.state.SeenKeys.filterAndAbsorb(b1, "fp", dir)
      .orderBy("fp").collect()
    assert(out1.map(_.getString(0)).toSeq == Seq("f1", "f2"))
    assert(out1(0).getString(1) == "a") // deterministic retention (min full row)

    val b2 = Seq(("f2", "again"), ("f3", "new")).toDF("fp", "v")
    val out2 = graft.state.SeenKeys.filterAndAbsorb(b2, "fp", dir).collect()
    assert(out2.map(_.getString(0)).toSeq == Seq("f3")) // f2 already seen
    val state = graft.state.SeenKeys.load(spark, dir)
      .orderBy("key").collect().map(_.getString(0)).toSeq
    assert(state == Seq("f1", "f2", "f3"))
  }

  test("JSONL sink/source: single-file, sharded, and gzip'd roundtrips are lossless") {
    import graft.io.Jsonl
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_spec").toString
    val docs = Seq(
      (1L, "en", "plain text"),
      (2L, "de", "line\nbreak and \"quotes\" and a\ttab"),
      (3L, null.asInstanceOf[String], "null lang survives"))
      .toDF("doc_id", "lang", "text")
    val expect = docs.collect().map(_.toSeq).toSet

    val single = Jsonl.write(docs, dir, "d")
    assert(single.endsWith("/d.jsonl"))
    assert(Jsonl.read(spark, single, docs.schema).collect().map(_.toSeq).toSet == expect)

    val gz = Jsonl.write(docs, dir, "dz", codec = Some("gzip"))
    assert(gz.endsWith("/dz.jsonl.gz"))
    assert(Jsonl.read(spark, gz, docs.schema).collect().map(_.toSeq).toSet == expect)

    val sharded = Jsonl.write(docs.repartition(3), dir, "shards", singleFile = false)
    assert(Jsonl.read(spark, sharded, docs.schema).collect().map(_.toSeq).toSet == expect)
  }

  test("SeenKeys: manifest commit is rename-based; prior readers survive compaction") {
    val dir = java.nio.file.Files.createTempDirectory("seen_keys_mv").toString
    // compactEvery=2 forces a compaction on the third batch
    def absorb(rows: Seq[(String, String)]) =
      graft.state.SeenKeys.filterAndAbsorb(
        rows.toDF("fp", "v"), "fp", dir, compactEvery = 2)
    absorb(Seq(("a", "1"))).count()
    // a reader captures the pre-compaction state (lazy frame over deltas)
    val priorState = graft.state.SeenKeys.load(spark, dir)
    absorb(Seq(("b", "2"))).count()
    absorb(Seq(("c", "3"))).count() // triggers compaction into base-N
    // post-compaction manifest: exactly one live base file, no temp litter
    val root = new java.io.File(dir)
    val manifest = java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, "_CURRENT")).trim.linesIterator.toSeq
    assert(manifest.length == 1 && manifest.head.startsWith("base-"), manifest)
    assert(!root.list().contains("_CURRENT.tmp"))
    // superseded delta files are STILL on disk until vacuum, so the prior
    // reader's lineage remains readable mid-/post-compaction
    assert(priorState.collect().map(_.getString(0)).toSeq == Seq("a"))
    assert(graft.state.SeenKeys.load(spark, dir)
      .orderBy("key").collect().map(_.getString(0)).toSeq == Seq("a", "b", "c"))
    // vacuum then reclaims the superseded files; current state unaffected
    graft.state.SeenKeys.vacuum(spark, dir)
    // (dotfiles = LocalFileSystem .crc sidecars, absent on real stores)
    assert(root.list().filterNot(_.startsWith(".")).toSet ==
      Set("_CURRENT", manifest.head))
    assert(graft.state.SeenKeys.load(spark, dir).count() == 3)
  }

  test("M1 binary metadata: byte length and kind are deterministic") {
    val df = Seq((1L, "abc"), (2L, "abcd")).toDF("doc_id", "text")
    val out = Multimodal.withBinaryMeta(df, "text").orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("byte_len") == 3L)
    assert(out(0).getAs[String]("kind") == "image")  // 3 % 3 == 0
    assert(out(1).getAs[String]("kind") == "audio")  // 4 % 3 == 1
  }

  test("M6 sniffKind reads real signatures, near-misses fall through") {
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    val blobs = Seq(
      1L -> (b(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A) ++ "x".getBytes),
      2L -> b(0xFF, 0xD8, 0xFF, 0xE0, 0x00),
      3L -> "GIF87a-rest".getBytes("US-ASCII"),
      4L -> "GIF89a-rest".getBytes("US-ASCII"),
      5L -> "RIFF1234WAVEfmt".getBytes("US-ASCII"),
      6L -> "RIFF1234AVI LIST".getBytes("US-ASCII"), // RIFF but not WAVE
      7L -> "....ftypisom".getBytes("US-ASCII"),
      8L -> "%PDF-1.7".getBytes("US-ASCII"),
      9L -> "plain text".getBytes("US-ASCII"),
      10L -> Array.empty[Byte])
    val out = blobs.toDF("id", "content")
      .select(col("id"), Multimodal.sniffKind(col("content")).as("k"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "image/png" && out(2L) == "image/jpeg")
    assert(out(3L) == "image/gif" && out(4L) == "image/gif")
    assert(out(5L) == "audio/wav")
    assert(out(6L) == "application/octet-stream")
    assert(out(7L) == "video/mp4" && out(8L) == "application/pdf")
    assert(out(9L) == "application/octet-stream")
    assert(out(10L) == "application/octet-stream")
  }

  test("M8 imageHeaders: IHDR fields, SOF behind variable segments, malformed to unknown") {
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    def u16(v: Int) = b(v >> 8, v)
    def u32(v: Int) = b(v >> 24, v >> 16, v >> 8, v)
    // PNG: signature + IHDR(300x200, depth 16, rgba)
    val png = b(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A) ++
      u32(13) ++ "IHDR".getBytes ++ u32(300) ++ u32(200) ++
      b(16, 6, 0, 0, 0) ++ u32(0)
    // palette PNG: colorType 3 = 1 channel
    val pngPal = b(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A) ++
      u32(13) ++ "IHDR".getBytes ++ u32(12) ++ u32(34) ++
      b(8, 3, 0, 0, 0) ++ u32(0)
    // JPEG: SOI, APP1 (EXIF-shaped filler), COM, then PROGRESSIVE SOF2
    // 640x480, 3 components — the walk must skip two variable segments
    val jpg = b(0xFF, 0xD8) ++
      (b(0xFF, 0xE1) ++ u16(10) ++ "Exif  AB".getBytes) ++
      (b(0xFF, 0xFE) ++ u16(5) ++ "com".getBytes) ++
      (b(0xFF, 0xC2) ++ u16(17) ++ b(8) ++ u16(480) ++ u16(640) ++
        b(3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)) ++ b(0xFF, 0xD9)
    // malformed: SOS arrives before any SOF
    val jpgBad = b(0xFF, 0xD8, 0xFF, 0xDA, 0x00, 0x04, 0x01, 0x02)
    def u16l(v: Int) = b(v, v >> 8)
    def u32l(v: Int) = b(v, v >> 8, v >> 16, v >> 24)
    // GIF87a, 321x45, color resolution bits (5<<4) -> depth 6, palette
    val gif = "GIF87a".getBytes("US-ASCII") ++ u16l(321) ++ u16l(45) ++
      b(0x50, 0, 0, 0x3B)
    // BMP 32bpp with a NEGATIVE (top-down) height — must normalize
    val bmp = "BM".getBytes("US-ASCII") ++ u32l(70) ++ u32l(0) ++ u32l(54) ++
      u32l(40) ++ u32l(77) ++ u32l(-66) ++ u16l(1) ++ u16l(32) ++
      u32l(0) ++ u32l(0) ++ u32l(0) ++ u32l(0) ++ u32l(0) ++ u32l(0)
    val blobs = Seq(1L -> png, 2L -> pngPal, 3L -> jpg, 4L -> jpgBad,
      5L -> "plain text".getBytes("US-ASCII"), 6L -> Array.empty[Byte],
      7L -> gif, 8L -> bmp)
    val out = Multimodal.imageHeaders(
        blobs.toDF("doc_id", "content"), "doc_id", "content")
      .collect().map(h => h.doc_id -> h).toMap
    assert(out(1L) == Multimodal.ImageHeader(1L, "png", 300L, 200L, 16L, 4L))
    assert(out(2L) == Multimodal.ImageHeader(2L, "png", 12L, 34L, 8L, 1L))
    assert(out(3L) == Multimodal.ImageHeader(3L, "jpeg", 640L, 480L, 8L, 3L))
    Seq(4L, 5L, 6L).foreach(i =>
      assert(out(i) == Multimodal.ImageHeader(i, "unknown", 0L, 0L, 0L, 0L)))
    assert(out(7L) == Multimodal.ImageHeader(7L, "gif", 321L, 45L, 6L, 1L))
    assert(out(8L) == Multimodal.ImageHeader(8L, "bmp", 77L, 66L, 32L, 4L))
  }

  test("M7 perceptualHash: last-byte flip is hamming 1, empty blob is 0, partition-stable") {
    // 95 chars so sample positions i*(n-1)/47 = 2i touch every other
    // byte; only i=47 reads the LAST byte
    val base = "n" * 95
    val blobs = Seq(
      1L -> base.getBytes("US-ASCII"),
      2L -> (base.dropRight(1) + "a").getBytes("US-ASCII"), // last byte 'n'(110)->'a'(97)
      3L -> Array.empty[Byte])
    val df = blobs.toDF("doc_id", "content")
    val h = Multimodal.perceptualHash(df, "doc_id", "content")
      .collect().map(r => r.doc_id -> r.phash).toMap
    assert(h(1L) == (1L << 48) - 1)          // every sample 'n' > 109
    assert(java.lang.Long.bitCount(h(1L) ^ h(2L)) == 1)
    assert((h(2L) & (1L << 47)) == 0L)       // the flipped bit is the LAST sample
    assert(h(3L) == 0L)
    val again = Multimodal.perceptualHash(df.repartition(4), "doc_id", "content")
      .collect().map(r => r.doc_id -> r.phash).toMap
    assert(again == h)
  }

  test("M7 phashNearDup: banded candidates verify by hamming; over-cap buckets drop") {
    // hashes: 1<->2 differ in 1 bit (near), 3 differs everywhere (far);
    // 4..8 share hash 0 — an over-cap bucket under maxBucket=4
    val ph = Seq(
      1L -> ((1L << 48) - 1), 2L -> ((1L << 48) - 2), 3L -> 0x0F0F0F0F0F0FL,
      4L -> 0L, 5L -> 0L, 6L -> 0L, 7L -> 0L, 8L -> 0L)
      .toDF("doc_id", "phash")
    val pairs = Multimodal.phashNearDup(ph, "doc_id", "phash", maxBucket = 4)
      .as[(Long, Long, Long)].collect().toSet
    // (1,2) share 3 of 4 bands but appear ONCE (distinct); zero-hash
    // bucket (5 docs in every band) exceeds the cap and emits nothing
    assert(pairs == Set((1L, 2L, 1L)))
    // with the cap lifted the zero-hash clique surfaces at hamming 0
    val lifted = Multimodal.phashNearDup(ph, "doc_id", "phash", maxBucket = 64)
      .as[(Long, Long, Long)].collect().toSet
    assert(lifted.count(_._3 == 0L) == 10 && lifted((1L, 2L, 1L)))
  }

  test("M3 feature extraction: MD5-byte features, stable across partitionings") {
    val df = Multimodal.withBinaryMeta(
      Seq((1L, "hello world"), (2L, "other text")).toDF("doc_id", "text"), "text")
    val one = Multimodal.extractFeatures(df.coalesce(1), "doc_id", "content")
      .collect().sortBy(_.doc_id).toSeq
    val many = Multimodal.extractFeatures(df.repartition(4), "doc_id", "content")
      .collect().sortBy(_.doc_id).toSeq
    assert(one == many)
    // cross-check doc 1 against java's own MD5 of the utf-8 bytes
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest("hello world".getBytes("UTF-8"))
    assert(one.head.f0 == (d(0) & 0xff).toLong)
    assert(one.head.feat_sum == d.take(16).map(b => (b & 0xff).toLong).sum)
  }

  test("M2 frame sampling: n frames per blob, chunks cover the bytes") {
    val df = Multimodal.withBinaryMeta(
      Seq((1L, "0123456789"), (2L, "x")).toDF("doc_id", "text"), "text")
    val frames = Multimodal.sampleFrames(df, "doc_id", "content", nFrames = 4)
      .collect().groupBy(_.doc_id)
    assert(frames(1L).length == 4)
    assert(frames(1L).map(_.frame_bytes).sum == 10) // chunks partition the blob
    assert(frames(2L).map(_.frame_bytes).sum == 1)  // tiny blob still 4 frames
    // determinism: same input -> same checksums
    val again = Multimodal.sampleFrames(df, "doc_id", "content", nFrames = 4)
      .collect().groupBy(_.doc_id)
    assert(frames(1L).map(_.checksum).toSeq == again(1L).map(_.checksum).toSeq)
    // empty blob: 4 empty frames, no out-of-bounds read on bytes(0)
    val empty = Multimodal.sampleFrames(
      Seq((3L, Array.empty[Byte])).toDF("doc_id", "content"), "doc_id", "content", 4)
      .collect()
    assert(empty.length == 4 && empty.forall(f => f.frame_bytes == 0 && f.checksum == 0L))
  }

  test("M9 decodeAHash: real ImageIO decode — cross-container collision the stub cannot give") {
    def luma(c: Long)(x: Int, y: Int): Int =
      ((c * 53 + x * (3 + c % 5) + y * (7 + c % 3)) % 256).toInt
    val blobs = (0L until 8L).map { id =>
      (id, Multimodal.encodeGray(16, 16, luma(id / 2),
        if (id % 2 == 0) "png" else "bmp"))
    }.toDF("doc_id", "content")
    val dec = Multimodal.decodeAHash(blobs, "doc_id", "content")
      .collect().sortBy(_.doc_id).toSeq
    assert(dec.map(_.fmt) == Seq("png", "bmp", "png", "bmp", "png", "bmp", "png", "bmp"))
    assert(dec.forall(d => d.width == 16 && d.height == 16))
    // content twins (PNG vs BMP of the SAME pixels) collide exactly...
    for (c <- 0 until 4) {
      val Seq(a, b) = dec.slice(2 * c, 2 * c + 2)
      assert((a.ahash_hi, a.ahash_lo) == ((b.ahash_hi, b.ahash_lo)),
        s"content $c twins must collide")
    }
    // ...while distinct contents hash apart (gradient slopes differ)
    val hashes = dec.grouped(2).map(p => (p.head.ahash_hi, p.head.ahash_lo)).toSeq
    assert(hashes.distinct.length == 4, s"contents must hash apart: $hashes")
    // the byte-sampling STUB provably does not collide across containers
    // for the same content — the property the real decode adds
    val stub = Multimodal.perceptualHash(blobs, "doc_id", "content")
      .collect().sortBy(_.doc_id).toSeq
    assert(stub.grouped(2).exists(p => p.head.phash != p(1).phash),
      "stub hashes PNG and BMP bytes, not pixels")
    // halves are non-negative 32-bit (the SQL-twin contract)
    assert(dec.forall(d => d.ahash_hi >= 0 && d.ahash_hi < (1L << 32) &&
      d.ahash_lo >= 0 && d.ahash_lo < (1L << 32)))
  }

  test("M9 decodeAHash: malformed blobs are loud unknowns; odd sizes decode deterministically") {
    val junk = Seq(
      (1L, Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10)), // truncated magic
      (2L, Array[Byte](1, 2, 3)),
      (3L, Array.empty[Byte])).toDF("doc_id", "content")
    val u = Multimodal.decodeAHash(junk, "doc_id", "content").collect()
    assert(u.forall(d => d.fmt == "unknown" && d.width == 0 && d.height == 0 &&
      d.ahash_hi == 0 && d.ahash_lo == 0))
    // non-multiple-of-8 dimensions: blocks still cover >=1 px each and the
    // result is partition-stable
    val odd = Seq((7L, Multimodal.encodeGray(10, 6,
      (x, y) => (x * 23 + y * 41) % 256, "png"))).toDF("doc_id", "content")
    val a = Multimodal.decodeAHash(odd, "doc_id", "content").collect().head
    val b = Multimodal.decodeAHash(odd.repartition(4), "doc_id", "content")
      .collect().head
    assert(a == b && a.width == 10 && a.height == 6 && a.fmt == "png")
  }

  test("M10 wavHeaders: chunk walk recovers fmt fields; derived sample/duration math exact") {
    def wav(rate: Long, ch: Long, bits: Long, nsamp: Long, pre: Int): Array[Byte] = {
      val dataSize = nsamp * ch * (bits / 8)
      val out = new java.io.ByteArrayOutputStream()
      def b(vs: Int*): Unit = vs.foreach(v => out.write(v & 0xff))
      def u16l(v: Long): Unit = b(v.toInt, (v >> 8).toInt)
      def u32l(v: Long): Unit =
        b(v.toInt, (v >> 8).toInt, (v >> 16).toInt, (v >> 24).toInt)
      b('R', 'I', 'F', 'F'); u32l(36L + dataSize); b('W', 'A', 'V', 'E')
      b('L', 'I', 'S', 'T'); u32l(pre.toLong)
      (0 until pre).foreach(_ => b('q'))
      if (pre % 2 == 1) b(0) // RIFF word pad
      b('f', 'm', 't', ' '); u32l(16L)
      u16l(1L); u16l(ch); u32l(rate); u32l(rate * ch * (bits / 8))
      u16l(ch * (bits / 8)); u16l(bits)
      b('d', 'a', 't', 'a'); u32l(dataSize)
      out.toByteArray
    }
    val blobs = Seq(
      (1L, wav(44100L, 2L, 16L, 44100L, 0)),   // exactly 1s stereo 16-bit
      (2L, wav(8000L, 1L, 8L, 12000L, 5)),     // odd LIST payload -> pad walk
      (3L, wav(22050L, 2L, 16L, 11025L, 4)),
      (4L, Array[Byte]('R', 'I', 'F', 'F')),   // truncated
      (5L, Array[Byte]('R', 'I', 'F', 'X', 0, 0, 0, 0, 'W', 'A', 'V', 'E')),
      (6L, "not audio at all".getBytes("UTF-8")))
      .toDF("doc_id", "content")
    val h = Multimodal.wavHeaders(blobs, "doc_id", "content")
      .collect().map(w => w.doc_id -> w).toMap
    assert(h(1L).fmt == "wav" && h(1L).codec == 1L && h(1L).channels == 2L &&
      h(1L).sample_rate == 44100L && h(1L).bits == 16L &&
      h(1L).n_samples == 44100L && h(1L).duration_ms == 1000L)
    assert(h(2L).fmt == "wav" && h(2L).n_samples == 12000L &&
      h(2L).duration_ms == 1500L, "odd-size LIST pad must not derail the walk")
    assert(h(3L).duration_ms == 500L)
    assert(Seq(4L, 5L, 6L).forall(i => h(i).fmt == "unknown" &&
      h(i).duration_ms == 0L && h(i).sample_rate == 0L),
      "malformed blobs must be loud unknowns")
  }

  test("M11 pcmStats: byte-exact sample decode — signedness, endianness, interleave, truncation") {
    def wav16(samples: Seq[Int], ch: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def b(vs: Int*): Unit = vs.foreach(v => out.write(v & 0xff))
      def u16l(v: Int): Unit = b(v, v >> 8)
      def u32l(v: Int): Unit = b(v, v >> 8, v >> 16, v >> 24)
      b('R', 'I', 'F', 'F'); u32l(36 + samples.length * 2); b('W', 'A', 'V', 'E')
      b('f', 'm', 't', ' '); u32l(16)
      u16l(1); u16l(ch); u32l(8000); u32l(8000 * ch * 2); u16l(ch * 2); u16l(16)
      b('d', 'a', 't', 'a'); u32l(samples.length * 2)
      samples.foreach(s => u16l(s & 0xffff))
      out.toByteArray
    }
    // stereo: 4 frames, values incl. the signed extremes
    val vals = Seq(-32768, 32767, -1, 1, 0, 100, -100, 2)
    val good = wav16(vals, ch = 2)
    val truncated = good.dropRight(3) // payload cut mid-sample
    val blobs = Seq((1L, good), (2L, truncated),
      (3L, "noise".getBytes("UTF-8"))).toDF("doc_id", "content")
    val m = Multimodal.pcmStats(blobs, "doc_id", "content")
      .collect().map(p => p.doc_id -> p).toMap
    assert(m(1L).fmt == "wav" && m(1L).n_frames == 4L)
    assert(m(1L).peak_abs == 32768L, "signed 16-bit extreme must decode")
    assert(m(1L).dc_sum == vals.map(_.toLong).sum)
    assert(m(1L).sum_sq == vals.map(v => v.toLong * v).sum)
    assert(m(2L).fmt == "unknown" && m(2L).sum_sq == 0L,
      "a payload the blob does not contain must be a loud unknown")
    assert(m(3L).fmt == "unknown")
    // partition stability
    val again = Multimodal.pcmStats(blobs.repartition(3), "doc_id", "content")
      .collect().map(p => p.doc_id -> p).toMap
    assert(again == m)
  }

  test("M14 audioWindowSigs: exact window folds, remainder discipline, malformed-loud, partition stability") {
    def wav16(samples: Seq[Int]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def b(vs: Int*): Unit = vs.foreach(v => out.write(v & 0xff))
      def u16l(v: Int): Unit = b(v, v >> 8)
      def u32l(v: Int): Unit = b(v, v >> 8, v >> 16, v >> 24)
      b('R', 'I', 'F', 'F'); u32l(36 + samples.length * 2); b('W', 'A', 'V', 'E')
      b('f', 'm', 't', ' '); u32l(16)
      u16l(1); u16l(1); u32l(8000); u32l(16000); u16l(2); u16l(16)
      b('d', 'a', 't', 'a'); u32l(samples.length * 2)
      samples.foreach(s => u16l(s & 0xffff))
      out.toByteArray
    }
    // 9 samples over 2 windows of 4: the 9th sample is the ignored
    // remainder; window 0 crosses zero twice, window 1 once; signed
    // extremes exercise the energy fold's long arithmetic
    val vals = Seq(-32768, 32767, -1, -2, /*w1*/ 5, -5, 3, 2, /*cut*/ 9999)
    val blobs = Seq(
      (1L, wav16(vals)),
      (2L, wav16(Seq(1))),              // shorter than `windows`: loud
      (3L, "noise".getBytes("UTF-8")))  // not a WAV: loud
      .toDF("doc_id", "content")
    val rows = Multimodal.audioWindowSigs(blobs, "doc_id", "content", 2)
      .collect()
    val byDoc = rows.groupBy(_.doc_id)
    val w = byDoc(1L).sortBy(_.win_idx)
    assert(w.map(_.fmt).toSeq == Seq("wav", "wav") && w.length == 2)
    def e(vs: Seq[Int]) = vs.map(v => v.toLong * v).sum
    assert(w(0).energy_sq == e(vals.slice(0, 4)) &&
      w(1).energy_sq == e(vals.slice(4, 8)),
      "energy must fold exactly the window's samples, remainder ignored")
    assert(w(0).zero_cross == 2L, s"(-32768,32767,-1,-2) crosses twice: ${w(0)}")
    assert(w(1).zero_cross == 2L, s"(5,-5,3,2) crosses twice: ${w(1)}")
    assert(byDoc(2L).toSeq == Seq(
      Multimodal.AudioWindowSig(2L, "unknown", 0L, 0L, 0L)),
      "a clip shorter than the window count must be ONE loud unknown")
    assert(byDoc(3L).head.fmt == "unknown")
    val again = Multimodal
      .audioWindowSigs(blobs.repartition(3), "doc_id", "content", 2)
      .collect().toSet
    assert(again == rows.toSet, "partition stability")
    // the m14 planted-overlap invariant: offset-1 siblings share exactly
    // 3 of their 4 window signatures, cross-class clips share none
    def clip(id: Long) = (0 until 4).flatMap { wd =>
      (0 until 64).map(j => SparkEntryMedia.m14Sample((id / 4) * 16 + id % 4 + wd, j).toInt)
    }
    val sib = Seq((10L, wav16(clip(10L))), (11L, wav16(clip(11L))),
      (17L, wav16(clip(17L)))).toDF("doc_id", "content")
    val sigs = Multimodal.audioWindowSigs(sib, "doc_id", "content", 4)
      .collect().groupBy(_.doc_id)
      .map { case (d, rs) => d -> rs.map(r => (r.energy_sq, r.zero_cross)).toSet }
    assert((sigs(10L) & sigs(11L)).size == 3, "offset-1 siblings share 3 windows")
    assert((sigs(10L) & sigs(17L)).isEmpty, "cross-class clips share nothing")
  }

  test("M9 decodeAHash: lossy JPEG decodes through the same path, hash near its lossless twin") {
    // the JDK ships a JPEG codec, so the m9 decode path covers the lossy
    // family too: a JPEG re-encode of the same pixels must land within a
    // small Hamming distance of the lossless twin (aHash's robustness is
    // the property the operator exists for), while the byte-sampling
    // stub has no such bound.
    def luma(x: Int, y: Int): Int = (x * 13 + y * 9 + 40) % 200
    val png = Multimodal.encodeGray(16, 16, luma, "png")
    val jpg = Multimodal.encodeGray(16, 16, luma, "jpg")
    val blobs = Seq((1L, png), (2L, jpg)).toDF("doc_id", "content")
    val d = Multimodal.decodeAHash(blobs, "doc_id", "content")
      .collect().map(r => r.doc_id -> r).toMap
    assert(d(1L).fmt == "png" && d(2L).fmt == "jpeg")
    assert(d(2L).width == 16 && d(2L).height == 16)
    val ham = java.lang.Long.bitCount(d(1L).ahash_hi ^ d(2L).ahash_hi) +
      java.lang.Long.bitCount(d(1L).ahash_lo ^ d(2L).ahash_lo)
    assert(ham <= 12, s"JPEG twin drifted $ham of 64 hash bits")
    // determinism: decoding the same JPEG twice is bit-identical
    val again = Multimodal.decodeAHash(blobs.repartition(2), "doc_id", "content")
      .collect().map(r => r.doc_id -> r).toMap
    assert(again == d)
  }

  test("M10 walkWav: adversarial u32-max chunk sizes never crash the walk (Long cursor)") {
    // r14 ADVICE (medium): a LIST chunk declaring size 0x7FFFFFF0 used to
    // overflow the Int cursor negative and throw SIOOBE out of the whole
    // job. The walk must yield a loud unknown (or the fields found before
    // the bad chunk) — never a crash, whatever the declared size.
    def evil(sz: Long): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def b(vs: Int*): Unit = vs.foreach(v => out.write(v & 0xff))
      def u32l(v: Long): Unit =
        b(v.toInt, (v >> 8).toInt, (v >> 16).toInt, (v >> 24).toInt)
      b('R', 'I', 'F', 'F'); u32l(0L); b('W', 'A', 'V', 'E')
      b('L', 'I', 'S', 'T'); u32l(sz)
      out.toByteArray
    }
    val blobs = Seq(
      (1L, evil(0x7FFFFFF0L)),  // the reported overflow shape
      (2L, evil(0x7FFFFFFFL)),  // Int.MaxValue exactly
      (3L, evil(0xFFFFFFFFL)),  // u32 max
      (4L, evil(0x7FFFFFFAL) ++ "fmt ".getBytes("US-ASCII"))) // junk after
      .toDF("doc_id", "content")
    val h = Multimodal.wavHeaders(blobs, "doc_id", "content")
      .collect().map(w => w.doc_id -> w).toMap
    assert((1L to 4L).forall(i => h(i).fmt == "unknown"),
      "oversized-chunk blobs must be loud unknowns, never a crash")
    // and the same walk feeding pcmStats survives too
    val p = Multimodal.pcmStats(blobs, "doc_id", "content").collect()
    assert(p.forall(_.fmt == "unknown"))
  }

  test("decode-error policy: NonFatal maps to unknown, fatal errors propagate") {
    // r14 VERDICT note: catching Throwable around ImageIO.read mapped an
    // OutOfMemoryError (decompression bomb) to a quiet unknown row. The
    // policy helper pins the contract both ways.
    assert(Multimodal.decodeOrNull[java.awt.image.BufferedImage](
      throw new java.io.IOException("bad blob")) == null)
    assert(Multimodal.decodeOrNull[java.awt.image.BufferedImage](
      throw new RuntimeException("codec parse error")) == null)
    intercept[OutOfMemoryError] {
      Multimodal.decodeOrNull[java.awt.image.BufferedImage](
        throw new OutOfMemoryError("decompression bomb"))
    }
  }
}
