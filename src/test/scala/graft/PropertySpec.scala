package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.schema.Schema

/** Property layer (the reference has none — SURVEY.md §5): random queries
  * over the mages schema; whenever compilation succeeds, the inferred
  * output schema must agree with the planned DataFrame's schema, and
  * planning must never throw. Generators are driven from a fixed seed so
  * runs are reproducible.
  */
class PropertySpec extends AnyFunSuite {
  import SparkSpec.{mages, magesSchemaJson}

  /** Deterministic sample stream from a generator. */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("media walker is total: any byte payload parses to a row or null, never throws") {
    import graft.functions.MediaParseUtil
    // fuzz the container walkers, biased toward valid magic prefixes so
    // the chunk/segment loops actually run over random tails — random
    // bytes make declared 32-bit chunk lengths uniformly huge, exactly
    // the class that once wrapped an Int cursor into a hang/crash
    val magics: Seq[Array[Byte]] = Seq(
      Array.empty[Byte],
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a),
      "GIF89a".getBytes("US-ASCII"),
      "BM".getBytes("US-ASCII"),
      Array[Byte](0xff.toByte, 0xd8.toByte),
      "RIFF".getBytes("US-ASCII") ++ Array[Byte](16, 0, 0, 0) ++ "WAVE".getBytes("US-ASCII"),
      "RIFF".getBytes("US-ASCII") ++ Array[Byte](16, 0, 0, 0) ++ "AVI ".getBytes("US-ASCII"),
      // ISO-BMFF: a well-formed ftyp, then random tail boxes — random
      // bytes make declared box sizes (incl. the 64-bit largesize path)
      // uniformly huge/garbage, the walker's hang/crash class
      Array[Byte](0, 0, 0, 16) ++ "ftypisom".getBytes("US-ASCII") ++ Array[Byte](0, 0, 2, 0),
      Array[Byte](0, 0, 0, 16) ++ "ftypisom".getBytes("US-ASCII") ++
        Array[Byte](0, 0, 2, 0, 0, 0, 0, 1) ++ "moov".getBytes("US-ASCII"),
      // FLAC block walk and MP3 ID3-skip + frame sync over random tails
      "fLaC".getBytes("US-ASCII"),
      "ID3".getBytes("US-ASCII"),
      Array[Byte](0xff.toByte, 0xfb.toByte),
    )
    val bytesGen = for {
      magic <- Gen.oneOf(magics)
      n <- Gen.chooseNum(0, 300)
      body <- Gen.listOfN(n, Gen.chooseNum(-128, 127).map(_.toByte))
    } yield magic ++ body.toArray
    samples(bytesGen, 2000).foreach { bs =>
      MediaParseUtil.parse(bs) // must return (row or null), not throw/hang
    }
  }

  test("TopKBuffer matches a sort-based reference on random inputs (insert + merge)") {
    val idOrd = Ordering.Long.on[Any](_.asInstanceOf[Long])
    val entryGen = for {
      // quantized scores → frequent exact ties (id tiebreak); occasional
      // NaN and -0.0 exercise the Spark-double-semantics edge cases
      score <- Gen.frequency(
        9 -> Gen.chooseNum(-5.0, 5.0).map(s => math.rint(s * 2) / 2.0),
        1 -> Gen.oneOf(Double.NaN, -0.0, 0.0),
      )
      id <- Gen.chooseNum(0L, 50L)
    } yield (score, id)
    val caseGen = for {
      n <- Gen.chooseNum(0, 120)
      xs <- Gen.listOfN(n, entryGen)
      k <- Gen.chooseNum(1, 12)
      split <- Gen.chooseNum(0, n)
    } yield (xs, k, split)
    samples(caseGen, 300).foreach { case (xs, k, split) =>
      // reference: full sort by (score desc, id asc) with Spark's double
      // sort semantics (NaN greatest, -0.0 == 0.0), take k
      def norm(s: Double) = if (s == 0.0) 0.0 else s
      val expect = xs.sorted(new Ordering[(Double, Long)] {
        def compare(a: (Double, Long), b: (Double, Long)): Int = {
          val c = java.lang.Double.compare(norm(b._1), norm(a._1))
          if (c != 0) c else java.lang.Long.compare(a._2, b._2)
        }
      }).take(k)
      // two partial buffers merged, like map-side partials at a shuffle
      val ord = idOrd
      val a = new graft.functions.TopKBuffer(k, ord)
      val b = new graft.functions.TopKBuffer(k, ord)
      xs.take(split).foreach { case (s, i) => a.insert(s, i) }
      xs.drop(split).foreach { case (s, i) => b.insert(s, i) }
      var j = 0
      while (j < b.size) { a.insert(b.scores(j), b.ids(j)); j += 1 }
      val got = a.sorted.map { case (s, i) => (s, i.asInstanceOf[Long]) }.toList
      // compare on canonical bits: NaN == NaN, -0.0 == 0.0 (tuple equality
      // on raw doubles would make NaN unequal to itself)
      def key(e: (Double, Long)) =
        (java.lang.Double.doubleToLongBits(norm(e._1)), e._2)
      assert(got.map(key) == expect.map(key), s"k=$k xs=$xs got=$got expect=$expect")
    }
  }

  private val schema = Schema.fromString(magesSchemaJson).toOption.get

  private val scalarFields = Gen.oneOf(
    "name", "bad_guy", "details.biographical.age", "details.biographical.class",
    "details.physical.gender", "details.physical.height")
  private val numberFields = Gen.oneOf("details.biographical.age", "details.physical.height")
  private val arrayAggs = Gen.oneOf("AVG(spells.power)", "SUM(spells.power)",
    "MAX(spells.power)", "MIN(spells.power)", "COUNT(spells)")

  private val selectorGen: Gen[String] = Gen.oneOf(
    scalarFields,
    arrayAggs,
    scalarFields.map(f => s"$f AS alias_${f.replace('.', '_')}"),
  )

  private val conditionGen: Gen[String] = Gen.oneOf(
    numberFields.flatMap(f => Gen.choose(0, 200).map(n => s"$f > $n")),
    numberFields.flatMap(f => Gen.choose(0, 200).map(n => s"$f < $n")),
    Gen.const("bad_guy = true"),
    Gen.const("details.physical.gender = \"female\""),
    Gen.const("NOT(bad_guy)"),
  )

  private val queryGen: Gen[String] = for {
    sels <- Gen.nonEmptyListOf(selectorGen).map(_.distinct.take(4))
    cond <- Gen.option(conditionGen)
    ord <- Gen.option(numberFields)
    lim <- Gen.option(Gen.choose(1, 20))
  } yield {
    val w = cond.fold("")(c => s" WHERE $c")
    val o = ord.fold("")(f => s" ORDER BY $f")
    val l = lim.fold("")(n => s" LIMIT $n")
    s"SELECT ${sels.mkString(", ")}$w$o$l"
  }

  test("rangeJoin equals the naive cross-filter on random inputs and widths") {
    val spark = SparkSpec.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val caseGen = for {
      nP <- Gen.chooseNum(0, 40)
      nI <- Gen.chooseNum(0, 15)
      points <- Gen.listOfN(nP, for {
        k <- Gen.oneOf("k1", "k2", "k3")
        x <- Gen.chooseNum(-50.0, 50.0).map(v => math.rint(v * 4) / 4.0) // hits bounds often
      } yield (k, x))
      ivs <- Gen.listOfN(nI, for {
        k <- Gen.oneOf("k1", "k2", "k3")
        lo <- Gen.chooseNum(-50.0, 50.0).map(v => math.rint(v * 4) / 4.0)
        len <- Gen.chooseNum(0.0, 40.0).map(v => math.rint(v * 4) / 4.0) // zero-length too
      } yield (k, lo, lo + len))
      width <- Gen.oneOf(0.25, 1.0, 7.0, 100.0)
    } yield (points, ivs, width)
    samples(caseGen, 12).foreach { case (ps, ivs, width) =>
      val pdf = ps.zipWithIndex.map { case ((k, x), i) => (i.toLong, k, x) }
        .toDF("pid", "k", "x")
      val idf = ivs.zipWithIndex.map { case ((k, lo, hi), i) => (i.toLong, k, lo, hi) }
        .toDF("iid", "k", "lo", "hi")
      val got = graft.ops.Joins.rangeJoin(pdf, idf, "x", "lo", "hi", width, Seq("k"))
        .select($"pid", $"iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val expect = (for {
        (p, pi) <- ps.zipWithIndex
        (iv, ii) <- ivs.zipWithIndex
        if p._1 == iv._1 && p._2 >= iv._2 && p._2 < iv._3
      } yield (pi.toLong, ii.toLong)).toSet
      assert(got == expect, s"width=$width points=$ps ivs=$ivs")
    }
  }

  test("winnowing fingerprint properties on random token streams") {
    val spark = SparkSpec.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    graft.functions.GraftFunctions.register(spark)
    val k = 3; val w = 4
    val textGen = for {
      n <- Gen.chooseNum(0, 40)
      toks <- Gen.listOfN(n, Gen.oneOf("aa", "bb", "cc", "dd", "ee", "ff"))
    } yield toks.mkString(" ")
    val texts = samples(textGen, 40).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val df = texts.toDF("id", "text")
    val rows = df.select(col("id"),
        graft.ops.TextOps.fingerprintWinnow(col("text"), k, w).as("fp"),
        graft.functions.GraftFunctions.wordShingles(col("text"), k).as("sh"))
      .collect()
    rows.foreach { r =>
      val fp = r.getSeq[Long](1)
      val shingles = r.getSeq[String](2)
      // sorted + distinct
      assert(fp == fp.sorted && fp.distinct == fp)
      // every selected hash is a real shingle hash; nonempty iff shingles exist
      val hashSet = shingles.map { s =>
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest(s.getBytes("UTF-8"))
        java.lang.Long.parseLong(
          d.take(8).map("%02x".format(_)).mkString.take(15), 16)
      }.toSet
      assert(fp.forall(hashSet), s"selected hash not in shingle set: $r")
      assert(fp.nonEmpty == shingles.nonEmpty)
      // density: never more selections than windows (or 1 for short docs)
      val bound = if (shingles.isEmpty) 0 else math.max(shingles.size - w + 1, 1)
      assert(fp.size <= bound)
    }
  }

  test("splitByHash partitions every row and never migrates under growth") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val caseGen = for {
      n <- Gen.chooseNum(1, 80)
      w1 <- Gen.chooseNum(0.1, 0.6)
      w2 <- Gen.chooseNum(0.1, 0.3)
      salt <- Gen.oneOf("a", "b", "c")
    } yield (n, w1, w2, salt)
    samples(caseGen, 12).foreach { case (n, w1, w2, salt) =>
      val weights = Seq("x" -> w1, "y" -> w2)
      val full = graft.ops.Sample.splitByHash((0L until n.toLong).toDF("id"), "id", weights, salt)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(full.size == n) // exactly one tag per row
      assert(full.values.forall(Set("x", "y", "rest")))
      val half = graft.ops.Sample.splitByHash((0L until (n / 2).toLong).toDF("id"), "id", weights, salt)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(half.forall { case (k2, v) => full(k2) == v })
    }
  }

  test("span dedup invariants on random corpora: token accounting + no phantom text") {
    val spark = SparkSpec.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    graft.functions.GraftFunctions.register(spark)
    val docGen = for {
      n <- Gen.chooseNum(0, 30)
      toks <- Gen.listOfN(n, Gen.oneOf("aa", "bb", "cc", "dd"))
    } yield toks.mkString(" ")
    val corpusGen = for {
      m <- Gen.chooseNum(2, 12)
      docs <- Gen.listOfN(m, docGen)
    } yield docs
    samples(corpusGen, 6).foreach { docs =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = graft.ops.TextOps.dedupSpans(df, "text", "doc_id", k = 4, minDocs = 2)
        .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
      assert(got.size == docs.size) // every row survives (possibly emptied)
      got.foreach { case (id, (text, nTokens, nRemoved)) =>
        val orig = docs(id.toInt).split("\\s+").filter(_.nonEmpty)
        val kept = text.split("\\s+").filter(_.nonEmpty)
        assert(nTokens == orig.length)
        assert(nRemoved == orig.length - kept.length)
        assert(nRemoved >= 0 && nRemoved <= nTokens)
        // kept text is a subsequence of the original token stream
        var oi = 0
        kept.foreach { t =>
          while (oi < orig.length && orig(oi) != t) oi += 1
          assert(oi < orig.length, s"phantom token $t in doc $id")
          oi += 1
        }
      }
    }
  }

  test("bloom decontamination equals exact on random corpora and FPPs") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val wordGen = Gen.chooseNum(0, 20).map(i => s"w$i")
    val docGen = Gen.listOfN(8, wordGen).map(_.mkString(" "))
    val caseGen = for {
      docs <- Gen.listOfN(10, docGen)
      bench <- Gen.listOfN(2, docGen)
      fpp <- Gen.oneOf(0.01, 0.3)
      minOv <- Gen.oneOf(1, 2)
    } yield (docs, bench, fpp, minOv)
    samples(caseGen, 6).foreach { case (docs, bench, fpp, minOv) =>
      val corpus = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val benchDf = bench.zipWithIndex.map { case (t, i) => (100L + i, t) }.toDF("doc_id", "text")
      val exact = graft.ops.TextOps.decontaminate(corpus, benchDf, "text", "doc_id", n = 4, minOv)
        .select($"doc_id").collect().map(_.getLong(0)).toSet
      val bloomed = graft.ops.TextOps.decontaminateBloom(corpus, benchDf, "text", "doc_id", n = 4, minOv, fpp)
        .select($"doc_id").collect().map(_.getLong(0)).toSet
      assert(bloomed == exact, s"fpp=$fpp minOv=$minOv docs=$docs bench=$bench")
    }
  }

  test("capTokensPerGroup equals the naive per-group prefix on random inputs") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val caseGen = for {
      n <- Gen.chooseNum(0, 60)
      rows <- Gen.listOfN(n, for {
        g <- Gen.oneOf("a", "b", "c")
        t <- Gen.chooseNum(1L, 40L)
      } yield (g, t))
      budget <- Gen.oneOf(1L, 25L, 100L, 10000L)
    } yield (rows, budget)
    samples(caseGen, 10).foreach { case (rows, budget) =>
      val df = rows.zipWithIndex.map { case ((g, t), i) => (i.toLong, g, t) }
        .toDF("id", "g", "toks")
      val got = graft.ops.Sample.capTokensPerGroup(df, "g", "id", "toks", budget, salt = "p")
        .select($"id").collect().map(_.getLong(0)).toSet
      // reference: per group, walk rows in (salted md5-hash, id) order and
      // keep while the running total BEFORE the row is under budget
      def hash60(id: Long): BigInt =
        BigInt(java.security.MessageDigest.getInstance("MD5")
          .digest(s"$id#p".getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
          .take(15), 16)
      val expect = rows.zipWithIndex.groupBy(_._1._1).values.flatMap { grp =>
        var cum = 0L
        grp.sortBy { case (_, i) => (hash60(i.toLong), i.toLong) }.flatMap {
          case ((_, t), i) =>
            val keep = cum < budget
            cum += t
            if (keep) Some(i.toLong) else None
        }
      }.toSet
      assert(got == expect, s"budget=$budget rows=$rows")
    }
  }

  test("compiler is total: garbage input returns a Left, never throws") {
    // the front end (lex → parse → analyze → plan) must reject arbitrary
    // input with an error VALUE — an exception from a user-typed query
    // string is a bug regardless of how malformed the input is
    val soupTokens = Gen.oneOf(
      "SELECT", "WHERE", "GROUP", "BY", "ORDER", "LIMIT", "OFFSET", "AND",
      "OR", "NOT", "AVG", "COUNT", "FROM", "AS", "DISTINCT", "(", ")", ",",
      ".", "=", "<", ">", "<=", "!=", "age", "name", "spells.power",
      "bonus", "NULL", "TRUE", "42", "-7", "3.14", "'quoted", "\"", "#",
      "__x", ";")
    val garbage = Gen.frequency(
      3 -> Gen.asciiPrintableStr,
      3 -> Gen.listOf(soupTokens).map(_.mkString(" ")),
      1 -> Gen.listOfN(30, Gen.chooseNum(32, 0xFFFF).map(_.toChar)).map(_.mkString),
    )
    samples(garbage, 1500).foreach { s =>
      Compiler.compile(schema, s)            // Either — must not throw
      Compiler.compile(schema, s, extensions = true)
    }
    // pathological shapes with a deliberate bias to break recursion/lexing
    Seq("", " ", "\n\t", "(" * 500, "SELECT " + "NOT(" * 200 + "x" + ")" * 200,
        "SELECT " + "a." * 300 + "b", "SELECT 'unterminated",
        "SELECT name WHERE " + "age > 1 AND " * 150 + "age > 1",
        " ", "SELECT 😀").foreach { s =>
      Compiler.compile(schema, s)
      Compiler.compile(schema, s, extensions = true)
    }
  }

  test("compiled queries: inferred output schema == planned DataFrame schema") {
    samples(queryGen, 60).foreach { q =>
      Compiler.compile(schema, q) match {
        case Right(compiled) =>
          val planned = compiled.run(mages)
          val inferred = Schema.toStructType(compiled.outputSchema)
          assert(planned.schema.fieldNames.sorted.toList == inferred.fieldNames.sorted.toList,
            s"schema mismatch for: $q")
          // execution must not throw either
          planned.limit(1).collect()
        case Left(_) => // rejected queries are fine; property is about compiled ones
      }
    }
  }

  test("grouped queries: _id present and aggregation schema correct") {
    val groupedGen = for {
      agg <- Gen.oneOf("AVG", "MAX", "MIN", "SUM")
      idx <- Gen.oneOf("details.biographical.class", "details.physical.gender", "NULL")
    } yield s"SELECT $agg(details.biographical.age) AS v GROUP BY $idx"
    samples(groupedGen, 20).foreach { q =>
      val compiled = Compiler.compile(schema, q)
        .fold(e => fail(s"$q → $e"), identity)
      val planned = compiled.run(mages)
      assert(planned.schema.fieldNames.contains("_id"))
      assert(planned.schema.fieldNames.contains("v"))
      assert(Schema.toStructType(compiled.outputSchema).fieldNames.sorted.toList ==
        planned.schema.fieldNames.sorted.toList)
    }
  }

  test("NOT involution quirk: NOT(NOT(x)) plans like NOT(x)") {
    val q1 = "SELECT name WHERE NOT(bad_guy)"
    val q2 = "SELECT name WHERE NOT(NOT(bad_guy))"
    val r1 = Compiler.queryOrThrow(mages, q1).collect().map(_.getString(0)).toSet
    val r2 = Compiler.queryOrThrow(mages, q2).collect().map(_.getString(0)).toSet
    assert(r1 == r2)
  }
  test("paragraph dedup invariants on random corpora: accounting, idempotence") {
    val spark = SparkSpec.spark
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "", " ", "EPS")
    val para = Gen.listOfN(3, word).map(_.mkString(" "))
    val doc = Gen.chooseNum(0, 4).flatMap(n => Gen.listOfN(n + 1, para))
      .map(_.mkString("\n"))
    val corpora = samples(Gen.listOfN(6, doc), 8)
    for (docs <- corpora) {
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val out = graft.ops.Dedup.paragraphDedup(df, "text", "doc_id")
      val rows = out.collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
        .toMap
      // one row per input document, and kept + removed = paragraph count
      assert(rows.keySet == df.collect().map(_.getLong(0)).toSet)
      for ((id, (_, kept, removed)) <- rows) {
        val nParas = docs(id.toInt).split("\n", -1).length
        assert(kept + removed == nParas, s"doc $id: $kept + $removed != $nParas")
      }
      // idempotence: surviving non-blank paragraphs are globally unique
      // and blanks always survive, so a second pass removes NOTHING
      val once = out.select(col("doc_id"),
        col("text_dedup").as("text"))
      val twice = graft.ops.Dedup.paragraphDedup(once, "text", "doc_id")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      for ((id, (t1, _, _)) <- rows)
        assert(twice(id) == t1, s"doc $id not a fixed point")
    }
  }

  test("RRF depends only on rank order: monotone score transforms change nothing") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (_ <- 0 until 5) {
      val la = (0L until 8L).map(i => (i, rnd.nextDouble())).toDF("id", "s")
      val lb = (4L until 12L).map(i => (i, rnd.nextDouble())).toDF("id", "s")
      def fuse(a: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =
        graft.ops.Retrieval.reciprocalRankFusion(Seq((a, "s"), (b, "s")), "id", topK = 12)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      val base = fuse(la, lb)
      // exp() is strictly monotone: identical ranks, identical fusion
      val warped = fuse(
        la.select($"id", org.apache.spark.sql.functions.exp($"s").as("s")),
        lb.select($"id", org.apache.spark.sql.functions.exp($"s").as("s")))
      assert(warped == base)
    }
  }
  test("nfc_normalize is total and idempotent on random unicode strings") {
    val spark = SparkSpec.spark
    import spark.implicits._
    import graft.functions.GraftFunctions
    GraftFunctions.register(spark)
    // mix ASCII, combining marks, precomposed accents, surrogates (emoji),
    // ligatures, fullwidth forms, and raw control chars
    val codepoints = Gen.oneOf(
      Gen.chooseNum(0x20, 0x7e),            // ASCII
      Gen.chooseNum(0x300, 0x36f),          // combining diacriticals
      Gen.chooseNum(0xc0, 0x17f),           // precomposed latin
      Gen.oneOf(0xfb01, 0xff21, 0x212b, 0x1f600, 0x1f4a9), // fi, Ａ, Å, emoji
      Gen.chooseNum(0x00, 0x1f),            // controls
    )
    val strGen = Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, codepoints))
      .map(cps => new String(cps.toArray.flatMap(Character.toChars), 0,
        cps.map(Character.charCount).sum))
    val strings = samples(strGen, 200)
    val df = strings.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    val out = df.select($"id", GraftFunctions.nfcNormalize($"t").as("n"),
        GraftFunctions.nfcNormalize(GraftFunctions.nfcNormalize($"t")).as("nn"))
      .collect()
    assert(out.length == strings.length) // total: no row threw
    out.foreach { r =>
      val n = r.getString(1)
      // idempotent, and agrees with java.text.Normalizer
      assert(n == r.getString(2))
      assert(java.text.Normalizer.isNormalized(n, java.text.Normalizer.Form.NFC))
    }
  }

  test("BM25 equals a driver-side reference computation on random corpora") {
    val spark = SparkSpec.spark
    import spark.implicits._
    val word = Gen.oneOf("ant", "bee", "cat", "dog", "elk", "fox")
    val doc = Gen.chooseNum(1, 8).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    for (round <- 0 until 6) {
      val docs = samples(doc, 10).zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val df = docs.toDF("doc_id", "text")
      val query = Seq("ant", "cat", "fox").take(1 + round % 3).mkString(" ")
      val terms = graft.ops.Retrieval.queryTerms(query)
      // reference: exact integer counts through the IDENTICAL double
      // arithmetic order the operator's scaladoc pins
      val toks = docs.map { case (id, t) => id -> t.split(" ").toSeq }
      val n = toks.size.toLong
      val sumdl = toks.map(_._2.size.toLong).sum
      val dfs = terms.map(q => toks.count(_._2.contains(q)).toLong)
      val expected = toks.flatMap { case (id, tk) =>
        val dl = tk.size.toLong
        val tfs = terms.map(q => tk.count(_ == q).toLong)
        if (tfs.forall(_ == 0L)) None
        else {
          val avgdl = sumdl.toDouble / n
          val score = terms.indices.map { i =>
            val tf = tfs(i).toDouble
            // StrictMath: Spark's in-plan log is fdlibm, and Math.log's
            // intrinsic differs in the last ulp for ~5% of inputs
            val idf = StrictMath.log(1.0 + ((n - dfs(i)) + 0.5) / (dfs(i) + 0.5))
            idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl.toDouble / avgdl))
          }.reduce(_ + _)
          Some(id -> ((tfs.count(_ > 0L).toLong,
            BigDecimal(score).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
        }
      }.toMap
      val got = graft.ops.Retrieval.bm25(df, "text", "doc_id", query)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
      assert(got == expected, s"round $round query '$query': $got vs $expected")
    }
  }
}
