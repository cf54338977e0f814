package graft

import graft.filter.MetadataFilterDsl

/** Mirrors the reference's filter tests (`src/index/filter.rs:441-552`)
  * against a typed table: rows with (source, type, lines, flag) where the
  * reference used JSON metadata objects. */
class FilterDslSpec extends SparkSpec {
  import spark.implicits._

  // doc1 = {"source":"main.rs","type":"code","lines":100}
  // doc2 = {"type":"code","lang":"rust"}            (source missing)
  // doc3 = {"source":"/path/to/main.rs"}            (type/lines missing)
  private lazy val df = Seq(
    (1, Some("main.rs"), Some("code"), Some(100), Some("rust")),
    (2, None: Option[String], Some("code"), None: Option[Int], Some("rust")),
    (3, Some("/path/to/main.rs"), None: Option[String], None: Option[Int], None: Option[String]))
    .toDF("id", "source", "type", "lines", "lang")

  private def ids(filter: String): Set[Int] = {
    val col = MetadataFilterDsl.toColumn(filter, df)
    assert(col.isDefined, s"unparseable: $filter")
    df.filter(col.get).select("id").as[Int].collect().toSet
  }

  test("glob suffix source:*.rs")(assert(ids("source:*.rs") == Set(1, 3)))
  test("eq type=code")(assert(ids("type=code") == Set(1, 2)))
  test("eq colon form type:code")(assert(ids("type:code") == Set(1, 2)))
  test("numeric gt lines>50")(assert(ids("lines>50") == Set(1)))
  test("numeric gte/lte") {
    assert(ids("lines>=100") == Set(1))
    assert(ids("lines<=100") == Set(1))
    assert(ids("lines<50") == Set.empty[Int])
  }
  test("ne is true when field missing (ref :335)") {
    assert(ids("type!=text") == Set(1, 2, 3))
    assert(ids("type!=code") == Set(3))
  }
  test("in list")(assert(ids("type in [code,text,doc]") == Set(1, 2)))
  test("not_in is true when field missing (ref :347-353)") {
    assert(ids("type not_in [text,doc]") == Set(1, 2, 3))
    assert(ids("type not_in [code]") == Set(3))
  }
  test("comma AND")(assert(ids("type=code,lines>50") == Set(1)))
  test("explicit AND")(assert(ids("type=code AND lines>50") == Set(1)))
  test("OR lower precedence")(assert(ids("lines>50 OR source:*to*") == Set(1, 3)))
  test("contains tilde")(assert(ids("source~main") == Set(1, 3)))
  test("contains glob")(assert(ids("source:*main*") == Set(1, 3)))
  test("starts_with caret")(assert(ids("source^/path") == Set(3)))
  test("starts_with glob")(assert(ids("source:main*") == Set(1)))
  test("ends_with dollar")(assert(ids("source$.rs") == Set(1, 3)))
  test("exists")(assert(ids("source?") == Set(1, 3)))
  test("missing column: eq false, ne true (ref absent-field semantics)") {
    assert(ids("missing_field=1") == Set.empty[Int])
    assert(ids("missing_field!=1") == Set(1, 2, 3))
    assert(ids("missing_field?") == Set.empty[Int])
  }
  test("comma inside brackets is not a conjunction split") {
    assert(ids("type in [code,text],lines>50") == Set(1))
  }
  test("value coercion: bool and string") {
    val b = Seq((1, true), (2, false)).toDF("id", "flag")
    val c = MetadataFilterDsl.toColumn("flag=true", b).get
    assert(b.filter(c).select("id").as[Int].collect().toSet == Set(1))
  }
  test("unparseable returns None") {
    assert(MetadataFilterDsl.parse("").isEmpty)
    assert(MetadataFilterDsl.parse("noop").isEmpty)
  }

  test("driver-side eval == Catalyst compile over the full grammar") {
    // The warm serving tier evaluates the SAME AST in-process
    // (MetadataFilterDsl.eval over nested-Map rows); every branch must
    // agree with the compiled Column on the same data — including the
    // missing-field truth table, numeric Long/Double coercion, string
    // ordering, dotted struct paths and type mismatches.
    val rows: Seq[Map[String, Any]] = Seq(
      Map("id" -> 1, "source" -> "main.rs", "type" -> "code",
        "lines" -> 100L, "lang" -> "rust",
        "meta" -> Map("depth" -> 2, "tag" -> "x")),
      Map("id" -> 2, "type" -> "code", "lang" -> "rust"),
      Map("id" -> 3, "source" -> "/path/to/main.rs",
        "meta" -> Map("depth" -> 5)),
      Map("id" -> 4, "source" -> "zz.txt", "lines" -> 49.5,
        "flag" -> true))
    val df4 = Seq(
      (1, Some("main.rs"), Some("code"), Some(100.0), Some("rust"),
        Some((Some(2), Some("x"))), None: Option[Boolean]),
      (2, None, Some("code"), None, Some("rust"), None, None),
      (3, Some("/path/to/main.rs"), None, None, None,
        Some((Some(5), None: Option[String])), None),
      (4, Some("zz.txt"), None, Some(49.5), None, None, Some(true)))
      .toDF("id", "source", "type", "lines", "lang", "meta", "flag")
      .withColumn("meta", org.apache.spark.sql.functions.col("meta")
        .cast("struct<depth:int,tag:string>"))
    // lines differs in TYPE across the two fixtures (Long vs Double in
    // the maps, Double column in the df) — the coercion rules make the
    // comparisons agree regardless
    val filters = Seq(
      "source:*.rs", "type=code", "type:code", "lines>50", "lines>=100",
      "lines<=100", "lines<50", "lines=100", "lines!=100",
      "type!=text", "type!=code", "type in [code,text,doc]",
      "type not_in [text,doc]", "type not_in [code]",
      "type=code,lines>50", "type=code AND lines>50",
      "lines>50 OR source:*to*", "source~main", "source:*main*",
      "source^/path", "source:main*", "source$.rs", "source?",
      "missing_field=1", "missing_field!=1", "missing_field?",
      "type in [code,text],lines>50", "flag=true", "flag!=false",
      "meta.depth>3", "meta.depth=2", "meta.tag=x", "meta.tag?",
      "meta?", "meta=x", "source>a", "source<zz", "type>5",
      "meta.depth in [2,5]", "lines>49", "lines>49.4")
    filters.foreach { f =>
      val node = MetadataFilterDsl.parse(f)
      assert(node.isDefined, s"unparseable: $f")
      val compiled = df4.filter(MetadataFilterDsl.compile(node.get, df4))
        .select("id").as[Int].collect().toSet
      val evaled = rows.filter(r =>
        MetadataFilterDsl.eval(node.get, MetadataFilterDsl.lookupIn(r)))
        .map(_("id").asInstanceOf[Int]).toSet
      assert(evaled == compiled,
        s"eval/compile disagree on '$f': eval=$evaled compile=$compiled")
    }
  }

  test("property: eval == compile on generated filters over generated rows") {
    import org.scalacheck.{Gen, Prop, Test => PropTest}
    import org.apache.spark.sql.functions.col
    // Generated row set, built ONCE as both representations: the
    // Dataset the Catalyst compiler filters and the nested-Map rows
    // the warm tier's interpreter walks. Value pools are shared with
    // the literal generator below so comparisons hit both truth
    // branches, and every field is independently nullable (the
    // missing-field truth table is where the two engines most easily
    // drift).
    val words = Vector("main", "zz", "code", "text", "alpha")
    val nums = Vector(0L, 3L, 50L, 100L)
    val dbls = Vector(0.5, 49.5, 100.0)
    val rnd = new scala.util.Random(20260816L)
    def opt[A](v: A): Option[A] = if (rnd.nextBoolean()) Some(v) else None
    val tuples = (1 to 30).map { i =>
      val meta: Option[(Option[Int], Option[String])] = {
        val d = opt(rnd.nextInt(6))
        val t = opt(words(rnd.nextInt(words.length)))
        if (d.isEmpty && t.isEmpty) None else Some((d, t))
      }
      (i, opt(nums(rnd.nextInt(nums.length))),
        opt(dbls(rnd.nextInt(dbls.length))),
        opt(words(rnd.nextInt(words.length))),
        opt(rnd.nextBoolean()), meta)
    }
    val pdf = tuples.toDF("id", "num", "dbl", "str", "flag", "meta")
      .withColumn("meta", col("meta").cast("struct<depth:int,tag:string>"))
      .cache()
    pdf.count()
    val mrows: Seq[Map[String, Any]] = tuples.map { case (i, n, d, s, f, m) =>
      Map("id" -> i) ++ n.map("num" -> _) ++ d.map("dbl" -> _) ++
        s.map("str" -> _) ++ f.map("flag" -> _) ++
        m.map { case (dep, tag) =>
          "meta" -> (Map.empty[String, Any] ++ dep.map("depth" -> _) ++
            tag.map("tag" -> _)) }
    }
    val genField = Gen.oneOf("num", "dbl", "str", "flag",
      "meta.depth", "meta.tag", "ghost")
    val genLit = Gen.oneOf(
      nums.map(_.toString) ++ dbls.map(_.toString) ++
        words :+ "true" :+ "false")
    val genCond: Gen[String] = for {
      f <- genField
      lit <- genLit
      lit2 <- genLit
      cond <- Gen.oneOf(
        s"$f=$lit", s"$f!=$lit", s"$f>$lit", s"$f>=$lit", s"$f<$lit",
        s"$f<=$lit", s"$f~$lit", s"$f^$lit", s"$f$$$lit", s"$f?",
        s"$f:*$lit*", s"$f:$lit*", s"$f in [$lit,$lit2]",
        s"$f not_in [$lit,$lit2]")
    } yield cond
    val genFilter: Gen[String] = for {
      n <- Gen.choose(1, 3)
      cs <- Gen.listOfN(n, genCond)
      sep <- Gen.oneOf(",", " OR ", " AND ")
    } yield cs.mkString(sep)
    val parsed = new java.util.concurrent.atomic.AtomicInteger()
    val prop = Prop.forAll(genFilter) { f =>
      MetadataFilterDsl.parse(f) match {
        case None => true // generator produced something unparseable — fine
        case Some(node) =>
          parsed.incrementAndGet()
          val compiled = pdf.filter(MetadataFilterDsl.compile(node, pdf))
            .select("id").as[Int].collect().toSet
          val evaled = mrows.filter(r =>
            MetadataFilterDsl.eval(node, MetadataFilterDsl.lookupIn(r)))
            .map(_("id").asInstanceOf[Int]).toSet
          if (evaled != compiled)
            println(s"DISAGREE '$f': eval=$evaled compile=$compiled")
          evaled == compiled
      }
    }
    val r = PropTest.check(
      PropTest.Parameters.default.withMinSuccessfulTests(120), prop)
    assert(r.passed, r.status.toString)
    // the property must not pass vacuously on an unparseable generator
    assert(parsed.get() >= 60, s"only ${parsed.get()} of 120 filters parsed")
    pdf.unpersist()
  }
}
