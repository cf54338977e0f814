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
}
