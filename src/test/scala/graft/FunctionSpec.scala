package graft

import org.scalatest.funsuite.AnyFunSuite

/** Exact-value checks for the gap functions (reference semantics from
  * SURVEY.md Appendix A; Hive 2.3 behavior). */
class FunctionSpec extends AnyFunSuite {
  import SparkTestSession._

  private def one(sql: String): Any =
    spark.sql(s"SELECT $sql AS v").collect()(0).get(0)

  test("floor_<unit> truncates timestamps") {
    assert(one("CAST(floor_day(TIMESTAMP '2024-03-15 13:45:12') AS STRING)")
      == "2024-03-15 00:00:00")
    assert(one("CAST(floor_month(TIMESTAMP '2024-03-15 13:45:12') AS STRING)")
      == "2024-03-01 00:00:00")
    assert(one("CAST(floor_hour(TIMESTAMP '2024-03-15 13:45:12') AS STRING)")
      == "2024-03-15 13:00:00")
    assert(one("CAST(floor_year(TIMESTAMP '2024-03-15 13:45:12') AS STRING)")
      == "2024-01-01 00:00:00")
  }

  test("floor_<unit>: remaining units (quarter/week/minute/second)") {
    assert(one("CAST(floor_quarter(TIMESTAMP '2024-05-15 13:45:12') AS STRING)")
      == "2024-04-01 00:00:00")
    assert(one("CAST(floor_week(TIMESTAMP '2024-03-15 13:45:12') AS STRING)")
      == "2024-03-11 00:00:00") // Monday
    assert(one("CAST(floor_minute(TIMESTAMP '2024-03-15 13:45:12') AS STRING)")
      == "2024-03-15 13:45:00")
    assert(one("CAST(floor_second(TIMESTAMP '2024-03-15 13:45:12.789') AS STRING)")
      == "2024-03-15 13:45:12")
  }

  test("Appendix A long tail: remaining builtin names all evaluate") {
    // every remaining reference function name not exercised elsewhere
    // (SURVEY.md Appendix A audit) — exact values where deterministic
    assert(one("round(acos(0.5), 4)") == 1.0472)
    assert(one("CAST(aes_decrypt(aes_encrypt('secret', '0000111122223333'), " +
      "'0000111122223333') AS STRING)") == "secret")
    assert(one("assert_true(1 < 2)") == null)
    assert(one("CAST(ceiling(3.2) AS INT)") == 4)
    assert(one("char_length('abc')") == 3)
    assert(one("character_length('abc')") == 3)
    assert(one("crc32(CAST('abc' AS BINARY))") == 891568578L)
    assert(one("current_database()") != null)
    assert(one("current_date() >= DATE '2026-01-01'") == true)
    assert(one("current_timestamp() > TIMESTAMP '2026-01-01 00:00:00'")
      == true)
    assert(one("current_user()") != null)
    assert(one("CAST(date_add(DATE '2024-01-31', 1) AS STRING)")
      == "2024-02-01")
    assert(one("CAST(date_sub(DATE '2024-03-01', 1) AS STRING)")
      == "2024-02-29")
    assert(one("date_format(TIMESTAMP '2024-03-15 13:45:12', 'yyyy/MM/dd')")
      == "2024/03/15")
    assert(one("CAST(from_utc_timestamp(TIMESTAMP '2024-01-01 00:00:00', " +
      "'America/Los_Angeles') AS STRING)") == "2023-12-31 16:00:00")
    assert(one("CAST(to_utc_timestamp(TIMESTAMP '2023-12-31 16:00:00', " +
      "'America/Los_Angeles') AS STRING)") == "2024-01-01 00:00:00")
    assert(one("java_method('java.lang.Math', 'abs', -3)") == "3")
    assert(one("lcase('AbC')") == "abc")
    assert(one("ucase('AbC')") == "ABC")
    assert(one("log2(8.0)") == 3.0)
    assert(one("ltrim('  x ')") == "x ")
    assert(one("rtrim('  x ')") == "  x")
    assert(one("nvl(NULL, 'd')") == "d")
    assert(one("power(2, 10)") == 1024.0)
    assert(one("printf('%d-%s', 7, 'x')") == "7-x")
    assert(one("round(radians(180.0), 6)") == 3.141593)
    assert(one("'abc' rlike '^a'") == true)
    assert(one("rpad('x', 3, '_')") == "x__")
    assert(one("sha1('abc')") == "a9993e364706816aba3e25717850c26c9cd0d89d")
    assert(one("CAST(smallint(70000 % 32768) AS INT)") == 4464)
    assert(one("CAST(tinyint(100) AS INT)") == 100)
    assert(one("CAST(to_date('2024-03-15 10:00:00') AS STRING)")
      == "2024-03-15")
    assert(one("to_unix_timestamp('2024-01-01', 'yyyy-MM-dd')")
      == 1704067200L)
    assert(one("CAST(unbase64('YWJj') AS STRING)") == "abc")
    assert(one("CAST(unhex('414243') AS STRING)") == "ABC")
    assert(one("length(uuid())") == 36)
    val x = "'<a><b>1</b><b>2.5</b></a>'"
    assert(one(s"xpath_boolean($x, 'a/b')") == true)
    assert(one(s"xpath_double($x, 'sum(a/b)')") == 3.5)
    assert(one(s"xpath_float($x, 'sum(a/b)')") == 3.5f)
    assert(one(s"xpath_long($x, 'sum(a/b)')") == 3L)
    assert(one(s"xpath_number($x, 'sum(a/b)')") == 3.5)
    assert(one(s"xpath_short($x, 'sum(a/b)')") == 3)
    // remaining UDAF names over a tiny inline relation
    val r = spark.sql(
      """SELECT round(regr_avgx(y, x), 4) AS ax,
        |  round(regr_avgy(y, x), 4) AS ay,
        |  round(regr_sxx(y, x), 4) AS sxx,
        |  round(regr_sxy(y, x), 4) AS sxy,
        |  round(regr_syy(y, x), 4) AS syy,
        |  round(stddev_pop(x), 4) AS sp
        |FROM (SELECT CAST(x AS DOUBLE) AS x, CAST(y AS DOUBLE) AS y
        |      FROM VALUES (1.0, 2.0), (2.0, 4.0), (3.0, 7.0) AS v(x, y))"""
        .stripMargin).collect()(0)
    assert(r.getDouble(0) == 2.0 && r.getDouble(1) == 4.3333)
    assert(r.getDouble(2) == 2.0 && r.getDouble(3) == 5.0)
    assert(r.getDouble(4) == 12.6667)
    assert(r.getDouble(5) == 0.8165)
  }

  test("field returns 1-based index or 0") {
    assert(one("field('b', 'a', 'b', 'c')") == 1 + 1)
    assert(one("field('z', 'a', 'b', 'c')") == 0)
    assert(one("field(CAST(NULL AS STRING), 'a')") == 0)
  }

  test("mask family") {
    assert(one("mask_first_n('Abcd1234', 4)") == "Xxxx1234")
    assert(one("mask_last_n('Abcd1234', 4)") == "Abcdnnnn")
    assert(one("mask_show_first_n('Abcd1234', 4)") == "Abcdnnnn")
    assert(one("mask_show_last_n('Abcd1234', 4)") == "Xxxxnnnn"
      .replace("nnnn", "1234"))
    assert(one("mask_first_n('ab', 4)") == "xx") // n clamped to length
    assert(one("mask_hash('abc')") ==
      "900150983cd24fb0d6963f7d28e17f72") // md5("abc")
  }

  test("sort_array_by sorts array<struct> by named field") {
    val r = spark.sql(
      """SELECT sort_array_by(array(
        |  named_struct('name', 'b', 'v', 3),
        |  named_struct('name', 'a', 'v', 1),
        |  named_struct('name', 'c', 'v', 2)), 'name') AS s""".stripMargin)
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
    assert(r.map(_.getString(0)) == Seq("a", "b", "c"))
    val desc = spark.sql(
      """SELECT sort_array_by(array(
        |  named_struct('name', 'b', 'v', 3),
        |  named_struct('name', 'a', 'v', 1)), 'v', 'DESC') AS s""".stripMargin)
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
    assert(desc.map(_.getInt(1)) == Seq(3, 1))
  }

  test("union type round trip") {
    assert(one("extract_union(create_union(1, 'x', 42), 1)") == 42)
    val tag = spark.sql("SELECT create_union(0, 'x', 42).tag AS v")
      .collect()(0).get(0)
    assert(tag == 0)
  }

  test("union type cast rules: tag dispatch to a common type") {
    // The reference's UNIONTYPE cast path: consuming a union coerces the
    // ACTIVE branch (by tag) to the target type. Expressed over the
    // struct encoding as tag-dispatched CASE + CAST — both branches of
    // a uniontype<string,int> land as STRING here.
    def dispatch(tag: Int) =
      one(s"""CASE create_union($tag, 'x', 42).tag
             |  WHEN 0 THEN extract_union(create_union($tag, 'x', 42), 0)
             |  ELSE CAST(extract_union(create_union($tag, 'x', 42), 1)
             |            AS STRING)
             |END""".stripMargin)
    assert(dispatch(0) == "x")
    assert(dispatch(1) == "42")
    // casting a whole union to string = struct cast (tag + all branches)
    val s = one("CAST(create_union(1, 'x', 42) AS STRING)")
    assert(s.toString.contains("42"))
  }

  test("union type malformed indexes fail loudly (negative paths)") {
    // A NEGATIVE index would resolve GetStructField ordinal 0 — the
    // TAG — silently serving the discriminator as a member value;
    // rejected at registration instead.
    val neg = intercept[Exception] {
      one("extract_union(create_union(1, 'x', 42), -1)")
    }
    assert(neg.getMessage.contains("negative"),
      s"unexpected: ${neg.getMessage}")
    // An over-arity index must die in analysis (ordinal out of
    // bounds), never return null or another member.
    val over = intercept[Exception] {
      one("extract_union(create_union(1, 'x', 42), 5)")
    }
    assert(over.getMessage != null)
    // The index is part of the union's static shape — a non-literal
    // (per-row) index is rejected with a usable message, not an
    // unresolved-expression stack trace.
    SparkTestSession.register()
    val nonLit = intercept[Exception] {
      spark.sql("SELECT extract_union(create_union(1, 'x', o_orderkey)," +
          " o_orderkey % 2) FROM orders").collect()
    }
    assert(nonLit.getMessage.contains("literal"),
      s"unexpected: ${nonLit.getMessage}")
  }

  test("bloom_filter / in_bloom_filter") {
    SparkTestSession.register()
    val r = spark.sql(
      """SELECT sum(CASE WHEN in_bloom_filter(o_orderkey,
        |  (SELECT bloom_filter(o_orderkey) FROM orders)) THEN 1 ELSE 0 END) AS hits,
        |       count(*) AS n
        |FROM orders""".stripMargin).collect()(0)
    assert(r.get(0) == r.get(1)) // zero false negatives
  }

  test("ngrams top-k") {
    val r = spark.sql(
      """SELECT ngrams(tokens, 2, 3) AS g FROM (
        |  SELECT split('the cat and the dog and the cat', ' ') AS tokens
        |)""".stripMargin).collect()(0).getSeq[org.apache.spark.sql.Row](0)
    // ties broken lexicographically: "and the" and "the cat" both occur 2×
    assert(r.head.getSeq[String](0) == Seq("and", "the"))
    assert(r.head.getDouble(1) == 2.0)
    assert(r(1).getSeq[String](0) == Seq("the", "cat"))
  }

  test("context_ngrams fills wildcard slots") {
    val r = spark.sql(
      """SELECT context_ngrams(tokens, array('the', CAST(NULL AS STRING)), 2) AS g
        |FROM (SELECT split('the cat and the dog and the cat', ' ') AS tokens)""".stripMargin)
      .collect()(0).getSeq[org.apache.spark.sql.Row](0)
    assert(r.head.getSeq[String](0) == Seq("cat"))
    assert(r.head.getDouble(1) == 2.0)
  }

  test("parse_url_tuple struct expansion") {
    val r = spark.sql(
      """SELECT p.* FROM (SELECT
        |  parse_url_tuple('http://h.io:8080/p/q?x=1', 'HOST', 'PATH', 'QUERY') AS p)""".stripMargin)
      .collect()(0)
    assert(r.getString(0) == "h.io")
    assert(r.getString(1) == "/p/q")
    assert(r.getString(2) == "x=1")
  }

  test("string-family builtins match Hive semantics") {
    assert(one("elt(2, 'a', 'b', 'c')") == "b")
    assert(one("find_in_set('b', 'a,b,c')") == 2)
    assert(one("initcap('hello world')") == "Hello World")
    assert(one("soundex('Robert')") == "R163")
    assert(one("levenshtein('kitten', 'sitting')") == 3)
    assert(one("substring_index('a.b.c', '.', 2)") == "a.b")
    assert(one("format_number(1234567.891, 2)") == "1,234,567.89")
    assert(one("concat_ws('-', 'a', NULL, 'b')") == "a-b")
    assert(one("space(3)") == "   ")
    assert(one("repeat('ab', 3)") == "ababab")
    assert(one("ascii('A')") == 65)
    assert(one("chr(66)") == "B")
    assert(one("str_to_map('a:1,b:2', ',', ':')['b']") == "2")
    assert(one("translate('abcd', 'ad', 'xy')") == "xbcy")
  }

  test("hive_hash reproduces Hive's GenericUDFHash values") {
    // Hive semantics (public GenericUDFHash / ObjectInspectorUtils):
    // multi-arg fold r = r*31 + h(arg); int hashes to itself; boolean
    // to 1/0; long to (int)(v ^ v>>>32); string to Text.hashCode
    // (byte-wise h = h*31 + b over UTF-8 — equals String.hashCode for
    // ASCII); null contributes 0. Spark's builtin hash() is Murmur3
    // and stays untouched.
    assert(one("hive_hash(42)") == 42)
    assert(one("hive_hash(true)") == 1)
    assert(one("hive_hash(false)") == 0)
    assert(one("hive_hash(CAST(1 AS BIGINT))") == 1)
    assert(one("hive_hash('ABC')") == "ABC".hashCode) // 64578
    assert(one("hive_hash('')") == 0)
    assert(one("hive_hash(1, 2)") == 33)       // 31*1 + 2
    assert(one("hive_hash(1, 2, 3)") == 1026)  // 31*33 + 3
    assert(one("hive_hash(CAST(NULL AS INT))") == 0)
    assert(one("hive_hash(1, CAST(NULL AS INT), 2)") == 31 * 31 * 1 + 2)
    // differs from Spark's Murmur3 hash() by design
    assert(one("hive_hash(42)") != one("hash(42)"))
  }

  test("math-family builtins match Hive semantics") {
    assert(one("conv('ff', 16, 10)") == "255")
    assert(one("bin(13)") == "1101")
    assert(one("hex(255)") == "FF")
    assert(one("factorial(5)") == 120L)
    assert(one("CAST(bround(2.5) AS DOUBLE)") == 2.0) // banker's rounding
    assert(one("CAST(bround(3.5) AS DOUBLE)") == 4.0)
    assert(one("CAST(round(2.5) AS DOUBLE)") == 3.0)  // half-up
    assert(one("pmod(-7, 3)") == 2)
    assert(one("shiftrightunsigned(-8, 2)") == 1073741822) // 32-bit input
    assert(one("shiftrightunsigned(CAST(-8 AS BIGINT), 2)")
      == 4611686018427387902L)
    assert(one("cbrt(27.0)") == 3.0)
    assert(one("degrees(pi())") == 180.0)
  }

  test("date-family builtins match Hive semantics") {
    assert(one("CAST(add_months(DATE '2024-01-31', 1) AS STRING)")
      == "2024-02-29")
    assert(one("CAST(next_day(DATE '2024-01-01', 'FRIDAY') AS STRING)")
      == "2024-01-05")
    assert(one("CAST(last_day(DATE '2024-02-10') AS STRING)") == "2024-02-29")
    assert(one("months_between(DATE '2024-03-15', DATE '2024-01-15')") == 2.0)
    assert(one("datediff(DATE '2024-01-10', DATE '2024-01-01')") == 9)
    assert(one("CAST(trunc(DATE '2024-03-15', 'MM') AS STRING)")
      == "2024-03-01")
    assert(one("dayofweek(DATE '2024-01-01')") == 2) // Monday
    assert(one("weekofyear(DATE '2024-01-04')") == 1)
    assert(one("quarter(DATE '2024-05-05')") == 2)
    assert(one("from_unixtime(0, 'yyyy-MM-dd')") == "1970-01-01")
  }

  test("json and url builtins") {
    assert(one("get_json_object('{\"a\": {\"b\": 7}}', '$.a.b')") == "7")
    val jt = spark.sql(
      "SELECT json_tuple('{\"x\": 1, \"y\": \"z\"}', 'x', 'y')").collect()(0)
    assert(jt.getString(0) == "1" && jt.getString(1) == "z")
    assert(one("parse_url('http://h.io/p?a=1', 'QUERY', 'a')") == "1")
  }

  test("approx_count_distinct is within HLL error bounds") {
    SparkTestSession.register()
    val r = spark.sql(
      """SELECT approx_count_distinct(o_orderkey) AS a,
        |       count(DISTINCT o_orderkey) AS e FROM orders""".stripMargin)
      .collect()(0)
    // default rsd 5% -> allow 3 sigma
    assert(math.abs(r.getLong(0) - r.getLong(1)).toDouble / r.getLong(1) < 0.15)
  }

  test("xpath family") {
    assert(one("xpath_string('<a><b>bb</b></a>', 'a/b')") == "bb")
    assert(one("xpath_int('<a><b>3</b></a>', 'a/b')") == 3)
    val arr = spark.sql(
      "SELECT xpath('<a><b>1</b><b>2</b></a>', 'a/b/text()') AS v")
      .collect()(0).getSeq[String](0)
    assert(arr == Seq("1", "2"))
  }

  test("sentences splits into words per sentence") {
    val r = spark.sql(
      "SELECT sentences('Hello there! How are you') AS s")
      .collect()(0).getSeq[scala.collection.Seq[String]](0)
    assert(r.length == 2 && r.head == Seq("Hello", "there"))
  }

  test("histogram_numeric bin counts sum to row count") {
    SparkTestSession.register()
    val r = spark.sql(
      """SELECT histogram_numeric(l_quantity, 5) AS h, count(*) AS n
        |FROM lineitem""".stripMargin).collect()(0)
    val bins = r.getSeq[org.apache.spark.sql.Row](0)
    assert(bins.length == 5)
    assert(math.round(bins.map(_.getDouble(1)).sum) == r.getLong(1))
  }

  test("interval constructors") {
    assert(one("CAST(interval_year_month('1-2') AS STRING)").toString
      .contains("1-2"))
  }

  test("cast error semantics: ANSI default, hive-compat via ansi=false, try_cast") {
    // The reference returns NULL for bad casts (non-ANSI Hive); Spark 4
    // defaults to ANSI errors. Both behaviors must be reachable.
    val prev = spark.conf.get("spark.sql.ansi.enabled")
    try {
      spark.conf.set("spark.sql.ansi.enabled", "false")
      val r = spark
        .sql("SELECT CAST('abc' AS INT) AS bad, CAST('42' AS INT) AS ok")
        .collect()(0)
      assert(r.isNullAt(0), "hive-compat mode must NULL a bad cast")
      assert(r.getInt(1) == 42)
    } finally spark.conf.set("spark.sql.ansi.enabled", prev)
    // try_cast / try_divide: NULL-on-error regardless of ANSI setting
    val t = spark.sql(
      """SELECT TRY_CAST('abc' AS INT) AS c,
        |  try_divide(10.0, 0) AS dz""".stripMargin).collect()(0)
    assert(t.isNullAt(0) && t.isNullAt(1))
  }
}
