package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row

/** Golden tests for the function-parity layer, mirroring the reference's
  * exact-output assertions (reference:
  * ballista/client/src/context.rs:797-1027). */
class FunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def one(sql: String): Row = spark.sql(sql).collect()(0)

  test("crypto: sha224/sha256/sha384/sha512/md5/digest known vectors") {
    val r = one(
      """SELECT sha224('abc') AS a, sha2('abc', 256) AS b, sha384('abc') AS c,
        |       sha512('abc') AS d, md5('abc') AS e,
        |       digest('abc', 'sha256') AS f, digest('abc', 'md5') AS g""".stripMargin)
    assert(r.getString(0) == "23097d223405d8228642a477bda255b32aadbce4bda0b3f7e36c9da7")
    assert(r.getString(1) == "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad")
    assert(r.getString(2) == "cb00753f45a35e8bb5a03d699ac65007272c32ab0eded1631a8b605a43ff5bed8086072ba1e7cc2358baeca134c825a7")
    assert(r.getString(3) == "ddaf35a193617abacc417349ae20413112e6fa4e89a97ea20a9eeee64b55d39a2192992a274fc1a836ba3c23a3feebbd454d4423643ce80e2a9ac94fa54ca49f")
    assert(r.getString(4) == "900150983cd24fb0d6963f7d28e17f72")
    assert(r.getString(5) == r.getString(1))
    assert(r.getString(6) == r.getString(4))
  }

  test("to_timestamp_* reinterprets integral input at the named unit") {
    val r = one(
      """SELECT unix_micros(to_timestamp_seconds(2)) AS a,
        |       unix_micros(to_timestamp_millis(1500)) AS b,
        |       unix_micros(to_timestamp_micros(1500000)) AS c""".stripMargin)
    assert(r.getLong(0) == 2000000L)
    assert(r.getLong(1) == 1500000L)
    assert(r.getLong(2) == 1500000L)
  }

  test("to_timestamp_* truncates string input down to the unit") {
    val r = one(
      """SELECT unix_micros(to_timestamp_millis('2024-01-02 03:04:05.678999')) AS a,
        |       unix_micros(to_timestamp_seconds('2024-01-02 03:04:05.678999')) AS b,
        |       unix_micros(to_timestamp_micros('2024-01-02 03:04:05.678999')) AS c""".stripMargin)
    assert(r.getLong(0) % 1000 == 0)
    assert(r.getLong(1) % 1000000 == 0)
    assert(r.getLong(0) == r.getLong(1) + 678000)
    assert(r.getLong(2) == r.getLong(1) + 678999)
  }

  test("regexp_match: first-match groups, NULL on miss, 'i' flag") {
    val r = one(
      """SELECT regexp_match('aaa', 'a') AS m1,
        |       regexp_match('foo123bar', '([a-z]+)([0-9]+)') AS m2,
        |       regexp_match('xyz', 'q') AS m3,
        |       regexp_match('ABC', 'abc', 'i') AS m4""".stripMargin)
    assert(r.getSeq[String](0) == Seq("a"))
    assert(r.getSeq[String](1) == Seq("foo", "123"))
    assert(r.isNullAt(2))
    assert(r.getSeq[String](3) == Seq("ABC"))
  }

  test("countCaptureGroups handles escapes, classes and non-capturing groups") {
    import graft.functions.GraftFunctions.countCaptureGroups
    assert(countCaptureGroups("abc") == 0)
    assert(countCaptureGroups("(a)(b)") == 2)
    assert(countCaptureGroups("(?:a)(b)") == 1)
    assert(countCaptureGroups("\\(a\\)(b)") == 1)
    assert(countCaptureGroups("[(](a)") == 1)
    assert(countCaptureGroups("(?<user>[a-z]+)@(\\w+)") == 2) // named groups capture
    assert(countCaptureGroups("(?<=x)(a)") == 1) // lookbehind does not
    assert(countCaptureGroups("(?<!x)(a)") == 1)
  }

  test("date_bin snaps onto the stride grid anchored at origin") {
    val r = one(
      """SELECT date_bin(INTERVAL 15 MINUTE, TIMESTAMP '2024-01-01 00:22:33',
        |                TIMESTAMP '2024-01-01 00:00:00') AS b1,
        |       date_bin(INTERVAL 2 HOUR, TIMESTAMP '2024-01-01 05:00:00',
        |                TIMESTAMP '2024-01-01 01:00:00') AS b2""".stripMargin)
    assert(r.getTimestamp(0).toString == "2024-01-01 00:15:00.0")
    assert(r.getTimestamp(1).toString == "2024-01-01 05:00:00.0")
  }

  test("aggregate aliases resolve and compute") {
    val r = one(
      """SELECT approx_distinct(x) AS ad, var(x) AS v, correlation(x, y) AS c,
        |       approx_median(x) AS am, sort_array(array_agg(x)) AS aa
        |FROM VALUES (1.0D, 2.0D), (2.0D, 4.0D), (3.0D, 6.0D) AS t(x, y)""".stripMargin)
    assert(r.getLong(0) == 3L)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12)
    assert(r.getDouble(3) == 2.0)
    assert(r.getSeq[Double](4) == Seq(1.0, 2.0, 3.0))
  }

  test("strpos / arrow_typeof / make_array aliases") {
    val r = one(
      "SELECT strpos('hello', 'll') AS p, arrow_typeof(1.5D) AS t, make_array(1, 2) AS a")
    assert(r.getInt(0) == 3)
    assert(r.getString(1) == "double")
    assert(r.getSeq[Int](2) == Seq(1, 2))
  }

  test("now / current_date / current_timestamp resolve and are current") {
    val r = one("SELECT now() AS n, current_date() AS d, current_timestamp() AS ts")
    val nowMs = System.currentTimeMillis()
    assert(math.abs(r.getTimestamp(0).getTime - nowMs) < 60000)
    assert(math.abs(r.getTimestamp(2).getTime - nowMs) < 60000)
    assert(math.abs(r.getDate(1).getTime - nowMs) < 2 * 86400000L)
  }

  test("current_time returns ns-since-midnight within a day") {
    val r = one("SELECT current_time() AS t")
    val ns = r.getLong(0)
    assert(ns >= 0 && ns < 86400L * 1000000000L)
  }

  test("every reference ScalarFunction spelling resolves and evaluates") {
    // the full 73-entry enum (SURVEY §2C, datafusion.proto:448-522), one
    // canned invocation per name — a completeness pin for the parity layer
    val calls = Seq(
      // math
      "abs(-1.5)", "acos(0.5)", "asin(0.5)", "atan(0.5)", "atan2(1.0, 1.0)",
      "ceil(1.2)", "cos(1.0)", "exp(1.0)", "floor(1.2)", "ln(2.0)",
      "log(100.0)", "log(2.0, 8.0)", "log10(100.0)", "log2(8.0)",
      "power(2.0, 3.0)", "round(1.234)", "signum(-3)", "sin(1.0)",
      "sqrt(4.0)", "tan(1.0)", "trunc(-3.7)", "trunc(3.14159, 2)",
      "random()",
      // strings
      "ascii('A')", "bit_length('ab')", "btrim('  x  ')", "char_length('abc')",
      "chr(65)", "concat('a', 'b')", "concat_ws('-', 'a', 'b')",
      "initcap('hello world')", "left('abcd', 2)", "lpad('x', 3, '*')",
      "lower('AB')", "ltrim('  x')", "octet_length('ab')", "repeat('ab', 2)",
      "replace('aaa', 'a', 'b')", "reverse('abc')", "right('abcd', 2)",
      "rpad('x', 3, '*')", "rtrim('x  ')", "split_part('a,b,c', ',', 2)",
      "starts_with('abc', 'ab')", "strpos('abc', 'b')", "substr('abcd', 2, 2)",
      "to_hex(255)", "translate('abc', 'ab', 'xy')", "trim('  x  ')",
      "upper('ab')",
      // regex
      "regexp_match('ab1', '[0-9]')", "regexp_replace('ab1', '[0-9]', 'x')",
      // crypto
      "digest('abc', 'sha256')", "md5('abc')", "sha224('abc')",
      "sha256('abc')", "sha384('abc')", "sha512('abc')",
      // date/time
      "date_part('year', TIMESTAMP '2024-01-02 03:04:05')",
      "date_trunc('month', TIMESTAMP '2024-01-02 03:04:05')",
      "date_bin(INTERVAL '1' HOUR, TIMESTAMP '2024-01-02 03:04:05')",
      "to_timestamp('2024-01-02 03:04:05')", "to_timestamp_millis(1500)",
      "to_timestamp_micros(1500000)", "to_timestamp_seconds(2)",
      "from_unixtime(1)", "now()", "current_date()", "current_time()",
      // misc
      "array(1, 2)", "make_array(1, 2)", "nullif(1, 2)", "coalesce(NULL, 1)",
      "struct(1, 2)", "arrow_typeof(1)", "uuid()")
    calls.foreach { c =>
      val rows = spark.sql(s"SELECT $c AS v").collect()
      assert(rows.length == 1, s"$c returned no row")
    }
    // dialect-divergent spellings return the DataFusion semantics
    assert(one("SELECT log(100.0) AS v").getDouble(0) == 2.0)        // base 10
    assert(one("SELECT trunc(-3.7) AS v").getDouble(0) == -3.0)      // toward 0
    assert(one("SELECT trunc(3.14159, 2) AS v").getDouble(0) == 3.14)
    assert(one("SELECT starts_with('abc', 'ab') AS v").getBoolean(0))
    assert(one("SELECT sha256('abc') AS v").getString(0).startsWith("ba7816bf"))
  }

  test("every reference AggregateFunction spelling resolves and evaluates") {
    // the 19-entry enum (SURVEY §2C, datafusion.proto:529-549)
    val aggs = Seq(
      "min(x)", "max(x)", "sum(x)", "avg(x)", "count(x)",
      "approx_distinct(x)", "array_agg(x)", "var(x)", "var_samp(x)",
      "var_pop(x)", "stddev(x)", "stddev_pop(x)", "covar(x, w)",
      "covar_pop(x, w)", "correlation(x, w)",
      "approx_percentile_cont(x, 0.5)",
      "approx_percentile_cont_with_weight(x, w, 0.5)",
      "approx_median(x)", "median(x)", "grouping(g)")
    aggs.foreach { a =>
      val rows = spark.sql(
        s"""SELECT $a AS v FROM VALUES (1.0D, 1.0D, 'a'), (2.0D, 2.0D, 'a'),
           |(3.0D, 1.0D, 'b') AS t(x, w, g) GROUP BY g WITH ROLLUP""".stripMargin)
        .collect()
      assert(rows.nonEmpty, s"$a returned no rows")
    }
  }

  test("every reference BuiltInWindowFunction spelling resolves and evaluates") {
    // the 11-entry enum (SURVEY §2C, datafusion.proto:583-594)
    val wins = Seq(
      "row_number()", "rank()", "dense_rank()", "percent_rank()",
      "cume_dist()", "ntile(2)", "lag(x)", "lead(x)", "first_value(x)",
      "last_value(x)", "nth_value(x, 2)")
    wins.foreach { w =>
      val rows = spark.sql(
        s"""SELECT $w OVER (PARTITION BY g ORDER BY x) AS v
           |FROM VALUES (1, 'a'), (2, 'a'), (3, 'b') AS t(x, g)""".stripMargin)
        .collect()
      assert(rows.length == 3, s"$w returned wrong row count")
    }
  }

  test("vec_dot: known vectors, float casts, zip semantics, null elements") {
    val r = one(
      """SELECT vec_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS a,
        |       vec_dot(array(CAST(1.5 AS FLOAT)), array(CAST(2.0 AS FLOAT))) AS b,
        |       vec_dot(array(1.0D, 2.0D), array(3.0D)) AS c,
        |       vec_dot(array(1.0D, CAST(NULL AS DOUBLE)), array(2.0D, 9.0D)) AS d,
        |       vec_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0D)) AS e""".stripMargin)
    assert(r.getDouble(0) == 32.0)       // 4 + 10 + 18
    assert(r.getDouble(1) == 3.0)        // float input implicitly cast
    assert(r.getDouble(2) == 3.0)        // common prefix only (zip)
    assert(r.getDouble(3) == 2.0)        // null element contributes 0
    assert(r.isNullAt(4))                // null array -> null
  }

  test("vec_dot survives both codegen and interpreted evaluation") {
    val sql = "SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d"
    assert(one(sql).getDouble(0) == 11.0)
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(one(sql).getDouble(0) == 11.0)
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("approx_percentile_cont_with_weight interpolates weighted percentiles") {
    val r = one(
      """SELECT approx_percentile_cont_with_weight(x, w, 0.5) AS p
        |FROM VALUES (1.0D, 1.0D), (2.0D, 1.0D), (3.0D, 1.0D) AS t(x, w)""".stripMargin)
    assert(r.getDouble(0) == 2.0)
    // a heavy weight drags the percentile toward its value
    val r2 = one(
      """SELECT approx_percentile_cont_with_weight(x, w, 0.5) AS p
        |FROM VALUES (1.0D, 100.0D), (2.0D, 1.0D), (3.0D, 1.0D) AS t(x, w)""".stripMargin)
    assert(r2.getDouble(0) < 1.1)
  }
}
