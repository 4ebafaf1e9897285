package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{IcebergFixture, IcebergIO, IcebergWrite}

/** Randomized SCHEMA-EVOLUTION fuzz: a seeded sequence of addColumn /
  * dropColumn / renameColumn / append / compact runs against a table
  * upgraded from an id-less external fixture (the name-mapping path),
  * with an in-memory row model carried through every mutation. Old
  * files must keep resolving by field id across arbitrarily many
  * renames, dropped columns must never resurrect, and post-evolution
  * appends must round-trip — per step, not just at the end. */
class IcebergSchemaFuzzSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("25 random schema ops keep every read exact (seed 23)") {
    val dir = s"/tmp/graft_schema_fuzz_${java.util.UUID.randomUUID().toString.take(8)}"
    IcebergFixture.deleteRecursively(dir)
    val rnd = new scala.util.Random(23)

    // live schema as ordered (name -> type); model rows as name->value
    // maps (absent key = null). Start from an ID-LESS external table so
    // the whole sequence exercises the name-mapping legacy branch too.
    var cols: Vector[(String, DataType)] =
      Vector("id" -> LongType, "a" -> StringType, "b" -> DoubleType)
    var rows: Vector[Map[String, Any]] = Vector.tabulate(6)(i =>
      Map("id" -> i.toLong, "a" -> s"a$i", "b" -> (i * 1.5)))
    var nextId = 6L
    var colSeq = 0

    def schema = StructType(cols.map { case (n, t) =>
      StructField(n, t, nullable = true) })
    def df(rs: Seq[Map[String, Any]]) = {
      val list = new java.util.ArrayList[Row]()
      rs.foreach(m => list.add(Row(cols.map(c => m.getOrElse(c._1, null)): _*)))
      spark.createDataFrame(list, schema)
    }
    val w = new IcebergFixture.Writer(spark, dir, schema)
    w.append(df(rows))
    IcebergWrite.addNameMapping(dir)

    def verify(step: String): Unit = {
      val got = IcebergIO.read(spark, dir).collect().map { r =>
        cols.zipWithIndex.flatMap { case ((n, _), i) =>
          if (r.isNullAt(i)) None else Some(n -> r.get(i))
        }.toMap
      }.sortBy(_("id").asInstanceOf[Long])
      val want = rows.sortBy(_("id").asInstanceOf[Long])
      assert(got.toSeq === want.toSeq, s"divergence after $step")
      assert(IcebergIO.read(spark, dir).schema.fieldNames.toSeq
        === cols.map(_._1), s"schema drift after $step")
    }
    verify("upgrade")

    for (step <- 1 to 25) {
      val op = rnd.nextInt(5)
      op match {
        case 0 => // add a fresh column (old rows read it as null)
          colSeq += 1
          val n = s"c$colSeq"
          val t: DataType = if (rnd.nextBoolean()) LongType else StringType
          IcebergWrite.addColumn(dir, n, t)
          cols :+= (n -> t)
        case 1 if cols.size > 2 => // drop a random non-id column
          val candidates = cols.drop(1)
          val victim = candidates(rnd.nextInt(candidates.size))._1
          IcebergWrite.dropColumn(spark, dir, victim)
          cols = cols.filterNot(_._1 == victim)
          rows = rows.map(_ - victim)
        case 2 => // rename a random column (id included — why not)
          colSeq += 1
          val i = rnd.nextInt(cols.size)
          val (old, t) = cols(i)
          if (old != "id") { // keep the model's sort key stable
            val nn = s"r$colSeq"
            IcebergWrite.renameColumn(dir, old, nn)
            cols = cols.updated(i, nn -> t)
            rows = rows.map(m => m.get(old) match {
              case Some(v) => (m - old) + (nn -> v)
              case None => m
            })
          }
        case 3 => // append rows under the CURRENT schema
          val fresh = (0 until 1 + rnd.nextInt(3)).map { _ =>
            val id = nextId; nextId += 1
            cols.map {
              case ("id", _) => "id" -> (id: Any)
              case (n, LongType) => n -> (id * 10: Any)
              case (n, DoubleType) => n -> (id * 0.5: Any)
              case (n, _) => n -> (s"v$id": Any)
            }.toMap
          }
          IcebergWrite.append(df(fresh), dir)
          rows ++= fresh
        case _ => // compact folds the legacy branch + mixed schemas away
          IcebergWrite.compact(spark, dir)
      }
      verify(s"step $step (op $op)")
    }
  }

  test("25 random ops with COLUMN DEFAULTS + DV deletes stay exact (seed 41)") {
    val dir = s"/tmp/graft_defaults_fuzz_${java.util.UUID.randomUUID().toString.take(8)}"
    IcebergFixture.deleteRecursively(dir)
    val rnd = new scala.util.Random(41)

    var cols: Vector[(String, DataType)] =
      Vector("id" -> LongType, "a" -> StringType)
    // columns added with a default: name -> write-default (what an
    // omitting append must be filled with)
    var writeDefaults: Map[String, Any] = Map.empty
    var rows: Vector[Map[String, Any]] = Vector.tabulate(6)(i =>
      Map("id" -> i.toLong, "a" -> s"a$i"))
    var nextId = 6L
    var colSeq = 0

    def schema = StructType(cols.map { case (n, t) =>
      StructField(n, t, nullable = true) })
    def dfOf(rs: Seq[Map[String, Any]], cs: Vector[(String, DataType)]) = {
      val list = new java.util.ArrayList[Row]()
      rs.foreach(m => list.add(Row(cs.map(c => m.getOrElse(c._1, null)): _*)))
      spark.createDataFrame(list,
        StructType(cs.map { case (n, t) => StructField(n, t, nullable = true) }))
    }
    // v3 field-id table: the envelope column defaults require
    IcebergWrite.create(spark, dir, schema, formatVersion = 3)
    IcebergWrite.append(dfOf(rows, cols), dir)

    def verify(step: String): Unit = {
      val got = IcebergIO.read(spark, dir).collect().map { r =>
        cols.zipWithIndex.flatMap { case ((n, _), i) =>
          if (r.isNullAt(i)) None else Some(n -> r.get(i))
        }.toMap
      }.sortBy(_("id").asInstanceOf[Long])
      val want = rows.sortBy(_("id").asInstanceOf[Long])
      assert(got.toSeq === want.toSeq, s"divergence after $step")
    }
    verify("create")

    for (step <- 1 to 25) {
      val op = rnd.nextInt(6)
      op match {
        case 0 => // add a column WITH a default: every live row reads it
          colSeq += 1
          val n = s"d$colSeq"
          val (t: DataType, init: Any, wd: Any) =
            if (rnd.nextBoolean()) (LongType, 100L + colSeq, 900L + colSeq)
            else (StringType, s"init$colSeq", s"wd$colSeq")
          IcebergWrite.addColumnWithDefault(dir, n, t, init, Some(wd))
          cols :+= (n -> t)
          writeDefaults += (n -> wd)
          rows = rows.map(_ + (n -> init))
        case 1 => // plain add (old rows read null); coin-flip adds a v3
          // `unknown` column instead — it stores nothing, reads null
          // from every file, and the writer omits it physically, so it
          // must survive the whole verb storm (appends, DV deletes,
          // compactions, drops) without ever holding a value
          colSeq += 1
          val n = s"c$colSeq"
          val t: DataType = if (rnd.nextBoolean()) NullType else LongType
          IcebergWrite.addColumn(dir, n, t)
          cols :+= (n -> t)
        case 2 if cols.size > 2 => // drop a random non-id column
          val victim = cols.drop(1)(rnd.nextInt(cols.size - 1))._1
          IcebergWrite.dropColumn(spark, dir, victim)
          cols = cols.filterNot(_._1 == victim)
          writeDefaults -= victim
          rows = rows.map(_ - victim)
        case 3 => // append; coin-flip OMITS every defaulted column (the
          // writer must fill write-defaults), else full schema
          val omit = rnd.nextBoolean() && writeDefaults.nonEmpty
          val appendCols =
            if (omit) cols.filterNot(c => writeDefaults.contains(c._1))
            else cols
          val fresh = (0 until 1 + rnd.nextInt(3)).map { _ =>
            val id = nextId; nextId += 1
            appendCols.flatMap {
              case (_, NullType) => None // unknown: no value to carry
              case ("id", _) => Some("id" -> (id: Any))
              case (n, LongType) => Some(n -> (id * 10: Any))
              case (n, _) => Some(n -> (s"v$id": Any))
            }.toMap
          }
          IcebergWrite.append(dfOf(fresh, appendCols), dir)
          rows ++= fresh.map(m =>
            if (omit) m ++ writeDefaults.filter(kv => cols.exists(_._1 == kv._1))
            else m)
        case 4 if rows.nonEmpty => // DV delete of a random surviving id
          val victim = rows(rnd.nextInt(rows.size))("id").asInstanceOf[Long]
          IcebergWrite.deleteWhere(spark, dir,
            org.apache.spark.sql.functions.col("id") === victim)
          rows = rows.filterNot(_("id") == victim)
        case _ => // compact materializes injected defaults physically
          IcebergWrite.compact(spark, dir)
      }
      verify(s"step $step (op $op)")
    }
    assert(writeDefaults.nonEmpty || colSeq > 0) // the run exercised evolution
  }
}
