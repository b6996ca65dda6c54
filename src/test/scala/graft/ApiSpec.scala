package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.api.{Col, StrOps, Table}

/** Blaze-semantics parity traps from SURVEY §7.4 item 4, each encoded as
  * a unit test before the oracle runs (mirrors the reference's
  * `test_sql_compute.py` case style).
  */
class ApiSpec extends SparkSpec {
  import spark.implicits._

  // single instance: self-references (t.filter(t("x") > 0)) need stable
  // attribute ids, exactly like Blaze's hash-consed exprs
  private lazy val accounts = Table(Seq(
    ("Alice", 100, 1), ("Bob", -200, 2), ("Charlie", 300, 3),
    ("Denis", 400, 4), ("Edith", -500, 5)).toDF("name", "amount", "id"))

  test("field access and projection preserve order") {
    assert(accounts.project("amount", "name").fields == Seq("amount", "name"))
  }

  test("missing field fails at construction time (Blaze eager analysis)") {
    val e = intercept[IllegalArgumentException](accounts.project("nope"))
    assert(e.getMessage.contains("nope"))
  }

  test("selection filters") {
    val r = accounts.filter(accounts("amount") > 0).df.collect()
    assert(r.length == 3)
  }

  test("by: result columns = grouper then ALPHABETICAL agg names") {
    val byT = accounts.merge("pos" -> (accounts("amount") > 0))
      .by("pos", "z_total" -> Col(sum(col("amount"))), "a_count" -> Col(count(lit(1))))
    assert(byT.fields == Seq("pos", "a_count", "z_total"))
  }

  test("merge: new columns appended in alphabetical order") {
    val m = accounts.merge("z" -> accounts("amount"), "b" -> accounts("id"))
    assert(m.fields == Seq("name", "amount", "id", "b", "z"))
  }

  test("join: output = keys, left non-key, right non-key; overlap suffixed") {
    val l = Table(Seq((1, "a", 10), (2, "b", 20)).toDF("id", "tag", "x"))
    val r = Table(Seq((1, "A", 7), (3, "C", 9)).toDF("id", "tag", "y"))
    val j = Table.join(l, r, Seq("id"), Seq("id"), "inner")
    assert(j.fields == Seq("id", "tag_left", "x", "tag_right", "y"))
    assert(j.df.collect().map(_.getInt(0)).toSeq == Seq(1))
  }

  test("join on multiple differently-named keys") {
    val l = Table(Seq((1, "x", 10), (1, "y", 11), (2, "x", 20)).toDF("a", "b", "v"))
    val r = Table(Seq((1, "x", 7.0), (2, "z", 9.0)).toDF("c", "d", "w"))
    val j = Table.join(l, r, Seq("a", "b"), Seq("c", "d"), "inner")
    assert(j.fields == Seq("a", "b", "v", "w"))
    val rows = j.df.collect()
    assert(rows.length == 1 && rows(0).getInt(2) == 10 && rows(0).getDouble(3) == 7.0)
  }

  test("join outer: key coalesced, both sides nullable") {
    val l = Table(Seq((1, 10), (2, 20)).toDF("id", "x"))
    val r = Table(Seq((2, 7), (3, 9)).toDF("id", "y"))
    val j = Table.join(l, r, Seq("id"), Seq("id"), "outer")
    val rows = j.df.orderBy("id").collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 3))
    assert(rows(0).isNullAt(2) && rows(2).isNullAt(1))
  }

  test("join: invalid how rejected eagerly") {
    val l = Table(Seq((1, 10)).toDF("id", "x"))
    intercept[IllegalArgumentException](Table.join(l, l, Seq("id"), Seq("id"), "cross"))
  }

  test("concat requires exact schema match (Blaze Concat)") {
    val a = Table(Seq((1, "x")).toDF("id", "s"))
    val b = Table(Seq(("x", 1)).toDF("s", "id"))
    intercept[IllegalArgumentException](a.concat(b))
    assert(a.concat(a).nrows == 2)
  }

  test("distinct(on) and countValues") {
    val d = accounts.merge("pos" -> (accounts("amount") > 0)).distinct("pos")
    assert(d.nrows == 2)
    val cv = accounts.merge("pos" -> (accounts("amount") > 0)).countValues("pos")
    assert(cv.fields == Seq("pos", "count"))
  }

  test("Div is always float64 (arithmetic.py:189-196)") {
    val r = accounts.merge("d" -> (accounts("id") / accounts("id")))
    assert(r.schema("d").dataType == DoubleType)
  }

  test("FloorDiv floors and stays integral (arithmetic.py:199-210)") {
    val r = accounts.merge("fd" -> accounts("amount").floorDiv(Col.lit(7))).df
      .select("fd").as[Long].collect().toSeq
    assert(r == Seq(14L, -29L, 42L, 57L, -72L)) // floor(-200/7) = -29
  }

  test("glob Like translation: * ? and literal % escaped (sql.py:1276-1278)") {
    assert(StrOps.globToSql("Ali*") == "Ali%")
    assert(StrOps.globToSql("A?ice") == "A_ice")
    assert(StrOps.globToSql("100%*") == "100\\%%")
    val r = accounts.filter(Col(accounts("name").str.like("Ali*"))).df.collect()
    assert(r.length == 1 && r(0).getString(0) == "Alice")
  }

  test("StrFind is 0-based with -1 for missing (pandas str.find)") {
    val r = accounts.merge("f" -> Col(accounts("name").str.find("li"))).df
      .select("f").as[Long].collect().toSeq
    assert(r == Seq(1L, -1L, 4L, -1L, -1L))
  }

  test("weekday is Monday=0 (pandas convention, sql.py:1408-1444)") {
    val df = Seq("2024-01-01", "2024-01-07").toDF("d")
      .select(to_timestamp(col("d")).as("ts"))
    val r = df.select(new graft.api.DtOps(col("ts")).weekday).as[Int].collect().toSeq
    assert(r == Seq(0, 6)) // 2024-01-01 is a Monday
  }

  test("dt.second is float64 (datetime.py:101-102)") {
    val df = Seq("2024-01-01 10:20:30").toDF("d").select(to_timestamp(col("d")).as("ts"))
    assert(df.select(new graft.api.DtOps(col("ts")).second).schema.head.dataType == DoubleType)
  }

  test("N-unit datetime truncate (datetime.py:203-254)") {
    val df = Seq("2024-03-17 10:27:45").toDF("d").select(to_timestamp(col("d")).as("ts"))
    val r = df.select(
      new graft.api.DtOps(col("ts")).truncate(10, "minutes").cast(StringType),
      new graft.api.DtOps(col("ts")).truncate(2, "months").cast(StringType),
      new graft.api.DtOps(col("ts")).truncate(5, "years").cast(StringType)
    ).collect()(0)
    assert(r.getString(0) == "2024-03-17 10:20:00")
    assert(r.getString(1) == "2024-03-01 00:00:00")
    assert(r.getString(2) == "2020-01-01 00:00:00")
  }

  test("sub-second truncate: ms is millisecond, not month") {
    val df = Seq(java.sql.Timestamp.valueOf("2024-03-17 10:20:30.123456")).toDF("ts")
    val r = df.select(
      new graft.api.DtOps(col("ts")).truncate(250, "ms").cast(StringType),
      new graft.api.DtOps(col("ts")).truncate(1, "ms").cast(StringType)
    ).collect()(0)
    assert(r.getString(0) == "2024-03-17 10:20:30")       // 30.000 (floor to 250ms grid)
    assert(r.getString(1) == "2024-03-17 10:20:30.123")
  }

  test("StrCat propagates nulls (strings.py:222-288)") {
    val df = Seq(("a", Some("b")), ("c", None)).toDF("l", "r")
    val r = df.select(new graft.api.StrOps(col("l")).cat(col("r"), "-")).as[Option[String]].collect()
    assert(r(0).contains("a-b") && r(1).isEmpty)
  }

  test("shift requires explicit order and null-pads (collections.py:914-950)") {
    val t0 = Table(Seq((1, 10.0), (2, 20.0), (3, 30.0)).toDF("k", "v"))
    val r = t0.shift("v", 1, Seq("k"), allowGlobal = true).df.orderBy("k").select("v")
      .collect().map(x => if (x.isNullAt(0)) None else Some(x.getDouble(0)))
    assert(r.toSeq == Seq(None, Some(10.0), Some(20.0)))
  }

  test("shift defaults to partitioned windows; global needs opt-in") {
    val t0 = Table(Seq((1, 1, 10.0), (1, 2, 20.0), (2, 1, 30.0)).toDF("g", "k", "v"))
    // no partition keys and no opt-in → refused at build time
    intercept[IllegalArgumentException] { t0.shift("v", 1, Seq("k")) }
    val shifted = t0.shift("v", 1, Seq("k"), partitionKeys = Seq("g"))
    // the physical plan must carry a partitioned window, not a global one
    val plan = shifted.df.queryExecution.executedPlan.toString
    assert(plan.contains("partitionBy") || !plan.contains("SinglePartition"),
      s"expected partitioned window in plan:\n$plan")
    val r = shifted.df.orderBy("g", "k").select("v")
      .collect().map(x => if (x.isNullAt(0)) None else Some(x.getDouble(0)))
    assert(r.toSeq == Seq(None, Some(10.0), None))
  }

  test("summary produces alphabetical one-row record (reductions.py:277-279)") {
    val sm = accounts.summary("z_max" -> accounts("amount").max,
      "a_min" -> accounts("amount").min)
    assert(sm.fields == Seq("a_min", "z_max"))
    assert(sm.nrows == 1)
  }

  test("tail = inverted sort + head + re-sort (sql.py:1523-1546)") {
    val r = accounts.tail(2, Seq("id")).df.select("id").as[Int].collect().toSeq
    assert(r == Seq(4, 5))
  }

  test("data() URI routing reads parquet") {
    val tb = Table.data(spark, s"$sf/region.parquet")
    assert(tb.nrows == 5)
  }

  test("scalar_coerce matrix: string literals coerce to column dtype (arithmetic.py:251-306)") {
    val df = Seq(
      (1, java.sql.Timestamp.valueOf("1998-09-01 12:00:00"), 10.5, java.sql.Date.valueOf("2020-01-15")),
      (2, java.sql.Timestamp.valueOf("1998-09-03 00:00:00"), 99.5, java.sql.Date.valueOf("2020-03-15")))
      .toDF("id", "ts", "amt", "d")
    val t0 = Table(df)
    // timestamp column vs date-string literal
    assert(t0.filter(t0("ts") <= "1998-09-02").df.count() == 1)
    // date column vs date-string literal
    assert(t0.filter(t0("d") === "2020-01-15").df.count() == 1)
    // numeric column vs numeric-string literal
    assert(t0.filter(t0("amt") > "50").df.count() == 1)
    // equality / inequality forms
    assert(t0.filter(t0("ts") > "1998-09-02").df.count() == 1)
    assert(t0.filter(t0("amt") !== "10.5").df.count() == 1)
  }

  test("timedelta namespace: days/seconds/microseconds/totalSeconds (datetime.py:369-383)") {
    val df = Seq((
      java.sql.Timestamp.valueOf("2020-01-03 02:00:00.000500"),
      java.sql.Timestamp.valueOf("2020-01-01 00:00:00"))).toDF("a", "b")
    val td = Col(new graft.api.DtOps(col("a")).sub(col("b")))
    val r = df.select(td.td.days, td.td.seconds, td.td.microseconds, td.td.totalSeconds)
      .collect()(0)
    assert(r.getLong(0) == 2L)        // 2 full days
    assert(r.getLong(1) == 7200L)     // 02:00:00 into the day
    assert(r.getLong(2) == 500L)      // sub-second µs
    assert(r.getDouble(3) == 2 * 86400.0 + 7200.0 + 0.0005)
  }

  test("timedelta components use pandas floor semantics for negative deltas") {
    val df = Seq((
      java.sql.Timestamp.valueOf("2020-01-01 00:00:00"),
      java.sql.Timestamp.valueOf("2020-01-01 02:30:00"))).toDF("a", "b")
    // a - b = -2.5 hours: pandas days=-1, seconds=77400 (21.5h), total=-9000
    val td = Col(new graft.api.DtOps(col("a")).sub(col("b")))
    val r = df.select(td.td.days, td.td.seconds, td.td.totalSeconds).collect()(0)
    assert(r.getLong(0) == -1L)
    assert(r.getLong(1) == 77400L)
    assert(r.getDouble(2) == -9000.0)
  }

  test("nanosecond accessor is 0 for µs-precision timestamps (datetime.py:77-83)") {
    val df = Seq(java.sql.Timestamp.valueOf("2020-01-01 00:00:00.123456")).toDF("ts")
    val r = df.select(new graft.api.DtOps(col("ts")).nanosecond).as[Long].collect()
    assert(r.toSeq == Seq(0L))
  }

  test("normalizeUnit: ms is millisecond (not month); unknown units throw") {
    import graft.api.DtOps.normalizeUnit
    assert(normalizeUnit("ms") == "millisecond")
    assert(normalizeUnit("milliseconds") == "millisecond")
    assert(normalizeUnit("m") == "month")
    assert(normalizeUnit("mins") == "minute")
    assert(normalizeUnit("S") == "second")
    intercept[IllegalArgumentException](normalizeUnit("fortnight"))
  }

  test("retag is a compile-time no-op; coerce converts (expressions.py:821-853)") {
    val c = accounts("amount")
    assert(c.retag("string").c eq c.c) // same Column — nothing happens
    val r = accounts.df.select(c.coerce("string").c).schema.head.dataType
    assert(r == StringType)
  }

  test("N-D array surface raises UnsupportedOperationException (SURVEY §2.12)") {
    intercept[UnsupportedOperationException](accounts.transpose)
    intercept[UnsupportedOperationException](accounts.tensordot(accounts))
  }

  test("jdbc:: URI routing round-trips through Derby") {
    val url = "jdbc:derby:target/test_derby;create=true"
    val props = new java.util.Properties()
    props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
    accounts.df.write.mode("overwrite").jdbc(url, "accounts_t", props)
    val back = Table.data(spark, s"$url::accounts_t")
    assert(back.nrows == 5)
    assert(back.fields.map(_.toLowerCase).sorted == Seq("amount", "id", "name"))
  }

  test("saltedSumBy equals plain grouped sum (skew-safe two-stage agg)") {
    val li = Table(Tables(spark, sf, "lineitem"))
    val D = DecimalType(18, 2)
    val plain = li.byFields(Seq("l_returnflag"),
        "q" -> Col(sum(col("l_quantity").cast(D))),
        "n" -> Col(count(lit(1))))
      .sort(Seq("l_returnflag")).df.collect()
    val salted = li.saltedSumBy(Seq("l_returnflag"), 8,
        "q" -> Col(col("l_quantity").cast(D)),
        "n" -> Col.lit(1L))
      .sort(Seq("l_returnflag")).df.collect()
    assert(salted.map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).toSeq ==
      plain.map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).toSeq)
  }

  test("partitioned writes prune at plan time (PartitionFilters)") {
    val o = Table(Tables(spark, sf, "orders"))
    val withYear = Table(o.df.withColumn("order_year", year(col("o_orderdate"))))
    val path = "target/part_orders"
    Table.writePartitioned(withYear, path, Seq("order_year"))
    val back = spark.read.parquet(path).filter(col("order_year") === 1995)
    val scan = back.queryExecution.executedPlan.toString
    // the year filter must land in PartitionFilters (directory pruning),
    // not in PushedFilters (row-group filtering)
    assert(scan.contains("PartitionFilters") &&
      scan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1").contains("order_year"),
      s"expected partition pruning on order_year:\n$scan")
    val exp = o.df.filter(year(col("o_orderdate")) === 1995).count()
    assert(back.count() == exp && exp > 0)
  }

  test("data() routes .txt through spark.read.text") {
    val path = "target/txt_probe"
    Seq("alpha", "beta").toDF("value").coalesce(1)
      .write.mode("overwrite").text(path)
    // read the directory written above via the .txt-suffixed glob
    val tb = Table.data(spark, s"$path/part-00000*.txt")
    assert(tb.fields == Seq("value") && tb.nrows == 2)
  }

  test("bucketed tables join without any exchange (co-located join)") {
    val o = Table(Tables(spark, sf, "orders"))
    val c = Table(Tables(spark, sf, "customer"))
    // clean both the catalog entry AND any stale location from a prior JVM
    Seq("orders_b", "customer_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = new java.io.File(s"target/spark-warehouse/$t")
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
        }
        rm(dir)
      }
    }
    Table.writeBucketed(o, "orders_b", Seq("o_custkey"), 4)
    Table.writeBucketed(c, "customer_b", Seq("c_custkey"), 4)
    val j = spark.table("orders_b").join(spark.table("customer_b"),
      col("o_custkey") === col("c_custkey"))
    val plan = j.queryExecution.executedPlan.toString
    // ShuffleExchangeExec prints as "Exchange hashpartitioning(...)" —
    // match that, not the class name, or the assertion is vacuous
    assert(!plan.contains("Exchange hashpartitioning"),
      s"expected exchange-free bucketed join, got:\n$plan")
    assert(j.count() == o.nrows)
  }

  test("nuniqueApprox lands within rsd of exact nunique") {
    val li = Table(Tables(spark, sf, "lineitem"))
    val exact = li.df.agg(countDistinct(col("l_partkey"))).collect()(0).getLong(0)
    val approx = li.df.agg(li("l_partkey").nuniqueApprox(0.05).c).collect()(0).getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.15, s"approx=$approx exact=$exact")
  }

  test("table-level like filters on every named column (strings.py:57-83)") {
    val r = accounts.like("name" -> "A*").df.collect()
    assert(r.map(_.getString(0)).toSeq == Seq("Alice"))
    val r2 = accounts.like("name" -> "*i*", "name" -> "??????*").df.collect()
    assert(r2.map(_.getString(0)).sorted.toSeq == Seq("Charlie"))
    intercept[IllegalArgumentException](accounts.like("nope" -> "x"))
  }

  test("timestamp ± timedelta arithmetic (arithmetic.py:117-139)") {
    val df = Seq(java.sql.Timestamp.valueOf("2020-01-01 00:00:00")).toDF("ts")
    val dt = new graft.api.DtOps(col("ts"))
    val r = df.select(
      dt.addUs(lit(90L * 60 * 1000000)).cast(StringType),
      dt.subUs(lit(1000000L)).cast(StringType)).collect()(0)
    assert(r.getString(0) == "2020-01-01 01:30:00")
    assert(r.getString(1) == "2019-12-31 23:59:59")
  }

  test("kernel SQL functions: extensions injection + live registration") {
    // the extensions class builds its injections without error (the
    // cluster path: --conf spark.sql.extensions=graft.GraftExtensions)
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    // live-session path
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT hamming_distance(7L, 1L) AS h,
        |  cosine_similarity(array(3.0D, 0.0D), array(1.0D, 0.0D)) AS c,
        |  normalized_md5('  Hello   World ') = normalized_md5('hello world') AS eq
        |""".stripMargin).collect()(0)
    assert(r.getLong(0) == 2L)
    assert(r.getDouble(1) == 1.0)
    assert(r.getBoolean(2))
  }

  test("plan shapes: top-k plans TakeOrderedAndProject; filters reach the scan") {
    val topk = SparkEntry.queries("sort_head")(spark, sf)
    assert(topk.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"),
      "limit-after-sort must plan as TakeOrderedAndProject, not a global sort")
    val q1 = SparkEntry.queries("q1_agg")(spark, sf)
    val scan = q1.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("LessThanOrEqual(l_shipdate"),
      s"q1 date filter must push into the parquet scan:\n${scan.take(500)}")
  }

  test("slice positional semantics") {
    val r = accounts.sort(Seq("id")).slice(1, 3).df.select("id").as[Int].collect().toSeq
    assert(r == Seq(2, 3))
  }
}
