package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.errors.{InvalidFormatError, SheetReadError}

class SheetDataSourceSpec extends SparkSpec {
  import spark.implicits._

  private def writeSheet(json: String): String = {
    val f = Files.createTempFile("sheet", ".json")
    Files.writeString(f, json)
    f.toString
  }

  test("reads array-of-objects with first-row schema, missing keys " +
      "→ NULL, extra keys ignored, scalars coerced to string") {
    val path = writeSheet(
      """[
        |  {"Name": "Ada", "Email": "ada@u.edu", "Score": 7},
        |  {"Name": "Bob", "Extra": "ignored"},
        |  {"Email": "eve@u.edu", "Name": null}
        |]""".stripMargin)
    val df = spark.read.format("sheet").load(path)
    assert(df.columns.toSeq == Seq("Name", "Email", "Score"))
    val got = df.as[(Option[String], Option[String], Option[String])]
      .collect().toSeq
    assert(got == Seq(
      (Some("Ada"), Some("ada@u.edu"), Some("7")),
      (Some("Bob"), None, None),
      (None, Some("eve@u.edu"), None)))
  }

  test("sheet source feeds the staffing pipeline end-to-end") {
    val path = writeSheet(
      """[
        |  {"Name": "Ada", "Email": "ada@u.edu", "Current Role": "SC",
        |   "NetID": "ada2", "Major": "CS",
        |   "a GMT-0600": "Monday, friday"},
        |  {"Name": "", "Email": "x@u.edu", "Current Role": "SC",
        |   "NetID": "x9", "Major": ""}
        |]""".stripMargin)
    val sheet = spark.read.format("sheet").load(path)
    val users = Seq.empty[(Long, String, String, String, String,
        Boolean, Boolean, Boolean, String, String)]
      .toDF("user_id", "name", "email", "gender", "race", "us_citizen",
        "residency", "first_gen", "curr_role", "netid")
    val consultants = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(
        org.apache.spark.sql.types.StructField("user_id",
          org.apache.spark.sql.types.LongType) +:
        graft.pipelines.Staffing.ConsultantsCols.map(c =>
          org.apache.spark.sql.types.StructField(c,
            org.apache.spark.sql.types.StringType))))
    val r = graft.pipelines.Staffing.run(sheet, users, consultants)
    assert(r.summary.as[(Long, Long)].collect().head == ((1L, 1L)))
    val ada = r.consultants
      .filter(org.apache.spark.sql.functions.col("user_id") === 1)
      .select("availability_mon", "availability_fri")
      .as[(String, String)].collect().head
    // single slot header → bit 1, padded to the fixed 30-char width
    assert(ada == ("1".padTo(30, '0'), "1".padTo(30, '0')))
  }

  test("column pruning reaches the scan: narrow projection reads " +
      "only requested fields") {
    val path = writeSheet(
      """[{"Name": "Ada", "Email": "ada@u.edu", "Major": "CS",
        |  "Minor": "Math", "College": "Eng"}]""".stripMargin)
    val narrow = spark.read.format("sheet").load(path)
      .select("Email", "Name")
    val scans = narrow.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.size == 1)
    // the scan itself (not a project above it) carries only the two
    // requested columns, in source field order
    assert(scans.head.scan.readSchema().fieldNames.toSeq ==
      Seq("Name", "Email"))
    assert(narrow.as[(String, String)].collect().toSeq ==
      Seq(("ada@u.edu", "Ada")))
  }

  test("error taxonomy: unreadable path → E005, bad payload → E003") {
    val e5 = intercept[SheetReadError] {
      spark.read.format("sheet").load("/nonexistent/sheet.json")
    }
    assert(e5.code == "E005")
    val e3 = intercept[InvalidFormatError] {
      spark.read.format("sheet")
        .load(writeSheet("""{"not": "an array"}"""))
    }
    assert(e3.code == "E003")
  }

  /** Local-fixture HTTP server (no network beyond loopback): serves
    * `body` with `status` at every path, runs `f` against the base
    * URL, always shuts down. */
  private def withHttp(body: String, status: Int = 200)
      (f: String => Unit): Unit = {
    val srv = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      val bytes = body.getBytes("UTF-8")
      ex.sendResponseHeaders(status, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    srv.start()
    try f(s"http://127.0.0.1:${srv.getAddress.getPort}")
    finally srv.stop(0)
  }

  test("live HTTP mode: option(\"url\") reads the web-app payload " +
      "end-to-end — schema inference, coercion, pruning, all over " +
      "the wire (the reference's production fetch)") {
    withHttp(
      """[
        |  {"Name": "Ada", "Email": "ada@u.edu", "Score": 7},
        |  {"Name": "Bob"}
        |]""".stripMargin) { base =>
      val df = spark.read.format("sheet")
        .option("url", s"$base/exec").load()
      assert(df.columns.toSeq == Seq("Name", "Email", "Score"))
      assert(df.as[(Option[String], Option[String], Option[String])]
        .collect().toSeq == Seq(
          (Some("Ada"), Some("ada@u.edu"), Some("7")),
          (Some("Bob"), None, None)))
      // pruning holds on the live path too
      val narrow = spark.read.format("sheet")
        .option("url", s"$base/exec").load().select("Email")
      val scans = narrow.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2
          .BatchScanExec => b
      }
      assert(scans.head.scan.readSchema().fieldNames.toSeq ==
        Seq("Email"))
    }
  }

  test("live HTTP mode feeds the staffing pipeline — the reference's " +
      "S1 production composition (web app → pipeline)") {
    withHttp(
      """[
        |  {"Name": "Ada", "Email": "ada@u.edu", "Current Role": "SC",
        |   "NetID": "ada2", "Major": "CS"}
        |]""".stripMargin) { base =>
      val sheet = spark.read.format("sheet")
        .option("url", s"$base/exec").load()
      val users = Seq.empty[(Long, String, String, String, String,
          Boolean, Boolean, Boolean, String, String)]
        .toDF("user_id", "name", "email", "gender", "race",
          "us_citizen", "residency", "first_gen", "curr_role", "netid")
      val consultants = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.StructType(
          org.apache.spark.sql.types.StructField("user_id",
            org.apache.spark.sql.types.LongType) +:
          graft.pipelines.Staffing.ConsultantsCols.map(c =>
            org.apache.spark.sql.types.StructField(c,
              org.apache.spark.sql.types.StringType))))
      val r = graft.pipelines.Staffing.run(sheet, users, consultants)
      assert(r.summary.as[(Long, Long)].collect().head == ((1L, 0L)))
    }
  }

  test("live HTTP error taxonomy: HTTP 500 → E005, non-JSON body → " +
      "E003, and option(\"timeoutMs\") overrides the default") {
    withHttp("boom", status = 500) { base =>
      val e5 = intercept[SheetReadError] {
        spark.read.format("sheet").option("url", s"$base/exec").load()
      }
      assert(e5.code == "E005")
    }
    withHttp("<html>not json</html>") { base =>
      val e3 = intercept[InvalidFormatError] {
        spark.read.format("sheet").option("url", s"$base/exec").load()
      }
      assert(e3.code == "E003")
    }
    // a bound-but-silent socket with a short explicit timeout: the
    // DataFrame-level option must reach the fetch
    val srv = new java.net.ServerSocket(0, 1)
    try {
      val t0 = System.nanoTime()
      val e = intercept[SheetReadError] {
        spark.read.format("sheet")
          .option("url", s"http://127.0.0.1:${srv.getLocalPort}/x")
          .option("timeoutMs", "300").load()
      }
      assert(e.code == "E005")
      assert((System.nanoTime() - t0) / 1e9 < 8.0,
        "timeoutMs option did not reach the HTTP fetch")
    } finally srv.close()
    val bad = intercept[InvalidFormatError] {
      spark.read.format("sheet").option("url", "http://x/")
        .option("timeoutMs", "-1").load()
    }
    assert(bad.code == "E003")
  }

  test("HTTP fetch times out promptly on a hung endpoint (E005)") {
    // a bound socket that never accepts/responds: the connect backlog
    // accepts the TCP handshake but no bytes ever arrive, which is
    // exactly the hung-web-app case the reference guards with its 10 s
    // timeout (staffing-roster-pipeline.py:79)
    val srv = new java.net.ServerSocket(0, 1)
    try {
      val url = s"http://127.0.0.1:${srv.getLocalPort}/sheet.json"
      val t0 = System.nanoTime()
      val e = intercept[SheetReadError] {
        SheetDataSource.fetch(url, timeoutMs = 500)
      }
      val secs = (System.nanoTime() - t0) / 1e9
      assert(e.code == "E005")
      assert(secs < 10.0, s"fetch hung ${secs}s — timeout not applied")
    } finally srv.close()
  }

  test("default fetch timeout matches the reference's 10s") {
    assert(SheetDataSource.FetchTimeoutMs == 10000)
  }

  test("fetch-once snapshot: one load() = exactly one GET, and the " +
      "scan replays the SAME payload even when the endpoint changes " +
      "(schema and rows can never come from different fetches)") {
    val hits = new java.util.concurrent.atomic.AtomicInteger(0)
    @volatile var payload = """[{"Name": "Ada"}, {"Name": "Bob"}]"""
    val srv = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      hits.incrementAndGet()
      val bytes = payload.getBytes("UTF-8")
      ex.sendResponseHeaders(200, bytes.length)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    srv.start()
    try {
      val base = s"http://127.0.0.1:${srv.getAddress.getPort}"
      val df = spark.read.format("sheet")
        .option("url", s"$base/exec").load()
      assert(hits.get() == 1, "schema inference must be the ONE fetch")
      // the endpoint mutates AFTER load(): the scan must keep serving
      // the inference snapshot — r13 re-fetched per read and coerced
      // the new payload into the stale schema
      payload = """[{"Renamed": "X"}]"""
      assert(df.as[String].collect().toSeq == Seq("Ada", "Bob"))
      assert(df.count() == 2)
      assert(hits.get() == 1,
        s"reads re-fetched the live endpoint (${hits.get()} GETs)")
      // a NEW load() takes a fresh snapshot
      val df2 = spark.read.format("sheet")
        .option("url", s"$base/exec").load()
      assert(df2.columns.toSeq == Seq("Renamed"))
      assert(hits.get() == 2)
    } finally srv.stop(0)
  }
}
