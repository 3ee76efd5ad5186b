package graft.cli

import java.nio.file.Files

import graft.SparkSpec

/** The argv shell ([[Cli]]): query routing (flag/file/stdin/positional),
  * the three output formats, --no-header, --save, --param binding, the
  * E21 bad-table hint, and the pack dry-run path — mirroring the
  * reference's engine_test.go / main.go runQuery cases.
  */
class CliSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def run(args: String*): (String, Int) =
    Cli.parseArgs(sf +: args) match {
      case Right(a) => Cli.run(spark, a)
      case Left(err) => (err, 2)
    }

  test("positional query renders a table with a row count") {
    val (out, code) = run("SELECT r_name FROM region ORDER BY r_name")
    assert(code == 0, out)
    assert(out.contains("r_name") && out.contains("AFRICA"))
    assert(out.contains("5 row(s)"), out)
  }

  test("--output csv and json; --no-header drops the CSV header") {
    val (csv, c1) = run("--query",
      "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey",
      "--output", "csv")
    assert(c1 == 0 && csv.startsWith("r_regionkey,r_name"), csv)
    val (noHead, c2) = run("--query",
      "SELECT r_regionkey FROM region ORDER BY r_regionkey",
      "--output", "csv", "--no-header")
    assert(c2 == 0 && noHead.startsWith("0"), noHead)
    val (json, c3) = run("--query",
      "SELECT r_name FROM region WHERE r_regionkey = 0",
      "--output", "json")
    assert(c3 == 0 && json.contains("\"r_name\": \"AFRICA\""), json)
  }

  test("--file reads SQL from disk; --save dumps the formatted output") {
    val dir = tempDir("cli")
    val f = dir.resolve("q.sql")
    Files.writeString(f, "SELECT COUNT(*) AS n FROM nation")
    val saved = dir.resolve("out.txt")
    val (out, code) = run("--file", f.toString, "--save", saved.toString)
    assert(code == 0 && out.contains("25"), out)
    assert(Files.readString(saved) == out)
  }

  test("--stdin reads the query text from the provided reader") {
    val a = Cli.parseArgs(Seq(sf, "--stdin")).toOption.get
    val (out, code) = Cli.run(spark, a,
      readStdin = () => "SELECT COUNT(*) AS n FROM region")
    assert(code == 0 && out.contains("5"), out)
  }

  test("--param binds named parameters") {
    val (out, code) = run("--query",
      "SELECT r_name FROM region WHERE r_name = :rname",
      "--param", "rname=ASIA")
    assert(code == 0 && out.contains("ASIA") && out.contains("1 row(s)"), out)
  }

  test("unknown table fails with the nearest-name hint (E21)") {
    val (out, code) = run("SELECT * FROM regoin")
    assert(code == 1, out)
    assert(out.contains("Error:"), out)
    assert(out.contains("Did you mean 'region'?"), out)
  }

  test("statement guard rejects non-queries with exit 1") {
    val (out, code) = run("DROP TABLE region")
    assert(code == 1 && out.contains("Error:"), out)
  }

  test("repl: two queries and a bad-table hint through one session") {
    val session =
      """SELECT COUNT(*) AS n FROM region;
        |
        |SELECT * FROM regoin
        |SELECT r_name FROM region WHERE r_regionkey = 2
        |exit
        |SELECT 'never reached' AS x
        |""".stripMargin
    val in = new java.io.BufferedReader(new java.io.StringReader(session))
    val (out, code) = Cli.runArgv(spark, Seq(sf, "repl"),
      blockServe = false, replIn = () => in)
    assert(code == 0, out)
    assert(out.contains("5"), out)                       // first query ran
    // mid-session error answers with the E21 hint and keeps going
    assert(out.contains("Did you mean 'region'?"), out)
    assert(out.contains("ASIA"), out)                    // session continued
    assert(!out.contains("never reached"), out)          // exit stops the loop
  }

  test("EXPLAIN <sql> renders the formatted plan + plan facts without " +
      "executing") {
    val (out, code) = run("--query",
      "EXPLAIN SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'")
    assert(code == 0, out)
    assert(out.contains("== Physical Plan =="), out)
    // the pushdown the engine guards is visible to the user
    assert(out.contains("PushedFilters:") &&
      out.contains("EqualTo(c_mktsegment,BUILDING)"), out)
    assert(out.contains("== Plan Facts =="), out)
    assert(out.contains("parquet_scans = 1"), out)
    assert(out.contains("scans_with_pushed_filters = 1"), out)
    assert(out.contains("cartesian_products = 0"), out)
    // params bind into the explained frame too
    val (p, cp) = run("--query",
      "EXPLAIN SELECT n_regionkey FROM nation WHERE n_name = :nm",
      "--param", "nm=FRANCE")
    assert(cp == 0 && p.contains("EqualTo(n_name,FRANCE)"), p)
  }

  test("explain subcommand: --name shows a driver query's pinned plan " +
      "shape; --sql guards; unknown name errors") {
    val (out, code) = Cli.runArgv(spark,
      Seq(sf, "explain", "--name", "q_j1_join_agg"))
    assert(code == 0, out)
    assert(out.contains("== Physical Plan ==") &&
      out.contains("== Plan Facts =="), out)
    // the broadcast pin PlanQualitySpec asserts, now user-visible
    assert(out.contains("broadcast_hash_joins = 1") ||
      out.contains("broadcast_exchanges = 1"), out)
    val (sqlOut, c2) = Cli.runArgv(spark, Seq(sf, "explain", "--sql",
      "SELECT r_name FROM region ORDER BY r_name LIMIT 2"))
    assert(c2 == 0 && sqlOut.contains("take_ordered_and_project = 1"), sqlOut)
    val (guard, c3) = Cli.runArgv(spark, Seq(sf, "explain", "--sql",
      "DROP TABLE region"))
    assert(c3 == 1 && guard.contains("dangerous operation rejected"), guard)
    val (bad, c4) = Cli.runArgv(spark,
      Seq(sf, "explain", "--name", "q_nonexistent"))
    assert(c4 == 1 && bad.contains("unknown driver query"), bad)
    val (noargs, c5) = Cli.runArgv(spark, Seq(sf, "explain"))
    assert(c5 == 2, noargs)
  }

  test("pack dry-run validates every enabled query") {
    // the resource table a real run would find in the table dir
    graft.fixtures.CorkscrewFixtures.register(spark)
    val (out, code) = run("--pack", "packs/cfi/ccc-storage/manifest.yaml",
      "--dry-run", "--param",
      "trusted_kms_keys=arn:aws:kms:us-east-1:123456789012:key/key-1")
    assert(code == 0, out)
    assert(out.linesIterator.nonEmpty)
    assert(!out.contains("INVALID"), out)
  }

  test("bad flags exit 2 with usage") {
    assert(Cli.parseArgs(Seq(sf, "--frobnicate")).isLeft)
    assert(Cli.parseArgs(Seq(sf, "--output", "xml")).isLeft)
    assert(Cli.parseArgs(Seq(sf, "--param", "noequals")).isLeft)
  }

  test("subcommands: version, info, list, describe route the scan seam") {
    assert(Cli.runArgv(spark, Seq(sf, "version")) == (Cli.Version, 0))
    val (info, c1) = Cli.runArgv(spark, Seq(sf, "info"))
    assert(c1 == 0 && info.contains("\"fake-aws\""), info)
    val (listed, c2) = Cli.runArgv(spark,
      Seq(sf, "list", "--service", "s3", "--region", "us-east-1"))
    assert(c2 == 0 && listed.contains("s3-us-east-1-0") &&
      listed.contains("row(s)"), listed)
    val (desc, c3) = Cli.runArgv(spark, Seq(sf, "describe",
      "--service", "s3", "--region", "us-east-1",
      "--id", "arn:fake:s3:us-east-1:123456789012:res/3"))
    assert(c3 == 0 && desc.contains("\\\"SizeGb\\\":9"), desc)
    val (miss, c4) = Cli.runArgv(spark, Seq(sf, "describe",
      "--service", "s3", "--region", "us-east-1", "--id", "nope"))
    assert(c4 == 1 && miss.contains("no resource"), miss)
  }

  test("scan: fans out, commits to the snapshot store, upsert on rescan") {
    val dir = tempDir("cli-scan").toString
    val (out1, c1) = Cli.runArgv(spark, Seq(sf, "scan",
      "--services", "s3,ec2", "--regions", "us-east-1", "--out", dir))
    assert(c1 == 0, out1)
    assert(out1.contains("scanned 2 task(s)"), out1)
    assert(out1.contains("total_resources=400") &&
      out1.contains("s3=200") && out1.contains("committed=v"), out1)
    // rescan: first-write-wins upsert — same totals, version advances
    val (out2, c2) = Cli.runArgv(spark, Seq(sf, "scan",
      "--services", "s3,ec2", "--regions", "us-east-1", "--out", dir))
    assert(c2 == 0 && out2.contains("total_resources=400"), out2)
    val store = new graft.catalog.SnapshotTableStore(dir)
    assert(store.currentVersion("resources").exists(_ >= 2))
    assert(store.read(spark, "resources").count() == 400)
  }

  test("subcommands: --plugin routes list/info over the gRPC wire") {
    assume(graft.engine.GrpcTransport.available)
    val srv = new graft.sources.GrpcScannerServer(
      new graft.sources.FakeCloudProvider(perServiceRegion = 5))
    srv.start()
    try {
      val ep = s"127.0.0.1:${srv.boundPort}"
      val (info, c1) = Cli.runArgv(spark, Seq(sf, "info", "--plugin", ep))
      assert(c1 == 0 && info.contains("\"fake-aws\""), info)
      val (listed, c2) = Cli.runArgv(spark, Seq(sf, "list",
        "--service", "ec2", "--region", "eu-west-1", "--plugin", ep))
      assert(c2 == 0 && listed.contains("ec2-eu-west-1-4") &&
        listed.contains("5 row(s)"), listed)
      val (bad, c3) = Cli.runArgv(spark, Seq(sf, "list",
        "--service", "ghost", "--region", "eu-west-1", "--plugin", ep))
      assert(c3 == 1 && bad.contains("unknown service"), bad)
    } finally srv.stop()
  }

  test("subcommands: discover and list-packs render their tables") {
    val (disc, c1) = Cli.runArgv(spark, Seq(sf, "discover"))
    assert(c1 == 0 && disc.contains("AWS::IAM::Role") &&
      disc.contains("4 row(s)"), disc)
    val (packs, c2) = Cli.runArgv(spark, Seq(sf, "list-packs"))
    assert(c2 == 0 && packs.contains("ccc-storage"), packs)
  }

  test("subcommands: schemas infers the JSON payload; serve binds and stops") {
    graft.fixtures.CorkscrewFixtures.register(spark)
    val (tree, c1) = Cli.runArgv(spark,
      Seq(sf, "schemas", "--table", "aws_resources", "--sample", "5"))
    assert(c1 == 0 && tree.contains("root") && tree.contains("--"), tree)
    val (http, c2) = Cli.runArgv(spark, Seq(sf, "serve"),
      blockServe = false)
    assert(c2 == 0 && http.contains("HTTP query API listening"), http)
    if (graft.engine.GrpcTransport.available) {
      val (grpc, c3) = Cli.runArgv(spark, Seq(sf, "serve", "--grpc"),
        blockServe = false)
      assert(c3 == 0 && grpc.contains("gRPC query API listening"), grpc)
    }
  }
}
