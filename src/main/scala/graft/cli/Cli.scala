package graft.cli

import graft.Barrier.BarrierOps

import java.nio.file.{Files, Paths}

import scala.util.control.NonFatal

import org.apache.spark.sql.SparkSession

import graft.Tables
import graft.compliance.{ComplianceExecutor, PackLoader}
import graft.engine.QueryEngine

/** The command-line query surface (cmd/corkscrew/main.go:797-901 `runQuery`):
  * SQL from `--query` / `--file` / `--stdin` / a positional argument,
  * compliance packs via `--pack` (+ `--tag`, `--param k=v`, `--dry-run`),
  * output as table / CSV / JSON (`--output`, `--no-header`), optional
  * `--save path` dump of the formatted result. Errors route through the
  * E21 hint path — an unknown table suggests the nearest catalog name.
  *
  * The argv shell is a thin layer: all semantics live in [[QueryEngine]]
  * (guarded execution, param binding), [[ComplianceExecutor]] (pack
  * pipeline), and [[Formatters]] (presentation), each spec-tested on its
  * own. `run` is a pure `(argv) => (text, exitCode)` function so CliSpec
  * drives it without a JVM fork; `main` adds the SparkSession and
  * System.exit around it.
  */
object Cli {

  final case class CliArgs(
      sfDir: String,
      query: Option[String] = None,
      file: Option[String] = None,
      stdin: Boolean = false,
      pack: Option[String] = None,
      tags: Seq[String] = Nil,
      params: Map[String, Any] = Map.empty,
      dryRun: Boolean = false,
      output: String = "table",
      noHeader: Boolean = false,
      save: Option[String] = None)

  /** Parse argv: first positional is the table directory (the reference's
    * `--db`), a later positional is the query text (main.go:861-863).
    */
  def parseArgs(argv: Seq[String]): Either[String, CliArgs] = {
    if (argv.isEmpty) return Left(usage)
    var a = CliArgs(sfDir = argv.head)
    var rest = argv.tail.toList
    var positional: Option[String] = None
    while (rest.nonEmpty) {
      rest match {
        case "--query" :: v :: t => a = a.copy(query = Some(v)); rest = t
        case "--file" :: v :: t => a = a.copy(file = Some(v)); rest = t
        case "--stdin" :: t => a = a.copy(stdin = true); rest = t
        case "--pack" :: v :: t => a = a.copy(pack = Some(v)); rest = t
        case "--tag" :: v :: t =>
          a = a.copy(tags = v.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
          rest = t
        case "--param" :: v :: t =>
          v.split("=", 2) match {
            case Array(k, value) => a = a.copy(params = a.params + (k -> value))
            case _ => return Left(s"--param wants k=v, got '$v'")
          }
          rest = t
        case "--dry-run" :: t => a = a.copy(dryRun = true); rest = t
        case "--output" :: v :: t =>
          if (!Set("table", "csv", "json").contains(v))
            return Left(s"--output wants table|csv|json, got '$v'")
          a = a.copy(output = v); rest = t
        case "--no-header" :: t => a = a.copy(noHeader = true); rest = t
        case "--save" :: v :: t => a = a.copy(save = Some(v)); rest = t
        case flag :: _ if flag.startsWith("--") =>
          return Left(s"unknown flag '$flag'\n$usage")
        case pos :: t =>
          if (positional.nonEmpty) return Left(s"extra argument '$pos'")
          positional = Some(pos); rest = t
        case Nil => ()
      }
    }
    if (a.query.isEmpty && positional.nonEmpty) a = a.copy(query = positional)
    Right(a)
  }

  val usage: String =
    """usage: graft.Cli <tableDir> [sql] [flags]
      |       graft.Cli <tableDir> <subcommand> [flags]
      |query flags:
      |  --query SQL | --file path.sql | --stdin   query source
      |  --pack manifest.yaml [--tag a,b] [--dry-run]  compliance pack
      |  --param k=v        bind a named parameter (repeatable)
      |  --output table|csv|json   (default table)
      |  --no-header        omit the header row (table/CSV)
      |  --save path        also write the formatted output to a file
      |subcommands (main.go command tree):
      |  scan     [--services a,b] [--regions r1,r2] [--plugin host:port]
      |           [--out dir]   scan + transactional commit + ScanStats
      |  discover [--plugin host:port]            service discovery table
      |  list-packs [--packs-dir dir]             installed compliance packs
      |  info     [--plugin host:port]            provider info
      |  list     --service s --region r [--plugin host:port]
      |  describe --service s --region r --id id [--plugin host:port]
      |  explain  --name q_x | --sql SQL          formatted plan + plan facts
      |           (--name BUILDS the query's frame: stateful/streaming
      |            queries run their pipeline stages to produce the plan;
      |            --sql never executes)
      |  schemas  --table t [--json-col raw_data] [--sample N]
      |  serve    [--grpc] [--port N]             remote query API
      |  repl     interactive shell: one SQL per line; exit/quit leaves
      |  version
      |""".stripMargin

  val Version = "graft 1.0.0"

  private val SubCommands = Set("scan", "discover", "info", "list",
    "describe", "schemas", "serve", "version", "list-packs", "explain")

  /** Subcommand router (main.go:85-118's command switch). The scan-side
    * commands route through the [[graft.sources.ScannerProvider]] seam —
    * `--plugin host:port` talks to a live plugin endpoint over gRPC, the
    * default uses the in-process fake provider (the zero-egress
    * stand-in). `serve` starts the remote query API; `blockServe = false`
    * (spec mode) returns immediately after binding.
    */
  private def runSub(spark: SparkSession, sfDir: String, sub: String,
      rest: List[String], blockServe: Boolean): (String, Int) = {
    def flag(name: String): Option[String] = {
      val i = rest.indexOf(s"--$name")
      if (i >= 0 && i + 1 < rest.size) Some(rest(i + 1)) else None
    }
    def need(name: String): String = flag(name).getOrElse(
      throw new IllegalArgumentException(s"$sub needs --$name"))
    def endpoint: Option[(String, Int)] = flag("plugin").map { hp =>
      val Array(h, p) = hp.split(":", 2)
      (h, p.toInt)
    }
    import graft.sources._
    lazy val fake = new FakeCloudProvider()
    sub match {
      case "version" => (Version, 0)
      case "scan" =>
        // The reference's primary command (main.go:87, `corkscrew scan`):
        // fan the (service x region) matrix out across executors, commit
        // the scanned resources transactionally, report ScanStats. With
        // no --plugin endpoint an ephemeral in-process server fronts the
        // fake provider so even the default path exercises the real wire.
        val t0 = System.nanoTime()
        val services = flag("services").map(_.split(",").toSeq)
          .getOrElse(endpoint match {
            case Some((h, p)) =>
              // an unfiltered scan must discover from the ENDPOINT — the
              // remote plugin's service list, not the local stand-in's
              import spark.implicits._
              spark.read.json(
                  Seq(GrpcScannerClient.discoverServices(h, p)).toDS)
                .select(org.apache.spark.sql.functions.explode(
                  org.apache.spark.sql.functions.col("services")).as("s"))
                .select("s.name").collect().map(_.getString(0)).toSeq
            case None => fake.discoverServices().map(_.name)
          })
        val regions = flag("regions").map(_.split(",").toSeq)
          .getOrElse(Seq("us-east-1"))
        val work = for (s0 <- services; r <- regions) yield ScanTask(s0, r)
        // localCheckpoint in every branch: the summary reads the frame
        // twice (per-service counts + commit), and re-streaming the whole
        // matrix from a remote endpoint per action would both double the
        // wire cost and let the two reads disagree
        val scanned = (endpoint match {
          case Some((h, p)) =>
            ScannerSource.scanDistributed(spark, h, p, work)
              .barrier(true)
          case None if graft.engine.GrpcTransport.available =>
            val srv = new GrpcScannerServer(fake)
            srv.start()
            try ScannerSource
              .scanDistributed(spark, "127.0.0.1", srv.boundPort, work)
              .barrier(true) // materialize before the server stops
            finally srv.stop()
          case None => ScannerSource.scanLocal(spark, fake, work)
        }).withColumn("scanned_at",
          org.apache.spark.sql.functions.current_timestamp())
        val outDir = flag("out")
        val committed = outDir.map { dir =>
          // race-safe path: upsertLoad retries the merge from the new
          // current version when a concurrent commit claims the slot
          new graft.catalog.SnapshotTableStore(dir)
            .upsertLoad(spark, "resources", scanned)
        }
        val merged = outDir match {
          case Some(dir) => new graft.catalog.SnapshotTableStore(dir)
            .read(spark, "resources")
          case None => scanned
        }
        val counts = merged.groupBy("service").count()
          .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
        val perService =
          counts.map { case (s0, n) => s"$s0=$n" }.mkString(", ")
        val ms = (System.nanoTime() - t0) / 1000000
        (s"scanned ${work.size} task(s); " +
          s"total_resources=${counts.map(_._2).sum}" +
          s" [$perService] duration_ms=$ms" +
          committed.map(v =>
            s" committed=v$v at ${outDir.get}").getOrElse(""),
          0)
      case "discover" =>
        // main.go:89 `corkscrew discover` — the service-discovery table
        val services = endpoint match {
          case Some((h, p)) =>
            import spark.implicits._
            val raw = GrpcScannerClient.discoverServices(h, p)
            spark.read.json(Seq(raw).toDS)
              .select(org.apache.spark.sql.functions.explode(
                org.apache.spark.sql.functions.col("services")).as("s"))
              .select("s.name", "s.display_name", "s.resource_type")
              .collect().toSeq
          case None => fake.discoverServices().map(s =>
            org.apache.spark.sql.Row(s.name, s.displayName, s.resourceType))
        }
        (Formatters.table(Seq("name", "display_name", "resource_type"),
          services), 0)
      case "list-packs" =>
        // main.go:826/843 `--list-packs` — installed compliance packs
        val dir = flag("packs-dir").getOrElse(
          sys.env.getOrElse("GRAFT_PACKS_DIR", "/root/repo/packs"))
        val packs = graft.compliance.PackLoader.discover(Seq(dir))
        val rows = packs.toSeq.sortBy(_._1).map { case (full, m) =>
          org.apache.spark.sql.Row(full, m.version, m.provider,
            m.queries.count(_.enabled).toString)
        }
        (Formatters.table(
          Seq("pack", "version", "provider", "enabled_queries"), rows), 0)
      case "info" => endpoint match {
        case Some((h, p)) => (GrpcScannerClient.providerInfo(h, p), 0)
        case None =>
          val i = fake.providerInfo
          (s"""{"name":${ScannerWire.jstr(i.name)},"version":${
            ScannerWire.jstr(i.version)},"supported_services":${
            i.supportedServices.map(ScannerWire.jstr)
              .mkString("[", ",", "]")}}""", 0)
      }
      case "list" =>
        val (svc, reg) = (need("service"), need("region"))
        val refs = endpoint match {
          case Some((h, p)) =>
            // parse the wire payload back to rows via Spark's JSON reader
            import spark.implicits._
            val raw = GrpcScannerClient.listResources(h, p, svc, reg)
            if (raw.contains("\"error\""))
              return (s"Error: $raw", 1)
            spark.read.json(Seq(raw).toDS)
              .select(org.apache.spark.sql.functions.explode(
                org.apache.spark.sql.functions.col("resources")).as("r"))
              .select("r.id", "r.name", "r.type")
              .collect().toSeq
          case None => fake.listResources(svc, reg).map(r =>
            org.apache.spark.sql.Row(r.id, r.name, r.resourceType))
        }
        (Formatters.table(Seq("id", "name", "type"), refs), 0)
      case "describe" =>
        val (svc, reg, id) = (need("service"), need("region"), need("id"))
        // List → Describe against ONE source of truth: the endpoint when
        // given, the in-process fake otherwise. (Resolving against the
        // local fake in plugin mode would fabricate success for ids the
        // remote endpoint never listed.)
        endpoint match {
          case Some((h, p)) =>
            import spark.implicits._
            val raw = GrpcScannerClient.listResources(h, p, svc, reg)
            if (raw.contains("\"error\"")) return (s"Error: $raw", 1)
            val ref = spark.read.json(Seq(raw).toDS)
              .select(org.apache.spark.sql.functions.explode(
                org.apache.spark.sql.functions.col("resources")).as("r"))
              .select("r.id", "r.name", "r.type")
              .collect().collectFirst {
                case row if row.getString(0) == id =>
                  ResourceRef(id, row.getString(1), row.getString(2),
                    svc, reg)
              }
            ref match {
              case None => (s"Error: no resource '$id' in $svc/$reg", 1)
              case Some(r) =>
                (GrpcScannerClient.describeResource(h, p, r), 0)
            }
          case None => fake.listResources(svc, reg).find(_.id == id) match {
            case None => (s"Error: no resource '$id' in $svc/$reg", 1)
            case Some(r) => (ScannerWire.renderResource(
              fake.describeResource(r)), 0)
          }
        }
      case "explain" =>
        // E3's dry-run surfaced as a user command: the formatted physical
        // plan PLUS the plan-fact summary PlanQualitySpec pins (pushdown /
        // broadcast / cartesian / codegen), so a user can see the same
        // scale guards the driver queries assert. `--name` explains a
        // registered driver query (building its frame may run the
        // driver-loop stages of iterative operators); `--sql` explains
        // guarded ad-hoc SQL without executing it.
        // `--name` must BUILD the frame to have a plan to show, and some
        // driver queries (the streaming replays, store lifecycles) run
        // real work — micro-batches, staging-dir rewrites — during frame
        // construction. Warn up front so an operator isn't surprised by
        // an "explain" that executes; --sql stays side-effect-free.
        val df = flag("name") match {
          case Some(n) => graft.SparkEntry.queries.get(n) match {
            case Some(fn) =>
              Console.err.println(s"[explain] building frame for '$n' — " +
                "stateful/streaming driver queries execute their pipeline " +
                "stages during frame construction (use --sql for a " +
                "no-execution explain)")
              fn(spark, sfDir)
            case None => return (s"Error: unknown driver query '$n' " +
              s"(${graft.SparkEntry.queries.size} registered — " +
              "see SparkEntry.queries)", 1)
          }
          case None => flag("sql") match {
            case Some(q) => QueryEngine.frame(spark, q)
            case None =>
              return ("explain needs --name <driver query> or --sql SQL", 2)
          }
        }
        (QueryEngine.explain(df) + "\n" + planFactsText(df), 0)
      case "schemas" =>
        val table = need("table")
        val jsonCol = flag("json-col").getOrElse("raw_data")
        val sampleN = flag("sample").map(_.toInt).getOrElse(10)
        val schema = graft.catalog.SchemaInference.inferJsonSchema(
          spark.table(table), jsonCol, sampleN)
        (schema.treeString, 0)
      case "serve" =>
        val port = flag("port").map(_.toInt).getOrElse(0)
        if (rest.contains("--grpc")) {
          val srv = new graft.engine.GrpcQueryServer(spark, port)
          srv.start()
          val msg = s"gRPC query API listening on 127.0.0.1:${srv.boundPort}"
          if (blockServe) { println(msg); scala.io.StdIn.readLine(); () }
          srv.stop()
          (msg, 0)
        } else {
          val srv = new graft.engine.QueryServer(spark, port)
          srv.start()
          val msg = s"HTTP query API listening on 127.0.0.1:${srv.boundPort}"
          if (blockServe) { println(msg); scala.io.StdIn.readLine(); () }
          srv.stop()
          (msg, 0)
        }
      case other => (s"unknown subcommand '$other'\n$usage", 2)
    }
  }

  /** Interactive read-eval loop over the query path — the shell wrapper
    * of the reference's main-loop mode: one SQL statement per line
    * (trailing `;` optional), results formatted like the one-shot path,
    * errors answered with the E21 hint text ([[run]]'s describeError)
    * without ending the session; `exit`/`quit`/`\q` leaves, `help`/`\?`
    * prints usage. Each evaluated line's output is also printed
    * immediately so a terminal session is actually interactive; the
    * returned transcript serves the (String, Int) CLI contract and the
    * spec harness.
    */
  def repl(spark: SparkSession, sfDir: String,
      in: java.io.BufferedReader, echo: Boolean = false): (String, Int) = {
    val sb = new StringBuilder
    def emit(s: String): Unit = {
      sb.append(s).append('\n')
      if (echo) { Console.out.println(s); Console.out.flush() }
    }
    var done = false
    var line: String = null
    while (!done && { line = in.readLine(); line != null }) {
      val q = line.trim.stripSuffix(";").trim
      q.toLowerCase match {
        case "" => ()
        case "exit" | "quit" | "\\q" => done = true
        case "help" | "\\?" => emit(usage)
        case _ =>
          val (txt, _) = run(spark, CliArgs(sfDir = sfDir, query = Some(q)))
          emit(txt)
      }
    }
    (sb.result(), 0)
  }

  /** Full argv entry: routes subcommands, else the query path. */
  def runArgv(spark: SparkSession, argv: Seq[String],
      blockServe: Boolean = true,
      readStdin: () => String = () =>
        new String(System.in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8),
      replIn: () => java.io.BufferedReader = () =>
        new java.io.BufferedReader(
          new java.io.InputStreamReader(System.in))): (String, Int) = {
    if (argv.isEmpty) return (usage, 2)
    if (argv.size >= 2 && argv(1) == "repl")
      return try repl(spark, argv.head, replIn(), echo = blockServe)
      catch { case scala.util.control.NonFatal(e) =>
        (s"Error: ${Option(e.getMessage).getOrElse(e.toString)}", 1)
      }
    if (argv.size >= 2 && SubCommands.contains(argv(1))) {
      Tables.register(spark, argv.head)
      try runSub(spark, argv.head, argv(1), argv.drop(2).toList, blockServe)
      catch { case scala.util.control.NonFatal(e) =>
        (s"Error: ${Option(e.getMessage).getOrElse(e.toString)}", 1)
      }
    } else parseArgs(argv) match {
      case Left(err) => (err, 2)
      case Right(a) => run(spark, a, readStdin)
    }
  }

  /** Execute parsed args; returns (formatted output, exit code). */
  def run(spark: SparkSession, args: CliArgs,
      readStdin: () => String = () =>
        new String(System.in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8)): (String, Int) = {
    Tables.register(spark, args.sfDir)
    // The reference's --db model: any parquet in the table dir beyond the
    // star schema is a resource table (e.g. aws_resources for packs) —
    // register it by basename so queries and packs can reference it.
    val known = Tables.names.toSet
    Option(new java.io.File(args.sfDir).listFiles()).getOrElse(Array.empty)
      .filter(f => f.getName.endsWith(".parquet"))
      .map(f => (f.getName.stripSuffix(".parquet"), f))
      .filter { case (n, _) => !known.contains(n) && n.matches("[A-Za-z0-9_]+") }
      .foreach { case (n, f) =>
        spark.read.parquet(f.getPath).createOrReplaceTempView(n) }
    val out =
      try {
        args.pack match {
          case Some(manifest) => Right(runPack(spark, manifest, args))
          case None =>
            val sql = args.query
              .orElse(args.file.map(f => Files.readString(Paths.get(f))))
              .orElse(if (args.stdin) Some(readStdin()) else None)
            sql match {
              case None => Left("Error: no query provided " +
                "(use --query, --file, --stdin, or a positional argument)\n" +
                usage)
              case Some(s) => Right(runSql(spark, s, args))
            }
        }
      } catch {
        case NonFatal(e) => Left(describeError(spark, e))
      }
    out match {
      case Right(text) =>
        args.save.foreach(p => Files.writeString(Paths.get(p), text))
        (text, 0)
      case Left(err) => (err, 1)
    }
  }

  private def planFactsText(df: org.apache.spark.sql.DataFrame): String =
    "== Plan Facts ==\n" + QueryEngine.planFacts(df)
      .map { case (k, v) => s"$k = $v" }.mkString("\n")

  private val ExplainRe = "(?is)^\\s*explain\\s+(.*)$".r

  private def runSql(spark: SparkSession, sql: String, args: CliArgs): String = {
    graft.functions.JsonMacros.register(spark)
    sql match {
      // EXPLAIN can't ride through the guarded executor (ExplainCommand
      // is a Command, which the plan-class guard rejects) — strip the
      // keyword, build the inner frame unexecuted, format plan + facts
      case ExplainRe(inner) =>
        val df = QueryEngine.frame(spark, inner, args.params)
        return QueryEngine.explain(df) + "\n" + planFactsText(df)
      case _ => ()
    }
    val res = QueryEngine.executeParameterized(spark, sql, args.params)
    val cols = res.columns.map(_.name)
    val body = args.output match {
      case "csv" => Formatters.csv(cols, res.rows.iterator)
      case "json" => Formatters.json(cols, res.rows.iterator)
      case _ => Formatters.table(cols, res.rows)
    }
    stripHeader(body, args)
  }

  private def runPack(spark: SparkSession, manifestPath: String,
      args: CliArgs): String = {
    val pack = PackLoader.load(Paths.get(manifestPath))
    val selected =
      if (args.tags.isEmpty) pack
      else pack.copy(queries = pack.queries.filter(q =>
        q.tags.exists(args.tags.contains)))
    if (args.dryRun) {
      val checks = ComplianceExecutor.dryRun(spark, selected, args.params)
      checks.toSeq.sortBy(_._1).map {
        case (id, Right(_)) => s"$id: OK"
        case (id, Left(err)) => s"$id: INVALID — $err"
      }.mkString("\n")
    } else {
      val run = ComplianceExecutor.run(spark, selected, args.params)
      val rows = run.runs.flatMap { qr =>
        qr.error match {
          case Some(err) => Seq(Seq(qr.queryId, "", "", "ERROR", "", err))
          case None => qr.results.map(r => Seq(qr.queryId, r.resourceId,
            r.resourceType, r.status, r.severity, r.details))
        }
      }
      val cols = Seq("query_id", "resource_id", "resource_type", "status",
        "severity", "details")
      val summary = s"${run.pack}: ${run.passed} PASS / ${run.failed} FAIL" +
        (if (run.errors > 0) s" / ${run.errors} ERROR" else "")
      val body = args.output match {
        case "csv" => Formatters.csv(cols,
          rows.iterator.map(org.apache.spark.sql.Row.fromSeq))
        case "json" => Formatters.json(cols,
          rows.iterator.map(org.apache.spark.sql.Row.fromSeq))
        case _ => Formatters.table(cols,
          rows.map(org.apache.spark.sql.Row.fromSeq))
      }
      stripHeader(body, args) + "\n" + summary
    }
  }

  /** `--no-header`: drop the header line (CSV) or header row + its rule
    * (table); JSON is self-describing and unaffected — main.go's
    * noHeader applies only to the tabular printers.
    */
  private def stripHeader(body: String, args: CliArgs): String =
    if (!args.noHeader) body
    else args.output match {
      case "csv" => body.linesIterator.drop(1).mkString("\n")
      case "json" => body
      case _ =>
        val ls = body.linesIterator.toVector
        // table layout: sep, header, sep, rows..., sep, count
        (ls.take(1) ++ ls.drop(3)).mkString("\n")
    }

  /** E21 error surface (main.go:1238-1330): unknown tables get a
    * nearest-name suggestion from the catalog; everything else reports
    * its message class.
    */
  private def describeError(spark: SparkSession, e: Throwable): String = {
    val msg = Option(e.getMessage).getOrElse(e.getClass.getSimpleName)
    val missing = "`([A-Za-z0-9_]+)`".r.findFirstMatchIn(
      if (msg.contains("TABLE_OR_VIEW_NOT_FOUND")) msg else "")
      .map(_.group(1))
    missing.flatMap(QueryEngine.suggestTable(spark, _)) match {
      case Some(sugg) => s"Error: $msg\nDid you mean '$sugg'?"
      case None => s"Error: $msg"
    }
  }

  def main(argv: Array[String]): Unit = {
    if (argv.isEmpty) { System.err.println(usage); sys.exit(2) }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val (text, code) = runArgv(spark, argv.toSeq)
    if (code == 0) println(text) else System.err.println(text)
    spark.stop()
    if (code != 0) sys.exit(code)
  }
}
