package graft.cli

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.expr.FileOperands
import graft.ingest.{Snapshot, Walker}
import graft.reports.Reports
import graft.stats.{Calculator, Stats, StatsArtifact}

/** CLI mirroring the reference's command surface (main.go:46-114):
  *
  * {{{
  * analyze  --db DIR ROOT [--exclude RE]...      scan a tree → snapshot
  * find     --db DIR EXPR...                     filtered enumeration
  * stats    --db DIR [--n N] [--calc C] EXPR...  totals + top-N
  * errors   --db DIR                             scan error rows
  * logs     --db DIR                             scan run log
  * expression-syntax                             operand help
  * }}}
  *
  * Run via: sbt "runMain graft.cli.Main <cmd> ...".
  */
object Main {

  private def session(): SparkSession = {
    val s = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = args.toList match {
    case "analyze" :: rest => analyze(rest)
    case "find" :: rest => find(rest)
    case "reports" :: rest => reports(rest)
    case "stats" :: "view" :: rest => statsView(rest)
    case "stats" :: "compute" :: rest => stats(rest)
    case "stats" :: rest => stats(rest)
    case "errors" :: rest => listTable(rest, Snapshot.readErrors(_, _))
    case "logs" :: rest => logs(rest)
    case "config" :: file :: Nil =>
      graft.config.Config.load(file).foreach(println)
    case "database" :: "locate" :: file :: path :: Nil =>
      graft.config.Config.forPath(graft.config.Config.load(file), path) match {
        case Some(c) => println(c.database)
        case None => System.err.println(s"no config matches $path"); sys.exit(1)
      }
    case "expression-syntax" :: Nil => println(expressionSyntax)
    case other =>
      System.err.println(s"unknown command: ${other.mkString(" ")}")
      System.err.println(
        "usage: analyze|find|stats|reports|errors|logs|config|database locate|expression-syntax")
      sys.exit(2)
  }

  private final case class Opts(
      db: String = "", n: Int = 10, calc: String = "identity",
      incremental: Boolean = false, config: String = "",
      user: Option[Long] = None, group: Option[Long] = None,
      excludes: List[String] = Nil, positional: List[String] = Nil)

  private def parseOpts(args: List[String]): Opts = args match {
    case "--db" :: v :: rest => parseOpts(rest).copy(db = v)
    case "--config" :: v :: rest => parseOpts(rest).copy(config = v)
    case "--n" :: v :: rest => parseOpts(rest).copy(n = v.toInt)
    case "--calc" :: v :: rest => parseOpts(rest).copy(calc = v)
    case "--incremental" :: rest => parseOpts(rest).copy(incremental = true)
    case "--user" :: v :: rest => parseOpts(rest).copy(user = Some(v.toLong))
    case "--group" :: v :: rest => parseOpts(rest).copy(group = Some(v.toLong))
    case "--exclude" :: v :: rest =>
      val o = parseOpts(rest); o.copy(excludes = v :: o.excludes)
    case p :: rest => val o = parseOpts(rest); o.copy(positional = p :: o.positional)
    case Nil => Opts()
  }

  private def require_(cond: Boolean, msg: String): Unit =
    if (!cond) { System.err.println(msg); sys.exit(2) }

  private def analyze(args: List[String]): Unit = {
    val o0 = parseOpts(args)
    require_(o0.positional.nonEmpty,
      "analyze [--db DIR | --config FILE] [--incremental] ROOT")
    val root = o0.positional.head
    // --config resolves db/exclusions for the root by longest prefix
    // (reference LookupPrefix, internal/util.go:45-56); explicit flags win.
    val o = if (o0.config.isEmpty) o0 else {
      graft.config.Config.forPath(
        graft.config.Config.load(o0.config), root) match {
        case Some(c) => o0.copy(
          db = if (o0.db.nonEmpty) o0.db else c.database,
          excludes = if (o0.excludes.nonEmpty) o0.excludes else c.exclusions.toList)
        case None =>
          System.err.println(s"no config entry matches $root"); sys.exit(1)
      }
    }
    require_(o.db.nonEmpty, "analyze: no --db and no config match")
    val spark = session()
    val t0 = System.currentTimeMillis()
    val prevSnapshot =
      if (o.incremental) Snapshot.latestName(o.db).map(_ =>
        Snapshot.readFiles(spark, o.db))
      else None
    val name = prevSnapshot match {
      case Some(prev) =>
        val r = graft.ingest.Incremental.rescan(spark, root, prev, o.excludes)
        println(s"incremental: ${r.summary}")
        val errs = { import spark.implicits._; Seq.empty[graft.model.ScanError].toDF() }
        Snapshot.write(o.db, r.entries, errs)
      case None =>
        val res = Walker.walk(spark, root, exclusions = o.excludes)
        res.records.cache()
        Snapshot.write(o.db, res.entries.toDF(), res.errors.toDF())
    }
    val files = Snapshot.readFiles(spark, o.db)
    val nFiles = files.where(!col("is_dir")).count()
    val nDirs = files.where(col("is_dir")).count()
    val nErr = Snapshot.readErrors(spark, o.db).count()
    val bytes = files.where(!col("is_dir")).agg(coalesce(sum("size"), lit(0L)))
      .collect()(0).getLong(0)
    import spark.implicits._
    Snapshot.appendLog(spark, o.db, Seq(graft.model.ScanLog(
      new java.sql.Timestamp(t0), new java.sql.Timestamp(System.currentTimeMillis()),
      root, nDirs, nFiles, nErr, bytes)).toDF())
    println(s"snapshot $name: $nDirs prefixes, $nFiles files, " +
      s"${Reports.formatSize(bytes)}, $nErr errors")
    spark.stop()
  }

  private def find(args: List[String]): Unit = {
    val o = parseOpts(args)
    require_(o.db.nonEmpty, "find --db DIR EXPR...")
    val expr = o.positional.reverse.mkString(" ")
    val spark = session()
    val files = Snapshot.readFiles(spark, o.db)
    val m = FileOperands().compile(expr)
    // Ordered enumeration, streamed to stdout (reference find.go:75-96).
    files.where(m).select("path").orderBy("path")
      .toLocalIterator().forEachRemaining(r => println(r.getString(0)))
    spark.stop()
  }

  private def stats(args: List[String]): Unit = {
    val o = parseOpts(args)
    require_(o.db.nonEmpty, "stats compute --db DIR [--n N] [--calc C] EXPR...")
    val expr = o.positional.reverse.mkString(" ")
    val spark = session()
    val files = Snapshot.readFiles(spark, o.db)
    val ops = FileOperands()
    val m = ops.compile(expr)
    val c = Stats.compute(files, prefixMatch = m, entryMatch = m,
      calc = Calculator.parse(o.calc))
    val name = StatsArtifact.write(o.db, c, "/", expr)
    println(s"stats artifact: $name")
    println(Reports.markdown(c.totals, s"Totals for '$expr'"))
    Stats.rankedMetrics.foreach { metric =>
      println(Reports.markdown(
        Stats.topPrefixes(c.perPrefix, metric, o.n), s"Top ${o.n} by $metric"))
    }
    println(Reports.markdown(
      c.perUser.orderBy(desc("bytes")).limit(o.n), "Usage by user"))
    println(Reports.markdown(
      c.perGroup.orderBy(desc("bytes")).limit(o.n), "Usage by group"))
    spark.stop()
  }

  /** `stats view`: render the latest persisted artifact — no
    * recompute (reference stats.go:178-234). */
  private def statsView(args: List[String]): Unit = {
    val o = parseOpts(args)
    require_(o.db.nonEmpty, "stats view --db DIR [--n N] [--user UID] [--group GID]")
    val spark = session()
    val c = StatsArtifact.read(spark, o.db)
    // --user/--group restrict the view to one id's rows (reference
    // stats.go:178-234)
    (o.user, o.group) match {
      case (Some(u), _) =>
        println(Reports.markdown(
          c.perUser.where(col("uid") === u), s"Totals for uid $u"))
        spark.stop(); return
      case (_, Some(g)) =>
        println(Reports.markdown(
          c.perGroup.where(col("gid") === g), s"Totals for gid $g"))
        spark.stop(); return
      case _ =>
    }
    println(Reports.markdown(c.totals, "Totals"))
    Stats.rankedMetrics.foreach { metric =>
      println(Reports.markdown(
        Stats.topPrefixes(c.perPrefix, metric, o.n), s"Top ${o.n} by $metric"))
    }
    println(Reports.markdown(
      c.perUser.orderBy(desc("bytes")).limit(o.n), "Usage by user"))
    println(Reports.markdown(
      c.perGroup.orderBy(desc("bytes")).limit(o.n), "Usage by group"))
    spark.stop()
  }

  /** `reports --db DIR --out DIR`: write the TSV/JSON/Markdown report
    * file tree from the latest stats artifact + flip a `latest`
    * pointer (reference writeReportFiles, reports.go:128-229). */
  private def reports(args: List[String]): Unit = {
    val o = parseOpts(args)
    require_(o.db.nonEmpty && o.positional.nonEmpty, "reports --db DIR OUTDIR")
    val outBase = o.positional.head
    val spark = session()
    val c = StatsArtifact.read(spark, o.db)
    val name = StatsArtifact.latestName(o.db).getOrElse("unknown")
    val dir = java.nio.file.Paths.get(outBase, name)
    java.nio.file.Files.createDirectories(dir)
    def emit(base: String, df: org.apache.spark.sql.DataFrame, title: String): Unit = {
      java.nio.file.Files.writeString(dir.resolve(s"$base.tsv"), Reports.tsv(df))
      java.nio.file.Files.writeString(dir.resolve(s"$base.json"), Reports.jsonLines(df))
      java.nio.file.Files.writeString(dir.resolve(s"$base.md"), Reports.markdown(df, title))
    }
    emit("totals", c.totals, "Totals")
    Stats.rankedMetrics.foreach { m =>
      emit(s"top_$m", Stats.topPrefixes(c.perPrefix, m, o.n), s"Top ${o.n} by $m")
    }
    emit("by_user", c.perUser.orderBy(desc("bytes")).limit(o.n), "Usage by user")
    emit("by_group", c.perGroup.orderBy(desc("bytes")).limit(o.n), "Usage by group")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outBase, "latest"), name)
    println(s"reports written to $dir")
    spark.stop()
  }

  private def listTable(args: List[String],
      read: (SparkSession, String) => DataFrame): Unit = {
    val o = parseOpts(args)
    require_(o.db.nonEmpty, "--db DIR required")
    val spark = session()
    println(Reports.tsv(read(spark, o.db)))
    spark.stop()
  }

  private def logs(args: List[String]): Unit = {
    val o = parseOpts(args)
    require_(o.db.nonEmpty, "logs --db DIR")
    val spark = session()
    println(Reports.tsv(spark.read.parquet(s"${o.db}/scan_log").orderBy("start")))
    spark.stop()
  }

  private val expressionSyntax: String =
    """Boolean expression operands (combine with && || ! and parentheses):
      |  name=GLOB        glob match on basename or full path
      |  iname=GLOB       case-insensitive name match
      |  re=REGEXP        regexp match on full path
      |  type=f|d|l|x     file / directory / symlink / executable
      |  newer=DATE       modified after DATE (yyyy-mm-dd or RFC3339)
      |  larger=N         size >= N bytes
      |  smaller=N        size <= N bytes
      |  dir-larger=N     directory with more than N entries
      |  dir-smaller=N    directory with fewer than N entries
      |  user=UID|NAME    owned by user
      |  group=GID|NAME   owned by group
      |  hardlink=PATH    same (device, inode) as PATH
      |""".stripMargin
}
