package graft
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** Top-level key names of a one-level JSON object, by a real scan
    * (string state + escapes), NOT a regex over the raw text — an
    * escaped `\"q_name\":` sequence INSIDE a SQL string value must not
    * be mistaken for a present query key (round-4 advice). The file is
    * always the flat object this class itself writes, so depth
    * tracking beyond "inside a string or not" is unnecessary: at depth
    * 0 of the object, every string followed by ':' is a key. */
  private[graft] def topLevelKeys(json: String): Set[String] = {
    val keys = Set.newBuilder[String]
    var i = 0
    var depth = 0 // {}-nesting; the oracle file is flat but be robust
    while (i < json.length) {
      json.charAt(i) match {
        case '{' => depth += 1; i += 1
        case '}' => depth -= 1; i += 1
        case '"' =>
          // scan the string literal, honoring escapes
          val sb = new StringBuilder
          i += 1
          var done = false
          while (i < json.length && !done) {
            json.charAt(i) match {
              case '\\' =>
                if (i + 1 < json.length) {
                  json.charAt(i + 1) match {
                    case 'u' if i + 5 < json.length =>
                      sb.append(Integer.parseInt(json.substring(i + 2, i + 6), 16).toChar)
                      i += 6
                    case 'n' => sb.append('\n'); i += 2
                    case 'r' => sb.append('\r'); i += 2
                    case 't' => sb.append('\t'); i += 2
                    case c => sb.append(c); i += 2
                  }
                } else i += 1
              case '"' => done = true; i += 1
              case c => sb.append(c); i += 1
            }
          }
          // a key iff at object depth 1 and the next non-space is ':'
          var j = i
          while (j < json.length && json.charAt(j).isWhitespace) j += 1
          if (depth == 1 && j < json.length && json.charAt(j) == ':') {
            keys += sb.result()
            i = j + 1 // consume the ':' so the VALUE string isn't re-keyed
          }
        case _ => i += 1
      }
    }
    keys.result()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    // optional 3rd+ args: restrict to named queries (targeted re-checks
    // at big scale factors without replaying the whole set)
    val only = args.drop(2).toSet
    val unknown = only.diff(SparkEntry.queries.keySet)
    if (unknown.nonEmpty) {
      // a typo'd name must be a loud error, not a clean-looking no-op
      // ("0 pass / 0 fail" with an empty oracle file)
      System.err.println(
        s"[verify] unknown query name(s): ${unknown.toSeq.sorted.mkString(", ")}")
      sys.exit(2)
    }
    val selected =
      if (only.isEmpty) SparkEntry.queries
      else SparkEntry.queries.filter { case (n, _) => only(n) }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = GraftSession.build(cpus)
    new java.io.File(outDir).mkdirs()
    var failed = List.empty[String]
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        failed ::= name
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        // Write a sentinel result so the driver's compare produces a
        // VISIBLE red row (rows/schema mismatch) instead of silently
        // omitting the query from the round's correctness report — in
        // round 3 two regressed queries vanished from the gate this way.
        try {
          import spark.implicits._
          Seq(s"VERIFY_ERROR: ${e.getMessage}").toDF("__verify_error")
            .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        } catch { case _: Throwable => }
      }
    }
    if (failed.nonEmpty)
      System.err.println(s"[verify] FAILED queries: ${failed.sorted.mkString(", ")}")
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // Which oracle entries to (re)write. A targeted run into a dir that
    // already holds a fuller oracle_sql.json must NOT shrink it — that
    // would silently narrow what check.py gates (the exact vanishing
    // failure mode the sentinel above exists to prevent). Merge: keep
    // every name already present in the existing file (their dumps are
    // still on disk), plus the selected set, all at CURRENT SQL text.
    val existing: Set[String] = {
      val p = Paths.get(s"$outDir/oracle_sql.json")
      if (only.nonEmpty && Files.exists(p)) topLevelKeys(Files.readString(p))
      else Set.empty
    }
    val keep: String => Boolean =
      k => only.isEmpty || only(k) || existing(k)
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => keep(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
