package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: one JSON line with per-query seconds at
  * SPARK_GRAFT_SF_DIR. Each query gets one untimed warmup run (JVM/
  * codegen/broadcast warm — the driver measures steady-state engine
  * speed, not JIT) and is then timed end-to-end into a noop sink (full
  * materialization of every column, unlike count() which lets Spark
  * prune work).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.plans.GraftExtensions.builder(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val names = SparkEntry.queries.keys.toSeq.sorted
    def exec(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    // Queries that localCheckpoint intermediate frames (dedup, transcript,
    // listing pipelines) leave cached RDD blocks behind; over 72 executions
    // in one JVM that becomes storage-memory pressure that throttles every
    // later query. Drop them once their query has finished.
    def clearCaches(): Unit = {
      spark.sqlContext.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
    }
    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    def timed(tag: String)(name: String): Double = {
      val t0 = System.nanoTime()
      try exec(name)
      catch {
        case t: Throwable =>
          errors(name) = Option(t.getMessage).getOrElse(t.getClass.getName).take(200)
          t.printStackTrace(System.err)
      }
      finally clearCaches()
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[bench:$tag] $name $dt%.2fs" +
        (if (errors.contains(name)) " FAILED" else ""))
      dt
    }
    names.foreach(timed("warmup")) // warmup
    errors.clear()                 // only report steady-state failures
    // Two timed passes, min per query: a single-JVM harness occasionally
    // absorbs one multi-second environmental pause (observed: one early
    // query at 35-67 s with no GC/log event inside the window, unreprod-
    // ucible); min-of-2 reports steady-state engine speed, not the pause.
    // Failures follow the same policy: a query is FAILED only if BOTH
    // passes failed (a one-pass transient is the pause scenario); a
    // persistent failure contributes a LARGE positive penalty to the
    // total, so a crashing query can never read as a speedup.
    val passA = names.map(n => n -> timed("timed")(n)).toMap
    val errsA = errors.keySet.toSet
    errors.clear()
    val passB = names.map(n => n -> timed("timed2")(n)).toMap
    val errsB = errors.keySet.toSet
    val failed = errsA.intersect(errsB)
    errors.filterInPlace((k, _) => failed.contains(k))
    val results = names.map { n =>
      n -> ((errsA.contains(n), errsB.contains(n)) match {
        case (false, false) => math.min(passA(n), passB(n))
        case (true, false)  => passB(n) // transient absorbed
        case (false, true)  => passA(n)
        case (true, true)   => 600.0    // persistent failure: penalty
      })
    }
    def jstr(s: String) = "\"" +
      s.map(c => if (c < ' ' || c == '"' || c == '\\') ' ' else c) + "\""
    val qs = results.map { case (k, v) =>
      // A failed query reports negative elapsed so it can never read as
      // a legitimately fast result (its penalty still counts in total).
      s"\"" + k + "\":" + (if (failed.contains(k)) -v else v)
    }.mkString("{", ",", "}")
    val errJson = errors.map { case (k, m) => s"\"" + k + "\":" + jstr(m) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
