package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the deployment seam VERDICT r8 flagged as untested: the conf
  * contract [[GraftSession]] promises to ANY deployment (cluster
  * spark-submit included) is asserted on a REAL session built through
  * the production wiring — in a forked JVM, because extensions are
  * static at session creation and this suite's JVM already carries the
  * shared plain test session. The fork also pins the SPARK_GRAFT_CPUS
  * seam: master, shuffle partitions, and the AQE initial partition
  * count must all derive from it (round-3's bench ran local[4] 4×
  * inflated precisely because an entry point bypassed this wiring).
  */
class GraftSessionSpec extends AnyFunSuite {

  test("GraftSession.local builds the full documented conf contract " +
    "(forked JVM, SPARK_GRAFT_CPUS=3)") {
    val javaBin = s"${System.getProperty("java.home")}/bin/java"
    // inherit this JVM's --add-opens flags (Spark 4 on JDK 17 needs
    // them; build.sbt holds the authoritative list — don't duplicate it)
    import scala.jdk.CollectionConverters._
    val addOpens = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala.filter(_.startsWith("--add-opens"))
    val cmd = Seq(javaBin) ++ addOpens ++
      Seq("-cp", System.getProperty("java.class.path"), "graft.ConfProbe")
    val pb = new ProcessBuilder(cmd.asJava)
    pb.environment().put("SPARK_GRAFT_CPUS", "3")
    pb.redirectErrorStream(true)
    val proc = pb.start()
    // drain stdout on a separate thread: a synchronous readAllBytes
    // would block until process exit and make the waitFor timeout
    // unreachable (a hung probe would hang the suite), while NOT
    // draining could deadlock the child on a full stdout pipe
    val outBytes = new java.io.ByteArrayOutputStream()
    val drainer = new Thread(() =>
      try proc.getInputStream.transferTo(outBytes)
      catch { case _: java.io.IOException => () })
    drainer.setDaemon(true)
    drainer.start()
    val finished = proc.waitFor(180, java.util.concurrent.TimeUnit.SECONDS)
    if (!finished) proc.destroyForcibly()
    drainer.join(10000)
    val out = outBytes.toString("UTF-8")
    assert(finished && proc.exitValue() == 0,
      s"ConfProbe failed:\n${out.takeRight(2000)}")
    val probed = out.linesIterator.collect {
      case l if l.startsWith("probe:") =>
        val kv = l.stripPrefix("probe:").split("=", 2)
        kv(0) -> kv(1)
    }.toMap

    assert(probed("master") === "local[3]")
    assert(probed("spark.sql.extensions") === "graft.GraftExtensions")
    assert(probed("spark.sql.session.timeZone") === "UTC")
    assert(probed(
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold")
      === (1 << 22).toString)
    assert(probed("spark.cleaner.referenceTracking.cleanCheckpoints")
      === "true")
    assert(probed("spark.sql.shuffle.partitions") === "3")
    // the anti-scaling-cliff conf: exchanges start at 16× cores and AQE
    // coalesces down (never up) — see GraftSession.builder's scaladoc
    assert(probed(
      "spark.sql.adaptive.coalescePartitions.initialPartitionNum")
      === "48")
    // extensions LIVE, not just configured: dot_f64 resolves only via
    // GraftExtensions' injected function registry
    assert(probed("dot_f64").toDouble === 11.0)
  }
}
