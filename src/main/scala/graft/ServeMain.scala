package graft

import org.apache.spark.sql.SparkSession

/** Runnable serving entry point — the `blq serve` analog
  * (reference serve.py main): builds the engine over a store root and
  * speaks line-delimited JSON-RPC 2.0 on stdin/stdout until EOF.
  *
  * {{{
  *   java -cp "<spark-jars>:target/scala-2.13/classes" \
  *     graft.ServeMain /data/bird
  *   {"jsonrpc":"2.0","id":1,"method":"status"}
  *   {"jsonrpc":"2.0","id":2,"method":"errors","params":{"limit":"5"}}
  * }}}
  *
  * (Interactive `sbt run` also works — `run / connectInput` is set;
  * `sbt -batch` does not forward stdin to the forked JVM.)
  *
  * All diagnostics go to stderr; stdout carries ONLY response lines
  * (the transport channel — a protocol client must never see log
  * output interleaved with frames).
  */
object ServeMain {
  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse(
      sys.error("usage: graft.ServeMain <storeRoot> [cpus]"))
    val cpus = args.lift(1).getOrElse("*")
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        Runtime.getRuntime.availableProcessors().toString)
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val engine = GraftEngine(spark, root).install()
    System.err.println(s"[graft] serving $root over stdio json-rpc; EOF to stop")
    new api.JsonRpcServe(new api.Serve(engine)).loop(System.in, System.out)
    spark.stop()
  }
}
