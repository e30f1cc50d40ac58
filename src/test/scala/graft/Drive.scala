import org.apache.spark.sql.SparkSession
import graft.Tables
import graft.model._
import graft.store.EventStore
import graft.views.Views

// Library-surface drive: what a blq-cli user switching to graft would write.
object Drive extends App {
  val spark = Tables.configure(SparkSession.builder()
    .master("local[4]").config("spark.ui.enabled", "false")).getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  val root = java.nio.file.Files.createTempDirectory("drive-store").toString
  val store = new EventStore(spark, root)
  graft.Fixtures.populate(store)
  Views.registerAll(store)
  println("== blq_runs ==")
  spark.sql("SELECT run_ref, errors, warnings, status_badge FROM blq_runs ORDER BY run_serial").show(false)
  println("== errors (macro blq_errors(10) analog) ==")
  spark.sql("SELECT ref, severity, location, message FROM blq_events WHERE severity='error' ORDER BY started_at DESC, event_index LIMIT 10").show(false)
  println("== source status board ==")
  spark.sql("SELECT source_name, status FROM blq_source_status ORDER BY source_name").show(false)
  spark.stop()
}
