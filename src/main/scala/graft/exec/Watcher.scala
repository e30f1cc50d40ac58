package graft.exec

import java.nio.file.{FileSystems, Path, Paths, StandardWatchEventKinds, WatchEvent}
import java.util.concurrent.atomic.AtomicBoolean
import scala.jdk.CollectionConverters._

/** Filesystem watch loop (T3; reference watch_cmd.py:102-302 behavior):
  * debounce change bursts (default 500 ms quiet gap), coalesce to one
  * run, queue at most one re-run while a run is in flight. Driver-side
  * by nature; the analytics side sees ordinary runs. The streaming
  * analog of the debounce itself is LiveStreams.debounceChanges.
  */
final class Watcher(dir: String, debounceMs: Long = 500L) {

  private val stopped = new AtomicBoolean(false)
  @volatile private var registered = false

  def stop(): Unit = stopped.set(true)

  /** True once [[run]] has registered with the OS watch service —
    * changes made after this point are guaranteed observed. Callers
    * (and tests) that spawn [[run]] on a thread should spin on this
    * instead of sleeping a guessed interval: under a loaded machine a
    * fixed sleep races thread start and silently loses the first
    * change. */
  def ready: Boolean = registered

  /** Watch `dir` recursively-ish (top level) and invoke `onBurst` with
    * the changed paths after each quiet gap. Runs until [[stop]] or
    * `maxBursts` bursts (test hook). States mirror the reference:
    * idle → collecting (debounce) → running → (queued ⇒ immediate
    * re-collect). */
  def run(onBurst: Seq[String] => Unit, maxBursts: Int = Int.MaxValue): Unit = {
    val ws = FileSystems.getDefault.newWatchService()
    val p = Paths.get(dir)
    p.register(ws, StandardWatchEventKinds.ENTRY_CREATE,
      StandardWatchEventKinds.ENTRY_MODIFY, StandardWatchEventKinds.ENTRY_DELETE)
    registered = true
    var bursts = 0
    val pending = scala.collection.mutable.LinkedHashSet.empty[String]
    var lastChange = 0L
    try {
      while (!stopped.get() && bursts < maxBursts) {
        val key = ws.poll(50, java.util.concurrent.TimeUnit.MILLISECONDS)
        if (key != null) {
          key.pollEvents().asScala.foreach { ev =>
            ev.context() match {
              case ctx: Path => pending += p.resolve(ctx).toString
              // OVERFLOW events carry no Path — changes were dropped by
              // the OS queue; conservatively mark the whole dir changed
              // so the burst still fires instead of being lost
              case _ => pending += p.toString
            }
          }
          // an invalid key (watched dir deleted/unmounted) can never
          // deliver again — exit instead of spinning blind forever
          if (!key.reset()) stopped.set(true)
          lastChange = System.currentTimeMillis()
        }
        if (pending.nonEmpty &&
            System.currentTimeMillis() - lastChange >= debounceMs) {
          val batch = pending.toSeq
          pending.clear()
          onBurst(batch) // runs inline: changes during the run queue up
          bursts += 1
        }
      }
    } finally ws.close()
  }
}
