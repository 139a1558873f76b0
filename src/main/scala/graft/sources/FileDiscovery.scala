package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, StandardOpenOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Where new landing-zone files come from.
  *
  * Directory listing is the default and is fine at test scale, but at a
  * 100 TB landing zone the hourly list-and-diff over millions of objects
  * becomes the ingest bottleneck — every trigger re-enumerates the whole
  * prefix. Cloud stores solve this with event notifications (object
  * created → queue), which is exactly what the reference turns on via
  * Auto Loader's `cloudFiles.useNotifications`
  * (zetadex-transactions-helius-pipeline.py:76). This trait is the seam:
  * a notification consumer (SQS/PubSub drainer, a Kafka topic of paths, a
  * manifest file) implements `newFiles` and the ingest logic never
  * changes.
  */
trait FileDiscovery {

  /** Absolute paths of landing-zone files not yet in `processed`.
    * Implementations should be cheap relative to the zone size:
    * a notification queue is O(new files); a directory listing is
    * O(all files). */
  def newFiles(processed: Set[String]): Seq[String]
}

/** O(all files) fallback: recursively list `root`, keep `suffix` matches.
  * The shape Auto Loader uses without notifications — correct anywhere,
  * bottleneck at scale (the listing itself is linear in zone size and
  * runs on the driver). */
final class DirectoryListing(root: String, suffix: String = ".json")
    extends FileDiscovery {
  def newFiles(processed: Set[String]): Seq[String] = {
    val base = Path.of(root)
    if (!Files.exists(base)) Seq.empty
    else {
      val s = Files.walk(base)
      try s.iterator().asScala
        .filter(p => Files.isRegularFile(p) && p.toString.endsWith(suffix))
        .map(_.toString).filterNot(processed).toSeq.sorted
      finally s.close()
    }
  }
}

/** Notification-driven discovery backed by any queue-like callback: each
  * `newFiles` call drains whatever the notification consumer has buffered.
  * O(new files) per trigger — the 100 TB shape.
  *
  * Delivery contract: draining is DESTRUCTIVE (the queue forgets the
  * paths), so a drained-but-unprocessed path would be lost on a crash —
  * unlike [[DirectoryListing]], where unprocessed files remain listable.
  * [[IncrementalIngest.runOnce]] narrows this gap by journaling every
  * drained batch to `<ledger>.pending` BEFORE processing and re-reading
  * the journal on the next trigger: a crash anywhere between journal
  * write and ledger append re-delivers. The residual window is the
  * instant between the drain itself and the journal write — closing it
  * fully requires an ack-after-process consumer (visibility-timeout
  * queues redeliver unacked messages), which this seam supports: have
  * `drain` PEEK and ack from the `write` callback. */
final class NotifiedFiles(drain: () => Seq[String]) extends FileDiscovery {
  def newFiles(processed: Set[String]): Seq[String] =
    drain().filterNot(processed).distinct.sorted
}

/** Checkpointed incremental ingest over a [[FileDiscovery]]: the
  * file-level exactly-once ledger that Auto Loader keeps in RocksDB,
  * re-expressed as a plain-text ledger next to the sink.
  *
  * Each `runOnce` is one micro-batch: read the ledger, ask discovery for
  * new files, JOURNAL the batch to `<ledger>.pending`, read ONLY those
  * files with the declared schema (no inference pass), hand the frame to
  * `write`, append the ledger, then clear the journal. The ledger is
  * appended only after `write` returns, so a crash mid-batch re-processes
  * that batch (at-least-once) — and the pending journal extends that
  * guarantee to DESTRUCTIVE discoveries like [[NotifiedFiles]], whose
  * drained paths would otherwise vanish with the crash (up to the
  * drain-to-journal instant; see the NotifiedFiles contract note for
  * the ack-based consumer that closes even that). Sinks make the
  * pipeline exactly-once by keying on file provenance or idempotent
  * overwrite — the same contract Structured Streaming's file source
  * offers.
  *
  * Driver cost per trigger is O(processed files): the ledger is re-read
  * and held as a Set. Fine for months of hourly batches (a few MB of
  * paths); a long-lived 100 TB zone would compact the ledger (or swap in
  * a bloom filter over it) — the discovery seam and this contract stay
  * unchanged either way.
  */
object IncrementalIngest {

  private def readLines(p: Path): Seq[String] =
    if (Files.exists(p)) Files.readAllLines(p).asScala.filter(_.nonEmpty).toSeq
    else Seq.empty

  private def writeLines(p: Path, lines: Seq[String],
                         opts: StandardOpenOption*): Unit = {
    // getParent is null for a bare relative filename — nothing to create
    Option(p.toAbsolutePath.getParent).foreach(Files.createDirectories(_))
    Files.write(p, lines.mkString("", "\n", "\n")
      .getBytes(StandardCharsets.UTF_8), opts: _*)
  }

  /** Run one discovery+ingest micro-batch. Returns the files processed
    * (empty = nothing new, `write` not called). */
  def runOnce(spark: SparkSession, discovery: FileDiscovery, ddl: String,
              ledger: String)(write: DataFrame => Unit): Seq[String] = {
    val ledgerPath = Path.of(ledger)
    val pendingPath = Path.of(ledger + ".pending")
    val processed: Set[String] = readLines(ledgerPath).toSet
    // re-deliver paths a crashed previous attempt drained but never
    // ledgered (minus any that DID reach the ledger before the crash)
    val pending = readLines(pendingPath)
    val fresh = (pending ++ discovery.newFiles(processed))
      .distinct.filterNot(processed).sorted
    if (fresh.nonEmpty) {
      // journal BEFORE processing: from here a crash re-reads the journal
      writeLines(pendingPath, fresh, StandardOpenOption.CREATE,
        StandardOpenOption.TRUNCATE_EXISTING)
      write(spark.read.schema(ddl).json(fresh: _*))
      writeLines(ledgerPath, fresh, StandardOpenOption.CREATE,
        StandardOpenOption.APPEND)
    }
    Files.deleteIfExists(pendingPath)
    fresh
  }
}
