package graft.checkpoint

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Checkpoint manifest with per-partition lineage + metrics, committed via
  * temp-file + atomic rename — the same commit trick the reference uses for
  * its stores (reference: internal/shared/filestorages/file_storage.go:113-150).
  * Emulates Iceberg snapshot/resume semantics (no Iceberg jar in sandbox,
  * SURVEY.md §7.0): a rerun reads the manifest and skips input partitions
  * already committed, so reruns converge (idempotent resume).
  *
  * Stored as newline-free JSON; hand-rolled serialization keeps us inside
  * the sanctioned dependency set.
  */
object Checkpoint {

  final case class PartitionLineage(partition: String, rows: Long)

  /** `watermark`: every window key <= watermark is committed and CLOSED —
    * its lineage has been folded out of the manifest (into `foldedRows`)
    * and late data for it is dropped by the resume filter. Keeps both the
    * manifest and the resume predicate bounded at minute granularity over
    * unbounded horizons: the filter is one range compare plus an isin over
    * at most `maxLineageWindows` recent keys, instead of an IN list that
    * grows forever (round-1 advice). Full per-run lineage history stays
    * queryable in the append-only `lineage` table.
    */
  /** `quarantinePartitions`: quarantine sink partitions written by
    * COMMITTED runs. Quarantine windows never enter `committedPartitions`
    * (they carry no routed data — including the synthetic "invalid"
    * partition for null-ts rows), so without this list the crash-recovery
    * GC would wipe a committed run's quarantine history on the next run
    * (round-3 self-review finding). Compaction prunes entries at or below
    * the watermark: the GC predicate only ever touches keys above it, so
    * the list stays bounded ("invalid" sorts above any timestamp key and
    * is the one permanent entry).
    */
  /** `quarantineKnown`: false iff this manifest was READ from a file
    * written before the quarantinePartitions field existed (pre-round-3).
    * Distinguishing "absent" from "empty" matters: an upgrading resume run
    * must treat existing quarantine partitions above the watermark as
    * committed rather than GC-sweeping history it has no record of
    * (round-3 advice). Always true for manifests this code writes; not
    * serialized.
    */
  final case class Manifest(
      runId: String,
      committedPartitions: Seq[PartitionLineage],
      metrics: Map[String, Long],
      watermark: String = "",
      foldedRows: Long = 0L,
      quarantinePartitions: Seq[String] = Nil,
      quarantineKnown: Boolean = true
  ) {
    def committedSet: Set[String] = committedPartitions.map(_.partition).toSet
  }

  /** Fold the oldest committed windows into the watermark, keeping at most
    * `maxWindows` recent entries. Window keys sort lexicographically in
    * time order (yyyyMMdd'T'HHmm'Z').
    */
  def compact(m: Manifest, maxWindows: Int): Manifest = {
    val c =
      if (m.committedPartitions.size <= maxWindows) m
      else {
        val sorted = m.committedPartitions.sortBy(_.partition)
        val (fold, keep) = sorted.splitAt(sorted.size - maxWindows)
        m.copy(
          committedPartitions = keep,
          watermark = Seq(m.watermark, fold.last.partition).max,
          foldedRows = m.foldedRows + fold.map(_.rows).sum)
      }
    // Quarantine keys at/below the watermark are out of GC's reach — prune.
    c.copy(quarantinePartitions =
      c.quarantinePartitions.filter(_ > c.watermark).distinct.sorted)
  }

  private def esc(s: String): String =
    s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  def write(dir: String, m: Manifest): Unit = {
    Files.createDirectories(Paths.get(dir))
    val parts = m.committedPartitions
      .map(p => s"""{"partition":"${esc(p.partition)}","rows":${p.rows}}""")
      .mkString("[", ",", "]")
    val metrics = m.metrics.toSeq.sortBy(_._1)
      .map { case (k, v) => s""""${esc(k)}":$v""" }.mkString("{", ",", "}")
    val quar = m.quarantinePartitions
      .map(q => s""""${esc(q)}"""").mkString("[", ",", "]")
    val json =
      s"""{"runId":"${esc(m.runId)}","watermark":"${esc(m.watermark)}",""" +
        s""""foldedRows":${m.foldedRows},"committedPartitions":$parts,""" +
        s""""quarantinePartitions":$quar,"metrics":$metrics}"""
    val tmp = Paths.get(dir, s".manifest.${m.runId}.tmp")
    Files.writeString(tmp, json)
    Files.move(tmp, Paths.get(dir, "manifest.json"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Minimal JSON reader for the manifest shape we write (no external deps). */
  def read(dir: String): Option[Manifest] = {
    val p = Paths.get(dir, "manifest.json")
    if (!Files.exists(p)) return None
    val json = Files.readString(p)
    val runId = """"runId":"((?:[^"\\]|\\.)*)"""".r
      .findFirstMatchIn(json).map(_.group(1)).getOrElse("")
    val watermark = """"watermark":"((?:[^"\\]|\\.)*)"""".r
      .findFirstMatchIn(json).map(_.group(1)).getOrElse("")
    val foldedRows = """"foldedRows":(\d+)""".r
      .findFirstMatchIn(json).map(_.group(1).toLong).getOrElse(0L)
    val partRe = """\{"partition":"((?:[^"\\]|\\.)*)","rows":(\d+)\}""".r
    val parts = partRe.findAllMatchIn(json)
      .map(m => PartitionLineage(unesc(m.group(1)), m.group(2).toLong)).toSeq
    val metricsBlock = """"metrics":\{([^}]*)\}""".r
      .findFirstMatchIn(json).map(_.group(1)).getOrElse("")
    val metricRe = """"((?:[^"\\]|\\.)*)":(-?\d+)""".r
    val metrics = metricRe.findAllMatchIn(metricsBlock)
      .map(m => unesc(m.group(1)) -> m.group(2).toLong).toMap
    // absent in pre-round-3 manifests: flag it (quarantineKnown=false) so
    // the resume run can adopt existing quarantine partitions instead of
    // GC-sweeping history the old manifest never recorded.
    val quarMatch = """"quarantinePartitions":\[([^\]]*)\]""".r
      .findFirstMatchIn(json)
    val quar = """"((?:[^"\\]|\\.)*)"""".r
      .findAllMatchIn(quarMatch.map(_.group(1)).getOrElse(""))
      .map(m => unesc(m.group(1))).toSeq
    Some(Manifest(unesc(runId), parts, metrics, unesc(watermark), foldedRows,
      quar, quarantineKnown = quarMatch.isDefined))
  }

  private def unesc(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '"'  => sb.append('"'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case 'u' if i + 5 < s.length =>
            sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar); i += 6
          case other => sb.append(other); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }
}
