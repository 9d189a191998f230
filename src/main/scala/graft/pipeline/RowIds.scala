package graft.pipeline

import org.apache.spark.sql.Dataset

import graft.model.PageRow

/** Stable per-input-row identity for exploded-then-reassembled paths
  * (ChunkedExtract, PdfPagedExtract): partition id in the high bits,
  * in-partition index in the low 36 bits — deterministic given the input
  * partitioning, and two rows sharing a url (real crawl data has them) stay
  * distinct documents. One definition so the two reassembly paths can never
  * diverge on the uid scheme. */
object RowIds {
  def keyed(pages: Dataset[PageRow]): Dataset[(Long, PageRow)] = {
    import pages.sparkSession.implicits._
    pages.mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId().toLong
      it.zipWithIndex.map { case (p, i) => (pid << 36 | i.toLong, p) }
    }
  }
}
