package graft.tools

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession
import graft.operators.Layout

/** Local measurement aid: row-group skipping power of the z-ordered
  * lineitem layout vs a single-key sort, for the 2-D band predicate
  * `layout_zorder` runs. Reads every parquet footer in each layout and
  * counts row groups whose (min, max) statistics OVERLAP the band on
  * both key columns — the groups a stats-pruning scan must read; all
  * others are skipped without touching data pages. */
object MeasureZOrder {

  private def overlapping(dirPath: String,
                          pLo: Long, pHi: Long,
                          sLo: Long, sHi: Long): (Int, Int, Long, Long) = {
    val conf = new Configuration()
    val dir = new java.io.File(dirPath)
    val files = Option(dir.listFiles).getOrElse(Array.empty)
      .filter(f => f.getName.endsWith(".parquet") && f.isFile)
    var total = 0; var read = 0; var totalRows = 0L; var readRows = 0L
    files.foreach { f =>
      val in = HadoopInputFile.fromPath(new Path(f.getAbsolutePath), conf)
      val r = ParquetFileReader.open(in)
      try {
        val schema = r.getFooter.getFileMetaData.getSchema
        val pIdx = schema.getFieldIndex("l_partkey")
        val sIdx = schema.getFieldIndex("l_suppkey")
        r.getFooter.getBlocks.forEach { b =>
          total += 1; totalRows += b.getRowCount
          def bounds(i: Int): (Long, Long) = {
            val st = b.getColumns.get(i).getStatistics
            (st.genericGetMin.asInstanceOf[java.lang.Long].longValue(),
             st.genericGetMax.asInstanceOf[java.lang.Long].longValue())
          }
          val (pMin, pMax) = bounds(pIdx)
          val (sMin, sMax) = bounds(sIdx)
          val hit = pMax >= pLo && pMin <= pHi && sMax >= sLo && sMin <= sHi
          if (hit) { read += 1; readRows += b.getRowCount }
        }
      } finally r.close()
    }
    (total, read, totalRows, readRows)
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val tmp = java.nio.file.Files.createTempDirectory("graft-zmeasure").toString
    Layout.writeZOrdered(s, dir, s"$tmp/z")
    Layout.writeHilbert(s, dir, s"$tmp/h")
    Layout.writeSingleSorted(s, dir, s"$tmp/single")
    val (pLo, pHi, sLo, sHi) = Layout.bandBounds(s, dir)
    println(s"[zorder] band l_partkey in [$pLo,$pHi], l_suppkey in [$sLo,$sHi]")
    // the 2-D band plus each 1-D band alone: z-order's contract is good
    // pruning on EVERY keyed dimension, vs a single-key sort's perfect
    // pruning on its own key and none on any other
    val preds = Seq(
      ("band-2d",      pLo, pHi, sLo, sHi),
      ("partkey-only", pLo, pHi, Long.MinValue, Long.MaxValue),
      ("suppkey-only", Long.MinValue, Long.MaxValue, sLo, sHi))
    for ((name, path) <- Seq("zorder" -> s"$tmp/z", "hilbert" -> s"$tmp/h",
           "single-sort" -> s"$tmp/single");
         (pname, a, b, c, d) <- preds) {
      val (total, read, totalRows, readRows) = overlapping(path, a, b, c, d)
      println(f"[zorder] layout=$name%-11s pred=$pname%-12s rowgroups=$read/$total " +
        f"rows=$readRows/$totalRows (${100.0 * readRows / totalRows}%.1f%% of rows read)")
    }
    def del(f: java.io.File): Unit = {
      Option(f.listFiles).foreach(_.foreach(del)); f.delete(): Unit
    }
    del(new java.io.File(tmp))
  }
}
