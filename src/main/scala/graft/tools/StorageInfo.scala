package graft.tools

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Zone statistics for operators: parquet file count, byte sizes, record
  * counts per zone/bucket
  * (reference: src/main/scala/com/scality/clueso/tools/MetadataStorageInfoTool.scala
  * + SparkUtils.scala:117-146).
  */
object StorageInfo {

  case class ZoneStats(path: String, parquetFiles: Long, totalBytes: Long,
                       avgFileBytes: Long, records: Long)

  def zoneStats(spark: SparkSession, dir: String): ZoneStats = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    var files = 0L
    var bytes = 0L
    if (fs.exists(p)) {
      val it = fs.listFiles(p, true)
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) {
          files += 1
          bytes += f.getLen
        }
      }
    }
    val records =
      if (files == 0) 0L
      else spark.read.parquet(dir).count()
    ZoneStats(dir, files, bytes, if (files == 0) 0 else bytes / files, records)
  }
}
