package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Sink, Tables}

class SinkSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private def tmpDir(): Path = {
    val p = Files.createTempDirectory("graft-sink-")
    p.toFile.deleteOnExit()
    p
  }

  private def parquetFiles(dir: java.io.File): Seq[java.io.File] =
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isFile && f.getName.endsWith(".parquet")).toSeq

  test("one file per partition value, hive layout, lossless round-trip") {
    val out = tmpDir().toString
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
      .withColumn("event_date",
        date_format(col("ts"), "yyyy-MM-dd"))
      .withColumn("ts", unix_micros(col("ts"))) // avoid ts codec drift
    Sink.writePartitionedSorted(ev, out, "event_date", Seq("user_id", "ts"))
    val dirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("event_date=")).toSeq
    assert(dirs.nonEmpty)
    dirs.foreach { d =>
      assert(parquetFiles(d).size === 1, s"${d.getName} should be 1 file")
    }
    // partition-column type inference reads event_date= back as DATE
    val back = spark.read.parquet(out)
      .withColumn("event_date", date_format(col("event_date"), "yyyy-MM-dd"))
      .select(ev.columns.map(col): _*)
    assert(back.count() === ev.count())
    assert(back.except(ev).isEmpty && ev.except(back).isEmpty)
  }

  test("filesPerPartition caps files per dir; round-trip stays lossless") {
    val out = tmpDir().toString
    val hot = (1 to 2000).map(i => ("2024-01-01", i.toLong, s"v$i")) ++
      (1 to 10).map(i => ("2024-01-02", i.toLong, s"w$i"))
    val df = hot.toDF("day", "k", "v")
    Sink.writePartitionedSorted(df, out, "day", Seq("k"),
      filesPerPartition = 3)
    val byDay = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("day=")).map(d =>
        d.getName -> parquetFiles(d).size).toMap
    // the hard invariant: never more than filesPerPartition files per dir
    // (how many of the 3 hash buckets land in DISTINCT tasks depends on
    // shuffle-partition collisions — at the test's 4 partitions that is
    // not deterministic, so >1 is not asserted)
    assert(byDay.values.forall(n => n >= 1 && n <= 3), byDay.toString)
    val back = spark.read.parquet(out)
      .select("day", "k", "v") // partition col is inferred, reorder only
    assert(back.except(df).isEmpty && df.except(back).isEmpty)
  }

  test("rows inside each file are sorted by the sort columns") {
    val out = tmpDir().toString
    val df = (1 to 500).map(i => ("d", (i * 131 % 97).toLong, i.toLong))
      .toDF("day", "k", "seq")
    Sink.writePartitionedSorted(df, out, "day", Seq("k", "seq"))
    val file = parquetFiles(new java.io.File(out, "day=d")).head
    val rows = spark.read.parquet(file.getPath)
      .select("k", "seq").as[(Long, Long)].collect().toSeq
    assert(rows === rows.sortBy(identity), "file not internally sorted")
  }
}
