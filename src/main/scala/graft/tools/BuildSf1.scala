package graft.tools

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Round-10 sf1 builder: assembles a synthetic ~sf1 directory (10x the
  * sf0.1 base — ~6M lineitem rows, ~5M events, 50k docs) from the
  * established density-preserving amplifiers, laid out exactly like
  * the driver's sf dirs (one plain parquet FILE per table) so
  * `graft.Verify` + `tools/check.py` run against it unchanged. The
  * full-suite oracle pass at this scale is the 100x invariance check
  * the round-9 verdict asked for (InvarianceSpec covers 10x).
  *
  * Amplifier provenance (all isomorphism/density-preserving, see each
  * tool's scaladoc): customer/orders/lineitem — ProfileR7RelScale key
  * offsets (dimensions pass through, facts accumulate); events —
  * ProfileR7Scale user/event offsets (every per-user series replicates
  * exactly); documents/embeddings — ProfileR6Scale token-suffix marks
  * and sign-flips (per-copy shingle isomorphism / exact within-copy
  * cosines).
  *
  * Usage: tools/run_ladder.sh graft.tools.BuildSf1 [outDir] (default
  * /tmp/graft_sf1; skips tables whose file already exists).
  */
object BuildSf1 {
  def main(args: Array[String]): Unit = {
    val out   = args.headOption.getOrElse("/tmp/graft_sf1")
    val m     = sys.env.getOrElse("SPARK_GRAFT_SF1_M", "10").toInt
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = Tables(spark, "/root/testdata/sf0.1")
    new java.io.File(out).mkdirs()

    def writeOne(name: String, df: => DataFrame): Unit = {
      val target = new java.io.File(s"$out/$name.parquet")
      if (target.exists()) { println(s"[sf1] $name exists, skipping"); return }
      val tmp = s"$out/__tmp_$name"
      df.coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles().find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath, target.toPath)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
      // this process just rewrote a base-table directory — drop any
      // memoized schema for it (ADVICE r17: the memo never expires)
      Tables.invalidateSchema(target.toString)
      println(s"[sf1] $name rows=${spark.read.parquet(target.toString).count()}")
    }

    writeOne("region", base.region)
    writeOne("nation", base.nation)
    writeOne("part", base.part)
    writeOne("supplier", base.supplier)
    writeOne("customer", ProfileR7RelScale.scaledCustomer(base.customer, m))
    writeOne("orders", ProfileR7RelScale.scaledOrders(base.orders, m))
    writeOne("lineitem", ProfileR7RelScale.scaledLineitem(base.lineitem, m))
    writeOne("events", ProfileR7Scale.scaledEvents(base.events, m))
    writeOne("documents", ProfileR6Scale.scaledDocs(base.documents, m))
    writeOne("embeddings", ProfileR6Scale.scaledEmbeddings(base.embeddings, m))
    spark.stop()
  }
}
