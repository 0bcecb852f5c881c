package graft

import org.apache.spark.sql.functions._
import graft.operators.ZOrder

/** Gates for the z-order layout: the Morton math itself, result
  * invariance (layout moves rows, never changes them), and the actual
  * data-skipping claim — a secondary-column box predicate touches a
  * fraction of the z-ordered files but nearly all linearly-sorted ones. */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits (known values) and is monotonic per quadrant") {
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (65535L, 0L), (0L, 65535L))
      .toDF("a", "b")
      .select(ZOrder.zValue(col("a"), col("b")).as("z"))
      .collect().map(_.getLong(0))
    // a -> even bits, b -> odd bits
    assert(got.toSeq == Seq(0L, 1L, 2L, 3L, 0x55555555L, 0xAAAAAAAAL))
  }

  test("empty input passes through unchanged") {
    val empty = Tables.lineitem(spark, sf001).limit(0)
      .select(col("l_orderkey"), col("l_partkey"))
    assert(ZOrder.layoutByZOrder(empty, "l_orderkey", "l_partkey", 4).count() == 0L)
  }

  test("gridCell is monotonic and clamps to [0, 65535]") {
    val cells = Seq(-5.0, 0.0, 50.0, 100.0, 140.0).toDF("v")
      .select(ZOrder.gridCell(col("v"), 0.0, 100.0).as("c"))
      .collect().map(_.getLong(0))
    assert(cells.toSeq == cells.toSeq.sorted)
    assert(cells.head == 0L && cells.last == 65535L)
    assert(cells(2) == 32767L || cells(2) == 32768L)
  }

  test("z-ordered layout skips most files on a secondary-column box query; rows unchanged") {
    val li = Tables.lineitem(spark, sf001)
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
    val nFiles = 16
    val zDir = java.nio.file.Files.createTempDirectory("zorder_z").toString
    val linDir = java.nio.file.Files.createTempDirectory("zorder_lin").toString
    ZOrder.layoutByZOrder(li, "l_orderkey", "l_partkey", nFiles)
      .write.mode("overwrite").parquet(zDir)
    li.repartitionByRange(nFiles, col("l_orderkey"))
      .sortWithinPartitions(col("l_orderkey"))
      .write.mode("overwrite").parquet(linDir)

    // layout invariance: the same row set either way (xor: order-free,
    // can't overflow; lineitem rows are unique on (orderkey, linenumber)
    // but not on these 3 cols — count guards multiplicity)
    def sig(dir: String): (Long, Long) = {
      val r = spark.read.parquet(dir)
        .agg(count(lit(1)),
          bit_xor(xxhash64(col("l_orderkey"), col("l_partkey"), col("l_quantity"))))
        .head()
      (r.getLong(0), r.getLong(1))
    }
    val r0 = li
      .agg(count(lit(1)),
        bit_xor(xxhash64(col("l_orderkey"), col("l_partkey"), col("l_quantity"))))
      .head()
    val liSig = (r0.getLong(0), r0.getLong(1))
    assert(sig(zDir) == liSig && sig(linDir) == liSig)

    // the skipping claim: a narrow box on the SECONDARY column lands in
    // few z-ordered files (2-d locality) but almost every linear file
    // (sorted by the other column only). Files-with-matches is the
    // engine-visible proxy for min/max stats pruning.
    def filesTouched(dir: String): Long = spark.read.parquet(dir)
      .filter(col("l_partkey").between(100, 160))
      .select(input_file_name()).distinct().count()
    val (zFiles, linFiles) = (filesTouched(zDir), filesTouched(linDir))
    assert(linFiles >= nFiles - 2,
      s"expected the linear layout to spread matches nearly everywhere, got $linFiles/$nFiles")
    assert(zFiles * 2 <= linFiles,
      s"z-order should halve files touched at worst: z=$zFiles linear=$linFiles")
  }
}
