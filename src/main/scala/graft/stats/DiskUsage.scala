package graft.stats

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Disk-usage calculators (reference config.go:193-208 + vendored
  * cloudeng.io/file/diskusage): `storage_bytes = calculate(size, blocks)`.
  *
  * Each strategy returns a pure Column expression — integer arithmetic
  * only, so it stays inside whole-stage codegen (no UDF).
  */
trait Calculator {
  def apply(size: Column, blocks: Column): Column
  def name: String
}

object Calculator {

  /** storage = size (the default). */
  case object Identity extends Calculator {
    def apply(size: Column, blocks: Column): Column = size
    val name = "identity"
  }

  /** Round size up to whole filesystem blocks. */
  final case class Block(blockSize: Long) extends Calculator {
    def apply(size: Column, blocks: Column): Column =
      (ceil(size.cast("double") / blockSize) * blockSize).cast("long")
    val name = s"block:$blockSize"
  }

  /** st_blocks * 512 — what the kernel says is actually allocated. */
  case object RawBlocks extends Calculator {
    def apply(size: Column, blocks: Column): Column = blocks * 512L
    val name = "raw-blocks"
  }

  /** RAID0: data striped over `numStripes` drives with `stripeSize`
    * stripes; last partial stripe occupies a full stripe per drive. */
  final case class Raid0(stripeSize: Long, numStripes: Int) extends Calculator {
    def apply(size: Column, blocks: Column): Column = {
      val stripes = ceil(size.cast("double") / stripeSize).cast("long")
      (stripes * stripeSize * numStripes).cast("long")
    }
    val name = s"raid0:$stripeSize:$numStripes"
  }

  def parse(spec: String): Calculator = spec.split(":").toList match {
    case "identity" :: Nil => Identity
    case "raw-blocks" :: Nil => RawBlocks
    case "block" :: bs :: Nil => Block(bs.toLong)
    case "raid0" :: ss :: n :: Nil => Raid0(ss.toLong, n.toInt)
    case _ => throw new IllegalArgumentException(s"unknown calculator '$spec'")
  }
}
