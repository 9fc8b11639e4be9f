package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Output contract for every declared query: top-level columns must be
  * atomic (no ArrayType/MapType/StructType). The driver's compare loads
  * each result into pandas and sorts/hashes cell values — an ndarray
  * cell is unhashable and turns the whole row red (exactly how
  * `q_pca_project` failed in round 4). Checked at Verify time (hard
  * exit) and in OutputContractSpec (sbt test) so the class of red
  * cannot recur. */
object OutputContract {

  /** Violating columns as "name: type" strings; empty = compliant. */
  def violations(df: DataFrame): Seq[String] =
    df.schema.fields.toSeq.collect {
      case f if !atomic(f.dataType) => s"${f.name}: ${f.dataType.simpleString}"
    }

  private def atomic(dt: DataType): Boolean = dt match {
    case _: ArrayType | _: MapType | _: StructType => false
    case _                                         => true
  }
}
