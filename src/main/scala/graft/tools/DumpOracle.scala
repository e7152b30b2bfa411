package graft.tools

import java.nio.file.{Files, Paths}

import graft.SparkEntry

/** Dump SparkEntry.oracleSql as oracle_sql.json without running any gate —
  * pairs with RunGate for targeted driver-compare debugging:
  * `runMain graft.tools.DumpOracle <outDir>`.
  */
object DumpOracle {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/gate_out")
    new java.io.File(outDir).mkdirs()
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    println(s"wrote $outDir/oracle_sql.json (${SparkEntry.oracleSql.size} oracles)")
  }
}
