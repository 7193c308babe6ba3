package graft

import graft.lineage.Lineage
import graft.model.Table
import graft.ops.Transform

class LineageSpec extends SparkSpec {
  import spark.implicits._

  test("CTAS through transform emits input table + output table lineage") {
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.mode("overwrite").saveAsTable("graft_lin_src")
    val sink = s"${tmpDir()}/lineage.ndjson"
    val l    = Lineage.attach(spark, Some(sink))
    try {
      Transform.toTable(spark, "SELECT id, v FROM graft_lin_src WHERE id > 0", Table("graft_lin_out"))
      // listener events are delivered asynchronously; wait for the write event
      // URI forms: catalog tables resolve 3-part (spark_catalog.default.t);
      // a saveAsTable write surfaces as its resolved warehouse location.
      var tries = 0
      def hit = l.collected.exists(e =>
        e.outputs.exists(_.contains("graft_lin_out")) &&
          e.inputs.exists(_.endsWith("graft_lin_src")))
      while (!hit && tries < 50) { Thread.sleep(100); tries += 1 }
      assert(hit, l.collected.map(_.toJson).mkString("\n"))
      val lines = scala.io.Source.fromFile(sink).getLines().toSeq
      assert(lines.nonEmpty && lines.forall(_.startsWith("{")))
    } finally Lineage.detach(spark, l)
  }
}
