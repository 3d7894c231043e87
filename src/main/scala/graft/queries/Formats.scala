package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Format/serde surface (declared D8 — flink-json, study/pom.xml:169-174):
  * structured JSON parse (`from_json`), typed field extraction, and
  * re-serialization (`to_json`) — round-tripping inside one codegen stage. */
object Formats {
  def jsonRoundtrip(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(
        col("event_id"),
        expr("from_json(props, 'k INT').k").as("k"),
        to_json(struct(col("user_id"), col("event_type"))).as("packed"))
      .orderBy("event_id")
}
