package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object ops {
  /** Driver contract shape: (session, sf-dir) => unexecuted DataFrame. */
  type Q = (SparkSession, String) => DataFrame
}
