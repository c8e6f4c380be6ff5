package graft.connector

import org.apache.spark.sql.SparkSessionExtensions

/** Session extensions (`spark.sql.extensions=graft.connector.GraftSparkExtensions`):
  * SQL views over ViewCatalog catalogs — DDL rewritten at parse time,
  * reads expanded by a resolution rule (see GraftViewRules for why OSS
  * Spark needs both). */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectParser { case (session, delegate) =>
      new GraftViewParser(() => session, delegate)
    }
    extensions.injectResolutionRule(ResolveGraftViews)
  }
}
