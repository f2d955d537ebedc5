package graft.functions

/** Layered configuration merge — the reference's recursive override
  * resolution (flag → config file → defaults; /root/reference/crates/
  * core/src/config/mod.rs:326-358: primary value wins, fallback fills
  * nulls/missing, maps merge recursively). Re-expressed over string maps
  * with dotted keys (the Spark-conf shape) plus typed accessors —
  * SURVEY.md §2.3 J4.
  */
object LayeredConfig {

  final case class Conf(entries: Map[String, String]) {
    def get(key: String): Option[String] = entries.get(key)
    def getInt(key: String, default: Int): Int =
      entries.get(key).map(_.toInt).getOrElse(default)
    def getBool(key: String, default: Boolean): Boolean =
      entries.get(key).map(_.toBoolean).getOrElse(default)
  }

  /** Left-biased recursive merge: earlier layers win, later layers fill
    * gaps (primary=overrides, then file, then defaults).
    */
  def resolve(layers: Map[String, String]*): Conf =
    Conf(layers.foldLeft(Map.empty[String, String]) { (acc, layer) =>
      layer ++ acc // acc (earlier layers) wins on conflicts
    })

  /** Resolution with provenance: key → (value, winning layer name) —
    * the audit surface (which of flag/file/default supplied each value,
    * mirroring the reference's precedence chain
    * /root/reference/crates/config/src/config.rs:16-114).
    */
  def resolveWithProvenance(
      layers: (String, Map[String, String])*): Map[String, (String, String)] =
    layers.foldLeft(Map.empty[String, (String, String)]) {
      case (acc, (name, layer)) =>
        layer.map { case (k, v) => k -> (v, name) } ++ acc
    }

  /** Env-var layer: keys with `prefix` become dotted config keys
    * (SPARK_GRAFT_FOO_BAR → foo.bar).
    */
  def fromEnv(env: Map[String, String], prefix: String = "SPARK_GRAFT_"): Map[String, String] =
    env.collect { case (k, v) if k.startsWith(prefix) =>
      k.stripPrefix(prefix).toLowerCase.replace('_', '.') -> v
    }
}
