package graft.util

/** Global option registry with per-key validators (SURVEY §2.5 U1;
  * pipit/util/config.py:86-135 get_option/set_option/reset_option). */
object GraftConfig {
  private case class Opt(default: Any, validator: Any => Boolean)

  private val registry: Map[String, Opt] = Map(
    "log_level" -> Opt("INFO",
      v => Seq("DEBUG", "INFO", "WARN", "ERROR").contains(v)),
    "notebook_url" -> Opt("http://localhost:8888",
      v => v.isInstanceOf[String] && v.asInstanceOf[String].startsWith("http")),
    // "buffered": one in-memory pass per location (fast path; memory =
    // O(events of the largest location)). "bounded": O(stack-depth) state
    // with pair-record emission + join-back — survives pathological
    // single-location traces at the cost of two extra shuffles.
    "matcher_mode" -> Opt("buffered", v => Seq("buffered", "bounded").contains(v))
  )

  private val current = scala.collection.concurrent.TrieMap[String, Any]()

  def getOption(key: String): Any = {
    val opt = registry.getOrElse(key, throw new IllegalArgumentException(s"unknown option: $key"))
    current.getOrElse(key, opt.default)
  }

  def setOption(key: String, value: Any): Unit = {
    val opt = registry.getOrElse(key, throw new IllegalArgumentException(s"unknown option: $key"))
    if (!opt.validator(value))
      throw new IllegalArgumentException(s"invalid value for $key: $value")
    current(key) = value
  }

  def resetOption(key: String): Unit = {
    if (!registry.contains(key)) throw new IllegalArgumentException(s"unknown option: $key")
    current.remove(key)
  }

  def resetAll(): Unit = current.clear()
}
