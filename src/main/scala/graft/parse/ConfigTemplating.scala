package graft.parse

/** Environment-variable templating for config files, as the reference
  * applies to every node-config load before deserialization
  * (quickwit-config/src/templating.rs:37-93, invoked from
  * node_config/serialize.rs:134): `${VAR}` substitutes the environment
  * value, `${VAR:-default}` falls back to a default when the variable is
  * unset, whitespace inside the braces is ignored, and a line whose first
  * non-blank character is `#` is left verbatim (commented-out examples in
  * shipped config files must not fail the render). An unset variable with
  * no default is an error with the reference's message.
  *
  * One documented divergence: the reference collects captures into a
  * global var→value map and renders the whole file against it, so a
  * commented occurrence of `${VAR}` processed after a live one clobbers
  * the live substitution with the literal text (last capture wins across
  * lines). We substitute per occurrence instead — commented lines stay
  * literal without perturbing live lines, which is the documented INTENT
  * of the comment rule (templating.rs:52-62).
  */
object ConfigTemplating {

  // templating.rs:32-35 — name chars, optional `:-` single-token default,
  // whitespace tolerated around both
  private val Capture =
    """\$\{\s*([A-Za-z0-9_]+)\s*(?::-\s*(\S+)\s*)?\}""".r

  /** Render `content`, resolving `${VAR}` captures through `env` (defaults
    * to the process environment; injectable so specs never mutate it). */
  def render(content: String, env: String => Option[String] = sys.env.get): String = {
    // split preserving line structure; config files are line-oriented and
    // the comment rule is per-line
    val lines = content.split("\n", -1)
    lines.map { line =>
      if (line.dropWhile(_.isWhitespace).startsWith("#")) line
      else
        Capture.replaceAllIn(line, m => {
          val name = m.group(1)
          val value = env(name).orElse(Option(m.group(2))).getOrElse {
            throw new IllegalArgumentException(
              "failed to render config file template: environment variable " +
                s"`$name` is not set and no default value is provided")
          }
          // substitution values are literal text, never backreferences
          scala.util.matching.Regex.quoteReplacement(value)
        })
    }.mkString("\n")
  }

  /** Render-then-validate: the index-config twin of the reference's
    * node-config load (serialize.rs:134 renders BEFORE deserializing). */
  def loadIndexConfig(content: String,
                      env: String => Option[String] = sys.env.get)
      : graft.publish.IndexService.IndexConfig =
    graft.publish.IndexService.validateAndBuild(render(content, env))
}
