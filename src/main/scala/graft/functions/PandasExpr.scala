package graft.functions

/** Translator for the pandas `df.eval` / `df.query` Python expression
  * dialect onto Spark SQL (reference mars/dataframe/base/eval.py:73-111,
  * which walks the Python AST with the same operator table). Supported,
  * with Python's own precedence so parenthesization habits port 1:1:
  *
  *   - `and` / `or` / `not` and the elementwise `&` / `|` / `~` / `^`
  *     (pandas uses them as boolean ops; `^` becomes boolean xor)
  *   - `**` (→ power, right-associative, `-x**2 == -(x**2)`) and `//`
  *     (→ floor division)
  *   - `==` / `!=`, `in` / `not in` over `[...]` or `(...)` literals
  *   - `True` / `False` / `None` → true / false / null
  *   - backtick-quoted column names (pandas spaces-in-names convention);
  *     bare identifiers are backtick-escaped on emission so SQL keywords
  *     can be column names, exactly like pandas resolvers
  *   - function calls pass through by name (`abs`, `log`, `sqrt`, … —
  *     Catalyst resolves them, same as the reference handing numexpr
  *     functions to its engine)
  *
  * NOT supported (the reference's ast walker rejects these too): chained
  * comparisons (`a < b < c`), attribute access (`a.str.len()`), `@local`
  * variables, assignment targets. The output is a Spark SQL expression
  * string handed to `expr(...)` — Catalyst remains the expression engine,
  * so everything stays codegen'd exactly like a hand-written Column.
  */
object PandasExpr {
  private sealed trait Tok
  private final case class Id(s: String) extends Tok
  private final case class BTick(s: String) extends Tok
  private final case class Num(s: String) extends Tok
  private final case class Str(s: String) extends Tok
  private final case class Op(s: String) extends Tok

  private val twoCharOps = Set("**", "//", "==", "!=", "<=", ">=")

  private def tokenize(s: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    while (i < s.length) {
      val c = s(i)
      if (c.isWhitespace) i += 1
      else if (c.isDigit || (c == '.' && i + 1 < s.length && s(i + 1).isDigit)) {
        val j0 = i
        while (i < s.length && (s(i).isDigit || s(i) == '.' ||
          s(i) == 'e' || s(i) == 'E' ||
          ((s(i) == '+' || s(i) == '-') && (s(i - 1) == 'e' || s(i - 1) == 'E'))))
          i += 1
        out += Num(s.substring(j0, i))
      } else if (c.isLetter || c == '_') {
        val j0 = i
        while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_')) i += 1
        out += Id(s.substring(j0, i))
      } else if (c == '`') {
        val j = s.indexOf('`', i + 1)
        require(j > 0, s"unterminated backtick in: $s")
        out += BTick(s.substring(i + 1, j)); i = j + 1
      } else if (c == '\'' || c == '"') {
        val j = s.indexOf(c, i + 1)
        require(j > 0, s"unterminated string literal in: $s")
        out += Str(s.substring(i + 1, j)); i = j + 1
      } else {
        val two = if (i + 1 < s.length) s.substring(i, i + 2) else ""
        if (twoCharOps(two)) { out += Op(two); i += 2 }
        else if ("+-*/%<>&|^~(),[]".indexOf(c.toInt) >= 0) {
          out += Op(c.toString); i += 1
        } else throw new IllegalArgumentException(
          s"pandas-expr: unexpected character '$c' in: $s")
      }
    }
    out.result()
  }

  /** Translate a pandas-dialect expression to a Spark SQL expression. */
  def translate(pyExpr: String): String = new P(tokenize(pyExpr), pyExpr).parse()

  /** Parse a pandas `df.eval` assignment PROGRAM — one `target = expr`
    * per line (pandas multiline-eval form, reference base/eval.py's
    * ast.Assign branch) — into (target, translated SQL) pairs in order.
    * Targets may be bare or backticked names; `==` never splits (only a
    * single `=` outside backticks/strings/brackets does). */
  def translateAssignments(program: String): Seq[(String, String)] =
    program.split('\n').map(_.trim).filter(_.nonEmpty).toSeq.map { line =>
      val eq = assignSplit(line)
      require(eq > 0,
        s"pandas-eval: expected 'target = expression', got: $line")
      val rawTarget = line.substring(0, eq).trim
      val target =
        if (rawTarget.startsWith("`") && rawTarget.endsWith("`") &&
          rawTarget.length > 1) rawTarget.substring(1, rawTarget.length - 1)
        else rawTarget
      require(target.nonEmpty && (rawTarget.startsWith("`") ||
        target.forall(c => c.isLetterOrDigit || c == '_')),
        s"pandas-eval: invalid assignment target '$rawTarget' in: $line")
      target -> translate(line.substring(eq + 1))
    }

  /** Index of the single top-level assignment '=' in `line`, or -1. */
  private def assignSplit(line: String): Int = {
    var i = 0
    var inTick = false
    var quote: Char = 0
    while (i < line.length) {
      val c = line(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (inTick) { if (c == '`') inTick = false }
      else c match {
        case '`' => inTick = true
        case '\'' | '"' => quote = c
        case '=' =>
          val prev = if (i > 0) line(i - 1) else ' '
          val next = if (i + 1 < line.length) line(i + 1) else ' '
          if (next != '=' && !"<>!=".contains(prev)) return i
          if (next == '=') i += 1 // skip the second char of ==, <=, …
        case _ =>
      }
      i += 1
    }
    -1
  }

  private final class P(ts: Vector[Tok], src: String) {
    private var pos = 0
    private def peek: Option[Tok] = if (pos < ts.length) Some(ts(pos)) else None
    private def next(): Tok = { val t = ts(pos); pos += 1; t }
    private def eatOp(o: String): Boolean = peek match {
      case Some(Op(`o`)) => pos += 1; true
      case _ => false
    }
    private def eatId(w: String): Boolean = peek match {
      case Some(Id(`w`)) => pos += 1; true
      case _ => false
    }

    def parse(): String = {
      val e = orExpr()
      require(pos == ts.length,
        s"pandas-expr: trailing tokens after '$e' in: $src")
      e
    }

    private def orExpr(): String = {
      var l = andExpr()
      while (eatId("or")) l = s"($l OR ${andExpr()})"
      l
    }
    private def andExpr(): String = {
      var l = notExpr()
      while (eatId("and")) l = s"($l AND ${notExpr()})"
      l
    }
    private def notExpr(): String =
      if (eatId("not")) s"(NOT ${notExpr()})" else cmpExpr()

    private def cmpExpr(): String = {
      var l = bitOr()
      // at most ONE comparison per level: a chained `a < b < c` is a
      // Python-specific construct (it means a<b and b<c, which SQL's
      // left-associative parse silently turns into (a<b)<c — a
      // boolean-vs-numeric comparison) — reject it loudly like the
      // reference's AST walker does
      var consumed = false
      def once(): Unit = {
        require(!consumed, "pandas-expr: chained comparisons " +
          s"(a < b < c) are not supported — split with `and`, in: $src")
        consumed = true
      }
      var done = false
      while (!done) peek match {
        case Some(Op(o)) if Set("==", "!=", "<", "<=", ">", ">=")(o) =>
          once(); next()
          l = s"($l ${if (o == "==") "=" else o} ${bitOr()})"
        case Some(Id("in")) =>
          once(); next(); l = s"($l IN ${listLit()})"
        case Some(Id("not")) if pos + 1 < ts.length && ts(pos + 1) == Id("in") =>
          once(); next(); next(); l = s"($l NOT IN ${listLit()})"
        case _ => done = true
      }
      l
    }
    private def listLit(): String = {
      val close = next() match {
        case Op("[") => "]"
        case Op("(") => ")"
        case t => throw new IllegalArgumentException(
          s"pandas-expr: `in` needs a [..] or (..) literal, got $t in: $src")
      }
      val items = scala.collection.mutable.Buffer[String]()
      if (!eatOp(close)) {
        items += orExpr()
        // python allows a trailing comma — ('x',) is the 1-tuple spelling
        while (eatOp(",") && peek != Some(Op(close))) items += orExpr()
        require(eatOp(close), s"pandas-expr: expected '$close' in: $src")
      }
      items.mkString("(", ", ", ")")
    }
    private def bitOr(): String = {
      var l = bitXor()
      while (eatOp("|")) l = s"($l OR ${bitXor()})"
      l
    }
    private def bitXor(): String = {
      var l = bitAnd()
      while (eatOp("^")) l = s"($l != ${bitAnd()})" // boolean xor
      l
    }
    private def bitAnd(): String = {
      var l = addExpr()
      while (eatOp("&")) l = s"($l AND ${addExpr()})"
      l
    }
    private def addExpr(): String = {
      var l = mulExpr()
      var done = false
      while (!done) peek match {
        case Some(Op("+")) => next(); l = s"($l + ${mulExpr()})"
        case Some(Op("-")) => next(); l = s"($l - ${mulExpr()})"
        case _ => done = true
      }
      l
    }
    private def mulExpr(): String = {
      var l = unary()
      var done = false
      while (!done) peek match {
        case Some(Op("*")) => next(); l = s"($l * ${unary()})"
        case Some(Op("/")) => next(); l = s"($l / ${unary()})"
        case Some(Op("//")) => next(); l = s"floor($l / ${unary()})"
        // Python % follows the DIVISOR's sign (numpy/pandas semantics);
        // SQL % follows the dividend — pmod reproduces Python for both
        // divisor signs (pmod(-7,2)=1, pmod(7,-2)=-1)
        case Some(Op("%")) => next(); l = s"pmod($l, ${unary()})"
        case _ => done = true
      }
      l
    }
    private def unary(): String = peek match {
      case Some(Op("-")) => next(); s"(- ${unary()})"
      case Some(Op("+")) => next(); unary()
      case Some(Op("~")) => next(); s"(NOT ${unary()})"
      case _ => powExpr()
    }
    private def powExpr(): String = {
      val base = atom()
      // right-assoc; rhs through unary() so `2 ** -1` parses
      if (eatOp("**")) s"power($base, ${unary()})" else base
    }
    private def atom(): String = next() match {
      case Num(n) => n
      case Str(v) => "'" + v.replace("'", "''") + "'"
      case BTick(n) => "`" + n + "`"
      case Id("True") => "true"
      case Id("False") => "false"
      case Id("None") => "null"
      case Id(name) =>
        if (eatOp("(")) {
          val args = scala.collection.mutable.Buffer[String]()
          if (!eatOp(")")) {
            args += orExpr()
            while (eatOp(",")) args += orExpr()
            require(eatOp(")"), s"pandas-expr: expected ')' in: $src")
          }
          name + args.mkString("(", ", ", ")")
        } else "`" + name + "`"
      case Op("(") =>
        // no extra wrapping: every operator emission parenthesizes itself
        val e = orExpr()
        require(eatOp(")"), s"pandas-expr: expected ')' in: $src")
        e
      case t => throw new IllegalArgumentException(
        s"pandas-expr: unexpected token $t in: $src")
    }
  }
}
