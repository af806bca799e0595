package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Generalized EVM event-ABI decoder.
  *
  * The reference decodes *arbitrary* event signatures data-driven
  * (cherry_pipelines/evm/erc20_transfers.py:131-141,
  * `EvmDecodeEventsConfig(event_signature="Transfer(address indexed from,
  * address indexed to, uint256 amount)", allow_decode_fail=True)`): indexed
  * params are read from topics 1..3 in order, non-indexed params from the
  * 32-byte words of the data blob, and a row that does not match the
  * expected shape decodes to NULLs instead of failing the job (needed
  * because e.g. ERC-721 Transfer shares topic0 with ERC-20 Transfer but
  * carries its third param indexed — 4 topics, empty data).
  *
  * Spark-first design: `parseEvent` turns the signature string into a
  * typed layout once at plan time, and `decodeEvent` emits one pure
  * `Column` expression per parameter — substring/hex/conditionals plus the
  * existing codegen'd u256 expressions. The whole decode is a single
  * projection; nothing is interpreted per row, no UDFs.
  */
object EvmAbi {

  sealed trait AbiType { def canonical: String }
  case object TAddress extends AbiType { val canonical = "address" }
  final case class TUint(bits: Int) extends AbiType { def canonical = s"uint$bits" }
  /** Signed two's-complement intN (Uniswap-V3-style Swap carries int256
    * amounts). */
  final case class TInt(bits: Int) extends AbiType { def canonical = s"int$bits" }
  case object TBool extends AbiType { val canonical = "bool" }
  final case class TBytesFixed(n: Int) extends AbiType { def canonical = s"bytes$n" }
  /** Dynamic types (string/bytes/arrays) are only decodable when indexed —
    * the topic then holds the keccak hash of the value, which we surface
    * as hex. Non-indexed dynamic params are rejected at parse time. */
  final case class TDynamic(canonical: String) extends AbiType

  final case class Param(name: String, typ: AbiType, indexed: Boolean)

  final case class EventSig(event: String, params: Seq[Param]) {
    def indexedParams: Seq[Param] = params.filter(_.indexed)
    def dataParams: Seq[Param] = params.filterNot(_.indexed)
    /** Canonical signature, e.g. "Transfer(address,address,uint256)" —
      * names and `indexed` markers stripped, aliases normalized. */
    def canonical: String =
      s"$event(${params.map(_.typ.canonical).mkString(",")})"
    /** keccak256 of the canonical signature = the log's topic0, lowercase
      * hex. Computed once at plan time (driver side). */
    lazy val topic0Hex: String =
      Keccak.hash256(canonical.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
  }

  private def unsupported(t: String): Nothing =
    throw new IllegalArgumentException(s"unsupported ABI type '$t'")

  private def parseType(s: String, indexed: Boolean): AbiType = s match {
    // tuples and arrays would otherwise fall into the uintN/bytesN width
    // parse below and surface as a bare NumberFormatException
    case t if t.contains("(") || t.contains("[") => unsupported(t)
    case "address" => TAddress
    case "bool"    => TBool
    case "uint"    => TUint(256)
    case t if t.startsWith("uint") =>
      val bits = t.drop(4).toIntOption.getOrElse(unsupported(t))
      require(bits % 8 == 0 && bits > 0 && bits <= 256, s"bad uint width: $t")
      TUint(bits)
    case "bytes" | "string" =>
      require(indexed, s"non-indexed dynamic type '$s' is not decodable " +
        "from a log (the ABI tail encoding is not supported); mark it " +
        "indexed (topic = keccak of the value) or drop it")
      TDynamic(s)
    case t if t.startsWith("bytes") =>
      val n = t.drop(5).toIntOption.getOrElse(unsupported(t))
      require(n >= 1 && n <= 32, s"bad bytesN width: $t")
      TBytesFixed(n)
    case "int" => TInt(256)
    case t if t.startsWith("int") =>
      val bits = t.drop(3).toIntOption.getOrElse(unsupported(t))
      require(bits % 8 == 0 && bits > 0 && bits <= 256, s"bad int width: $t")
      TInt(bits)
    case other => unsupported(other)
  }

  /** Parse a human-readable event signature. Accepts both the full form
    * with names and indexed markers ("Transfer(address indexed from,
    * address indexed to, uint256 amount)") and the canonical form
    * ("Transfer(address,address,uint256)" — params then named p0, p1, …
    * and treated as non-indexed). */
  def parseEvent(sig: String): EventSig = {
    val open = sig.indexOf('(')
    require(open > 0 && sig.endsWith(")"), s"malformed event signature: $sig")
    val name = sig.substring(0, open).trim
    require(name.nonEmpty && name.forall(c => c.isLetterOrDigit || c == '_'),
      s"malformed event name in: $sig")
    val inner = sig.substring(open + 1, sig.length - 1).trim
    val params =
      if (inner.isEmpty) Seq.empty[Param]
      else inner.split(",").toSeq.zipWithIndex.map { case (raw, i) =>
        val toks = raw.trim.split("\\s+").toSeq
        val indexed = toks.contains("indexed")
        val rest = toks.filterNot(_ == "indexed")
        require(rest.nonEmpty, s"empty parameter in: $sig")
        val typ = parseType(rest.head, indexed)
        val pname = if (rest.size > 1) rest.last else s"p$i"
        Param(pname, typ, indexed)
      }
    require(params.count(_.indexed) <= 3,
      s"more than 3 indexed params in: $sig (EVM logs carry topics 1..3)")
    EventSig(name, params)
  }

  /** ABI well-formedness of one 32-byte word for its declared type,
    * folded into the allow_decode_fail guard: the reference decoder
    * validates padding and fails the row rather than silently
    * truncating — a uint8 word with nonzero high bytes is a different
    * event, not a value. uintN / address are right-aligned (leading
    * zeros); bytesN is left-aligned (trailing zeros); bool must be 0 or
    * 1. (Unused on the allowDecodeFail=false trusted-input path.) */
  private def wordOk(word: Column, typ: AbiType): Column = {
    def zeros(n: Int) = lit(Array.fill[Byte](n)(0))
    typ match {
      case TAddress => substring(word, 1, 12) === zeros(12)
      case TUint(bits) if bits < 256 =>
        substring(word, 1, 32 - bits / 8) === zeros(32 - bits / 8)
      case TUint(_) => lit(true)
      case TInt(bits) if bits < 256 =>
        // proper sign extension: leading bytes all 0x00 with a clear sign
        // bit, or all 0xff with a set one (binary compare is unsigned)
        val k = 32 - bits / 8
        val lead = substring(word, 1, k)
        val signByte = substring(word, k + 1, 1)
        (lead === zeros(k) && signByte < lit(Array(0x80.toByte))) ||
          (lead === lit(Array.fill[Byte](k)(0xff.toByte)) &&
            signByte >= lit(Array(0x80.toByte)))
      case TInt(_) => lit(true)
      case TBool =>
        substring(word, 1, 31) === zeros(31) &&
          (substring(word, 32, 1) === lit(Array[Byte](0)) ||
            substring(word, 32, 1) === lit(Array[Byte](1)))
      case TBytesFixed(n) if n < 32 =>
        substring(word, n + 1, 32 - n) === zeros(32 - n)
      case TBytesFixed(_) => lit(true)
      case TDynamic(_) => lit(true) // topic holds a hash — any bytes valid
    }
  }

  /** The decoded Spark column for one 32-byte word. */
  private def decodeWord(word: Column, typ: AbiType): Column = typ match {
    // try_cast, not cast: on the unguarded allowDecodeFail=false path an
    // out-of-range word must yield null, not an ANSI CAST_OVERFLOW abort
    // (the guarded path's padding checks make the cast provably safe)
    case TAddress       => lower(hex(substring(word, 13, 20)))
    case TUint(bits) if bits <= 63 => u256_to_decimal(word).try_cast(LongType)
    case TUint(_)       => u256_to_decimal(word) // Decimal(38,0); null > 38 digits
    case TInt(bits) if bits <= 64 => s256_to_decimal(word).try_cast(LongType)
    case TInt(_)        => s256_to_decimal(word)
    case TBool          => u256_to_decimal(word) =!= lit(BigDecimal(0))
    case TBytesFixed(n) => substring(word, 1, n)
    case TDynamic(_)    => lower(hex(word)) // keccak hash of the value
  }

  private def sparkType(typ: AbiType): DataType = typ match {
    case TAddress        => StringType
    case TUint(b) if b <= 63 => LongType
    case TUint(_)        => DecimalType(38, 0)
    case TInt(b) if b <= 64 => LongType
    case TInt(_)         => DecimalType(38, 0)
    case TBool           => BooleanType
    case TBytesFixed(_)  => BinaryType
    case TDynamic(_)     => StringType
  }

  /** Append one decoded column per event parameter (named after the
    * parameter) to `df`.
    *
    * `allowDecodeFail = true` (the reference default for shared-topic0
    * scans) nulls ALL decoded columns on any shape mismatch: wrong topic0,
    * a missing/short topic the layout needs, an unexpected extra topic
    * (only checked when that topic column exists in `df`), or a data blob
    * whose length is not exactly 32 × (non-indexed param count).
    * `allowDecodeFail = false` is the trusted-input fast path: NO guard
    * runs — neither shape nor padding checks — and the per-word decode
    * never throws, so malformed input yields garbage, not errors. (The
    * reference's allow_decode_fail=False aborts the job instead; a pure
    * Column plan cannot abort, so callers who need strictness keep the
    * default and filter on a decoded column's nullness.)
    */
  def decodeEvent(df: DataFrame, signature: String,
      allowDecodeFail: Boolean = true,
      topicCols: Seq[String] = Seq("topic0", "topic1", "topic2", "topic3"),
      dataCol: String = "data"): DataFrame = {
    val sig = parseEvent(signature)
    val present = df.columns.toSet
    // decoded columns are appended under the params' names — a collision
    // with an input column (a param named 'data' or 'topic1') would yield
    // duplicate names and ambiguous references downstream
    val clash = sig.params.map(_.name).filter(present.contains)
    require(clash.isEmpty, "event param name(s) " +
      clash.mkString("'", "', '", "'") +
      s" collide with input columns; rename the params in: $signature")
    require(present.contains(topicCols.head), s"missing ${topicCols.head}")
    require(sig.dataParams.isEmpty || present.contains(dataCol),
      s"missing $dataCol")
    val nIdx = sig.indexedParams.size
    require(topicCols.size >= nIdx + 1,
      s"need ${nIdx + 1} topic columns for $signature")

    val topicOk = (1 to nIdx).map { i =>
      require(present.contains(topicCols(i)),
        s"missing ${topicCols(i)} needed by $signature")
      val t = col(topicCols(i))
      t.isNotNull && length(t) === 32
    }
    // an extra populated topic means a different (more-indexed) event that
    // shares our topic0 — the ERC-721 case the reference guards against
    val extraTopicNull = ((nIdx + 1) until topicCols.size)
      .filter(i => present.contains(topicCols(i)))
      .map(i => col(topicCols(i)).isNull)
    val dataOk =
      if (sig.dataParams.isEmpty)
        Seq(if (present.contains(dataCol))
              col(dataCol).isNull || length(col(dataCol)) === 0
            else lit(true))
      else Seq(length(col(dataCol)) === lit(32 * sig.dataParams.size))
    val sigOk = lower(hex(col(topicCols.head))) === lit(sig.topic0Hex)

    var idxSeen = 0
    var dataSeen = 0
    val words = sig.params.map { p =>
      if (p.indexed) { idxSeen += 1; col(topicCols(idxSeen)) }
      else { val off = dataSeen * 32; dataSeen += 1
             substring(col(dataCol), off + 1, 32) }
    }
    // shape checks AND per-word padding validity — a type-violating word
    // means a different event sharing our topic0, not a truncatable value
    val paddingOk = sig.params.zip(words).map { case (p, w) => wordOk(w, p.typ) }
    val valid = (Seq(sigOk) ++ topicOk ++ extraTopicNull ++ dataOk ++ paddingOk)
      .reduce(_ && _)

    val decoded = sig.params.zip(words).map { case (p, word) =>
      val c = decodeWord(word, p.typ)
      val guarded =
        if (allowDecodeFail) when(valid, c).otherwise(lit(null).cast(sparkType(p.typ)))
        else c
      guarded.as(p.name)
    }
    df.select(col("*") +: decoded: _*)
  }

  /** topic0 for a signature — handy for scan-time filters (the analog of
    * the reference's `evm_signature_to_topic0`, erc20_transfers.py:94). */
  def signatureTopic0Hex(signature: String): String =
    parseEvent(signature).topic0Hex
}
